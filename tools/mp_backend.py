"""Two-process distributed global BA on a REAL tracked session (the DCN
analogue of BASELINE north star 3 — multi-HOST backend).

Each process (rank passed on argv) joins a gloo jax.distributed session with
2 virtual CPU devices, tracks the same synthetic sequence with the fused
engine locally (deterministic f32 — both processes hold identical state),
then runs the global backend twice from the same snapshot:

  * single-device: `DroidBackend(params, video, cfg)` — the oracle
  * distributed:   `DroidBackend(..., mesh)` over the 4-device 2-PROCESS
    mesh — per-edge linearisation and the Schur reduction shard across
    processes; the per-iteration psum of the pose system crosses the
    process boundary over gloo (ICI/DCN on real hardware)

and asserts pose/disparity parity plus scale-corrected ATE parity vs GT.
Launched by tools/mp_backend.sh; the collectives-level 1e-4 parity is pinned
separately in tests/test_parallel.py (MP_SHARDED_BA / MP_BACKEND).
"""

import os
import sys

rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=rank)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from droid_slam_tpu.data.synthetic import render_sequence
from droid_slam_tpu.eval.ate import Trajectory, ate_rmse
from droid_slam_tpu.runtime import Droid
from droid_slam_tpu.runtime.backend import DroidBackend
from droid_slam_tpu.runtime.config import DroidConfig
from droid_slam_tpu.train.trainer import rendezvous


def log(*a):
    print(f"[rank {rank}]", *a, flush=True)


FRAMES = 24
H, W = 96, 128
config = DroidConfig(image_size=(H, W), buffer=64, warmup=8,
                     compute_dtype="float32")
seq = render_sequence(np.random.default_rng(7), n_frames=FRAMES,
                      image_size=(H, W), t_sigma=0.25, r_sigma=0.02)

droid = Droid(config, weights="weights/droid_synth.msgpack")
for k in range(FRAMES):
    droid.track(k, jnp.asarray(seq["images"][k]),
                intrinsics=jnp.asarray(seq["intrinsics"][k]))
droid.sync()
droid._sync_fused_state()
v = droid.video
t = v.counter
log(f"tracked {FRAMES} frames -> {t} keyframes")

snapshot = {k: jnp.copy(getattr(v, k)) for k in
            ("poses", "disps", "disps_sens", "intrinsics",
             "fmaps", "nets", "inps")}
dirty0 = v.dirty.copy()


def restore():
    for k, val in snapshot.items():
        setattr(v, k, jnp.copy(val))
    v.dirty = dirty0.copy()


def gauge_ate():
    """Scale-corrected ATE of the keyframe trajectory vs GT."""
    from droid_slam_tpu.ops import lie

    est = np.asarray(lie.inv(v.poses[:t]))  # w2c -> c2w
    ts = np.asarray(v.tstamp[:t]).astype(np.float64)
    ref = Trajectory(np.arange(FRAMES, dtype=np.float64),
                     seq["poses"][:, :3].astype(np.float64),
                     seq["poses"][:, 3:].astype(np.float64))
    est_t = Trajectory(ts, est[:, :3].astype(np.float64),
                       est[:, 3:].astype(np.float64))
    return float(ate_rmse(ref, est_t, correct_scale=True, max_dt=0.25)["ate_rmse"])


params = droid.backend.params

# ---- single-device oracle (no collectives; identical on both ranks) ----
restore()
DroidBackend(params, v, config)(steps=8)
poses_single = np.asarray(v.poses[:t])
disps_single = np.asarray(v.disps[:t])
ate_single = gauge_ate()
log(f"single-device backend: ATE {ate_single:.4f}")

# ---- distributed backend over the 2-process mesh ----
rendezvous("backend_mesh_enter")
restore()
mesh = Mesh(np.array(jax.devices()), ("ba",))
DroidBackend(params, v, config, mesh=mesh)(steps=8)
poses_mesh = np.asarray(v.poses[:t])
disps_mesh = np.asarray(v.disps[:t])
ate_mesh = gauge_ate()
log(f"2-process distributed backend: ATE {ate_mesh:.4f}")

perr = float(np.abs(poses_mesh - poses_single).max())
derr = float(np.abs(disps_mesh - disps_single).max())
log(f"pose parity {perr:.2e}, disp parity {derr:.2e}, "
    f"ATE delta {abs(ate_mesh - ate_single):.2e}")
# 5e-3: the sharded GN reorders f32 reductions vs the dense solver and the
# update op compounds the drift over 8 steps x 2 iterations (the raw
# one-iteration psum parity is pinned at 1e-4 in tests/test_parallel.py)
assert perr < 5e-3, perr
assert derr < 5e-3, derr
assert abs(ate_mesh - ate_single) < 1e-3, (ate_mesh, ate_single)
log("MP_BACKEND_RUN_OK")

sys.stdout.flush()
sys.stderr.flush()
os._exit(0)  # skip jax.distributed.shutdown's exit barrier (see tests)
