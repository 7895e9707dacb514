"""Multi-device tests on a virtual 8-device CPU mesh.

The platform must be selected before JAX initialises, so these run a child
process with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=8
(the reference has NO distributed tests at all — SURVEY §4)."""

import os
import subprocess
import sys

import pytest

CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

assert len(jax.devices()) == 8, jax.devices()

from droid_slam_tpu.ops import ba as ba_ops
from droid_slam_tpu.ops import lie
from droid_slam_tpu.ops import projective as pops
from droid_slam_tpu.parallel.sharded_ba import ShardedBAPlan, sharded_ba_iteration

rng = np.random.default_rng(7)
F, ht, wd = 16, 6, 8
n_dev = 8

poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))
tw = 0.02 * rng.standard_normal((F, 6)).astype(np.float32)
poses = np.asarray(lie.retr(jnp.asarray(poses), jnp.asarray(tw)))
disps = (0.5 + rng.random((F, ht, wd))).astype(np.float32)
intr = np.array([8.0, 8.0, wd / 2, ht / 2], np.float32)

eii, ejj = [], []
for a in range(F):
    for b in range(F):
        if a != b and abs(a - b) <= 2:
            eii.append(a); ejj.append(b)
eii = np.asarray(eii, np.int32); ejj = np.asarray(ejj, np.int32)
N = len(eii)

target = np.asarray(pops.projective_transform(
    jnp.asarray(poses), jnp.asarray(disps),
    jnp.asarray(np.broadcast_to(intr, (F, 4))),
    jnp.asarray(eii), jnp.asarray(ejj))[0]
) + 0.05 * rng.standard_normal((N, ht, wd, 2)).astype(np.float32)
weight = (0.4 + 0.6 * rng.random((N, ht, wd, 2))).astype(np.float32)
eta = np.full((F, ht, wd), 0.01, np.float32)
sens = np.zeros_like(disps)

t0, t1 = 1, F
window = t1 - t0

# ---- single-device oracle: one iteration of the block-sparse SLAM BA ----
pairs = ba_ops.SchurPairs.build(eii, ejj, np.ones(N, bool), t0, t1, window)
prob = ba_ops.BAProblem(
    target=jnp.asarray(target), weight=jnp.asarray(weight), eta=jnp.asarray(eta),
    ii=jnp.asarray(eii), jj=jnp.asarray(ejj), edge_valid=jnp.ones(N, bool),
    t0=jnp.asarray(t0, jnp.int32), t1=jnp.asarray(t1, jnp.int32), pairs=pairs,
)
p_ref, d_ref = ba_ops.ba_solve(
    jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr), jnp.asarray(sens),
    prob, window=window, iterations=1, lm=1e-5, ep=1e-2,
)

# ---- 8-way sharded version ----
mesh = Mesh(np.array(jax.devices()), ("ba",))
plan = ShardedBAPlan.build(eii, ejj, np.ones(N, bool), n_dev, F, t0, t1)
p_sh, d_sh = sharded_ba_iteration(
    mesh, plan, target, weight, eta,
    jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
    jnp.asarray(sens), t0, t1, window=window,
)

perr = np.abs(np.asarray(p_sh) - np.asarray(p_ref)).max()
derr = np.abs(np.asarray(d_sh) - np.asarray(d_ref)).max()
print("POSE_ERR", perr)
print("DISP_ERR", derr)
assert perr < 1e-4, perr
assert derr < 1e-4, derr
print("SHARDED_BA_OK")

# ---- data-parallel training step ----
from droid_slam_tpu.models.droid_net import init_params
from droid_slam_tpu.train.trainer import (
    TrainConfig, init_state, make_initial_batch, make_train_step,
    replicate_for_mesh, shard_batch_for_mesh,
)

mesh_dp = Mesh(np.array(jax.devices()), ("dp",))
cfg = TrainConfig(num_iters=1, n_frames=3, steps=10)
params = init_params(jax.random.PRNGKey(0), image_size=(32, 32))
state = init_state(params, cfg)
gi, gj = [], []
for a in range(3):
    for b in range(3):
        if a != b:
            gi.append(a); gj.append(b)
step = make_train_step(cfg, np.asarray(gi), np.asarray(gj))
batch = make_initial_batch(np.random.default_rng(0), 8, 3, (32, 32))
batch = shard_batch_for_mesh(batch, mesh_dp)
state = replicate_for_mesh(state, mesh_dp)
state, metrics, _ = step(state, batch)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
# the UPDATED parameters must be finite too (a NaN learning rate once
# slipped through while the pre-update loss stayed finite)
for path, leaf in jax.tree_util.tree_leaves_with_path(state["params"]):
    assert np.all(np.isfinite(np.asarray(leaf))), jax.tree_util.keystr(path)
print("DP_TRAIN_OK", loss)

# ---- integrated backend: DroidBackend(mesh) vs single-device, full pass ----
from droid_slam_tpu.runtime.backend import DroidBackend
from droid_slam_tpu.runtime.config import DroidConfig
from droid_slam_tpu.runtime.video import VideoState

cfg_b = DroidConfig(
    image_size=(48, 64), buffer=12, window_pad=16, schur_pair_floor=512,
    inactive_pad=16, backend_thresh=1e9, compute_dtype="float32",
)
bparams = init_params(jax.random.PRNGKey(2), image_size=(48, 64))
upd_params = {"params": bparams["params"]["update"]}

rb = np.random.default_rng(11)
Fb = 8
hb, wb = cfg_b.feat_size
poses_b = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (cfg_b.buffer, 1))
poses_b = np.asarray(lie.retr(
    jnp.asarray(poses_b),
    jnp.asarray(np.pad(0.03 * rb.standard_normal((Fb, 6)), ((0, cfg_b.buffer - Fb), (0, 0))).astype(np.float32)),
))
disps_b = np.ones((cfg_b.buffer, hb, wb), np.float32)
disps_b[:Fb] = (0.5 + rb.random((Fb, hb, wb))).astype(np.float32)
fmaps_b = rb.standard_normal((cfg_b.buffer, 1, hb, wb, 128)).astype(np.float32)
nets_b = np.tanh(rb.standard_normal((cfg_b.buffer, hb, wb, 128))).astype(np.float32)
inps_b = rb.standard_normal((cfg_b.buffer, hb, wb, 128)).astype(np.float32)
intr_b = np.broadcast_to(np.array([8.0, 8.0, wb / 2, hb / 2], np.float32), (cfg_b.buffer, 4))

def make_video():
    v = VideoState(cfg_b)
    v.counter = Fb
    v.poses = jnp.asarray(poses_b.copy())
    v.disps = jnp.asarray(disps_b.copy())
    v.intrinsics = jnp.asarray(intr_b.copy())
    v.fmaps = jnp.asarray(fmaps_b.copy())
    v.nets = jnp.asarray(nets_b.copy())
    v.inps = jnp.asarray(inps_b.copy())
    return v

v_single = make_video()
DroidBackend(upd_params, v_single, cfg_b)(steps=2)
v_mesh = make_video()
DroidBackend(upd_params, v_mesh, cfg_b, mesh=Mesh(np.array(jax.devices()), ("ba",)))(steps=2)

bp_err = np.abs(np.asarray(v_single.poses[:Fb]) - np.asarray(v_mesh.poses[:Fb])).max()
bd_err = np.abs(np.asarray(v_single.disps[:Fb]) - np.asarray(v_mesh.disps[:Fb])).max()
print("BACKEND_POSE_ERR", bp_err)
print("BACKEND_DISP_ERR", bd_err)
assert bp_err < 5e-3, bp_err
assert bd_err < 5e-3, bd_err
print("BACKEND_MESH_OK")
"""


@pytest.mark.slow
def test_sharded_ba_and_dp_training():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize registers the TPU backend whenever this is set,
    # overriding JAX_PLATFORMS — the virtual CPU mesh needs it gone
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [sys.executable, "-c", CHILD],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "SHARDED_BA_OK" in result.stdout, result.stdout + result.stderr
    assert "DP_TRAIN_OK" in result.stdout, result.stdout + result.stderr
    assert "BACKEND_MESH_OK" in result.stdout, result.stdout + result.stderr


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])
