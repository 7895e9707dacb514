"""End-to-end trajectory regression against a stored fixture.

The reference ships tests/test_droid_slam.groundtruth.npy — a stored
trajectory guarding the full pipeline against numerical drift (SURVEY §4).
Same pattern here: a deterministic synthetic sequence (seeded weights, seeded
frames) runs through the full fused tracking pipeline + terminate in a CPU
subprocess (platform pinned for cross-run determinism), and the resulting
keyframe poses must match the committed fixture.

Regenerate after INTENTIONAL numerical changes with:
    python tests/test_regression.py --regen
"""

import os
import subprocess
import sys

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "trajectory_regression.npz")

CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_tpu.models.droid_net import init_params
from droid_slam_tpu.runtime import Droid, DroidConfig

rng = np.random.default_rng(5432)
config = DroidConfig(
    image_size=(64, 64),
    buffer=24,
    warmup=4,
    max_factors=16,
    inactive_pad=16,
    window_pad=16,
    schur_pair_floor=512,
    filter_thresh=-1.0,
    keyframe_thresh=0.0,
    frontend_window=8,
    frontend_thresh=1e9,
    backend_thresh=1e9,
    frontend_iters1=2,
    frontend_iters2=1,
    compute_dtype="float32",  # determinism: no MXU bf16 in the fixture
)
droid = Droid(config, params=init_params(jax.random.PRNGKey(7), image_size=(64, 64)))

# smooth moving synthetic frames (low-frequency so flow is coherent)
base = rng.integers(0, 255, (10, 10, 3)).astype(np.float32)
big = np.kron(base, np.ones((8, 8, 1)))[:64, :64]
intr = jnp.asarray([64.0, 64.0, 32.0, 32.0], jnp.float32)
for t in range(10):
    frame = np.roll(big, shift=2 * t, axis=1)
    droid.track(t, jnp.asarray(frame.astype(np.uint8)), intrinsics=intr)
traj = droid.terminate()
np.save(os.environ["TRAJ_OUT"], np.asarray(traj))
print("wrote", os.environ["TRAJ_OUT"])
"""


def _run_pipeline(out_path: str):
    env = dict(os.environ, TRAJ_OUT=out_path)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize's plugin blocks CPU-pinned children in its
    # connect-retry loop when the tunnel is down — scrub it (child is CPU)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "-c", CHILD],
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    return np.load(out_path)


@pytest.mark.slow
def test_trajectory_regression(tmp_path):
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture missing — generate with --regen")
    want = np.load(FIXTURE)["traj"]
    got = _run_pipeline(str(tmp_path / "traj.npy"))
    assert got.shape == want.shape
    # CPU-pinned + f32 compute: only compiler-version drift should move this
    assert np.abs(got - want).max() < 1e-3, np.abs(got - want).max()
    assert np.all(np.isfinite(got))


if __name__ == "__main__":
    if "--regen" in sys.argv:
        out = os.path.join(os.path.dirname(__file__), "_traj_tmp.npy")
        traj = _run_pipeline(out)
        np.savez(FIXTURE, traj=traj)
        os.remove(out)
        print("fixture written:", FIXTURE, traj.shape)
    else:
        pytest.main(["-x", __file__, "-q"])
