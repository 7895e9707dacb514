"""End-to-end accuracy with trained weights on the synthetic protocol.

The repo ships weights trained in-environment on procedural scenes
(apps/train.py --synthetic); this test runs the FULL SLAM pipeline —
motion filter, frontend, global backend, trajectory filler — on a held-out
rendered sequence with exact ground truth and requires:

  * keyframing operates in the intended regime (a real fraction of frames
    selected, not 0 or all),
  * scale-corrected ATE beats the untrained floor by a wide margin
    (measured in round 2: random weights 1.13 ATE with tracking never
    engaging; trained weights ~0.15-0.19 with 16/48 keyframes).

This is the in-environment stand-in for the reference's evo-scored
evaluation scripts (/root/reference/evaluation_scripts/test_*.py).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "weights",
    "droid_synth.msgpack",
)


# Per-seed ATE gates for the SHIPPED weights (synth5_004500, round 4: the
# varied close-up curriculum that closed the seed-11 generalization gap).
# Measured on the TPU (tools/eval_sweep.py, 2026-08-20):
# f32 seed 7 = 0.120, seed 11 = 0.183, seed 23 = 0.193 (bf16:
# 0.120/0.246/0.195; CPU f32 agrees to ~0.08 — r2's CPU/TPU deltas on
# marginal seeds were that order). Bounds leave headroom for platform noise
# but fail on a real regression: a weights or runtime change that tanked ANY
# seed toward the untrained floor (≈1.1, tracking never engages) — or
# reopened the seed-11 gap (0.711 before r4's curriculum) — trips its gate.
SEED_GATES = [(7, 0.30), (11, 0.45), (23, 0.45)]


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason="trained weights absent")
@pytest.mark.parametrize("seed,bound", SEED_GATES)
def test_trained_weights_track_synthetic_sequence(seed, bound):
    from droid_slam_tpu.data.synthetic import render_sequence
    from droid_slam_tpu.eval.ate import Trajectory, ate_rmse
    from droid_slam_tpu.runtime import Droid
    from droid_slam_tpu.runtime.config import DroidConfig

    frames, H, W = 48, 192, 256
    seq = render_sequence(
        np.random.default_rng(seed), n_frames=frames, image_size=(H, W),
        t_sigma=0.25, r_sigma=0.02,
    )
    droid = Droid(
        DroidConfig(image_size=(H, W), buffer=max(96, frames), warmup=8),
        weights=WEIGHTS,
    )
    for k in range(frames):
        droid.track(
            k, jnp.asarray(seq["images"][k]),
            intrinsics=jnp.asarray(seq["intrinsics"][k]),
        )
    droid.sync()
    stream = [(k, seq["images"][k], seq["intrinsics"][k]) for k in range(frames)]
    traj = droid.terminate(iter(stream))

    kf = droid.video.counter
    assert 6 <= kf <= frames - 4, f"keyframing degenerate: {kf}/{frames}"

    ref = Trajectory(
        np.arange(frames, dtype=np.float64),
        seq["poses"][:, :3].astype(np.float64),
        seq["poses"][:, 3:].astype(np.float64),
    )
    est = Trajectory(np.arange(frames, dtype=np.float64), traj[:, :3], traj[:, 3:])
    r = ate_rmse(ref, est, correct_scale=True, max_dt=0.25)
    assert r["ate_rmse"] < bound, (seed, r)


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q", "-m", "slow"])
