"""Reference-scale loop protocol (VERDICT r4 item 2): the courtyard orbit
with revisit (data/synthetic.render_loop_sequence).

Full-scale numbers come from the TPU bench extra (bench.py BENCH_LONGLOOP:
240 frames at 384×512 → 205 keyframes, both global-BA passes + filler); CI
tracks the first QUARTER of the same orbit at 192×256 — identical per-frame
motion, CPU-affordable — and gates keyframing + ATE.

Measured frontier (2026-08-21, shipped weights, TPU bf16): quarter-loop
ATE 0.154 / scale 1.33 / 26 kf of 60 frames. The FULL loop currently
drifts (192×256: ATE 1.71 pre- and post-terminate; 384×512: 2.41): the
frontend accumulates scale drift over ~100+ keyframes of sustained
yaw+lateral motion and proximity edges no longer bridge the revisit —
the long-horizon limitation of 7-frame-clip training (CLAUDE.md). This
test pins the working quarter-scale regime so frontend regressions trip;
improving the full-loop number is the standing model-quality target.
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


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason="trained weights absent")
def test_loop_quarter_segment_tracks():
    from droid_slam_tpu.data.synthetic import render_loop_sequence
    from droid_slam_tpu.eval.ate import Trajectory, ate_rmse
    from droid_slam_tpu.ops import lie
    from droid_slam_tpu.runtime import Droid
    from droid_slam_tpu.runtime.config import DroidConfig

    # render the FULL 240-frame protocol (per-frame motion depends on
    # n_frames), track the first quarter
    seq = render_loop_sequence(np.random.default_rng(7), n_frames=240,
                               image_size=(192, 256))
    K = 60
    config = DroidConfig(image_size=(192, 256), buffer=96, warmup=8,
                         compute_dtype="float32")
    droid = Droid(config, weights=WEIGHTS)
    for k in range(K):
        droid.track(k, jnp.asarray(seq["images"][k]),
                    intrinsics=jnp.asarray(seq["intrinsics"][k]))
    droid.sync()
    droid._sync_fused_state()

    t = droid.video.counter
    # measured 26/60 on TPU; wide band still catches starvation (<10) and
    # every-frame degeneration (>55)
    assert 10 <= t <= 55, f"keyframing degenerate: {t}/60"

    est = np.asarray(lie.inv(droid.video.poses[:t]))
    ts = np.asarray(droid.video.tstamp[:t]).astype(np.float64)
    ref = Trajectory(np.arange(K, dtype=np.float64),
                     seq["poses"][:K, :3].astype(np.float64),
                     seq["poses"][:K, 3:].astype(np.float64))
    r = ate_rmse(
        ref, Trajectory(ts, est[:, :3].astype(np.float64),
                        est[:, 3:].astype(np.float64)),
        correct_scale=True, max_dt=0.25,
    )
    # TPU bf16 measured 0.154 at scale 1.33; x2.5 margin for platform
    # keyframe flips (the seed-11 lesson: CPU/TPU can differ ~2x on
    # marginal sequences). A drifting/diverged frontend sits at 1.7+.
    assert r["ate_rmse"] < 0.45, r
    assert 0.25 < r["scale"] < 12.0, r


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q", "-m", "slow"])
