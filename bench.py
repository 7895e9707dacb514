"""Headline benchmark: end-to-end tracking throughput (frames/s) at demo scale.

Runs the full per-frame tracking path — motion filter (fnet + corr probe +
GRU), frontend factor-graph updates (corr pyramid + ConvGRU + dense BA) —
on synthetic frames at the reference demo resolution (240×320, 1/8 feature
grid), with every frame forced to become a keyframe (worst case: the real
pipeline runs the frontend only on ~1/3 of frames).

North star (BASELINE.md): >30 fps tracking on one TPU v5e chip.
Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from droid_slam_tpu.runtime import Droid, DroidConfig

    config = DroidConfig(
        image_size=(240, 320),
        buffer=64,
        warmup=8,
        max_factors=48,
        inactive_pad=96,
        window_pad=32,
        filter_thresh=-1.0,  # every frame keyframes (worst case)
        keyframe_thresh=0.0,  # never cull (synthetic distances are arbitrary)
        frontend_window=16,
        frontend_thresh=1e9,
        backend_thresh=1e9,
    )
    droid = Droid(config)

    rng = np.random.default_rng(0)
    H, W = config.image_size
    intr = jnp.asarray([W * 1.2, W * 1.2, W / 2, H / 2], jnp.float32)

    frames = [
        jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8)) for _ in range(28)
    ]

    # warmup: init + a few steady-state updates → everything compiles
    t = 0
    for _ in range(config.warmup + 4):
        droid.track(t, frames[t % len(frames)], intrinsics=intr)
        t += 1
    droid.sync()  # fence on the LIVE fused state (video.poses is a stale copy)

    # timed steady-state tracking
    n_timed = 30  # long steady-state window: run-to-run noise was ±0.6 fps at 12
    start = time.perf_counter()
    for _ in range(n_timed):
        droid.track(t, frames[t % len(frames)], intrinsics=intr)
        t += 1
    droid.sync()
    elapsed = time.perf_counter() - start

    fps = n_timed / elapsed
    print(
        json.dumps(
            {
                "metric": "tracking_fps_keyframe_worst_case",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
