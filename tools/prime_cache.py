"""Prime the persistent XLA compile cache for a deployment configuration.

A fresh machine (empty JAX_COMPILATION_CACHE_DIR) pays minutes of compiles
on its first session: the fused track step on the first frame, and the
terminate programs (backend global BA + trajectory filler) on the first
terminate. Running this once at install time absorbs ALL of it into the
persistent cache; every later session then pays only cache loads
(seconds). `Droid.warm_terminate` covers the in-process case; this tool
covers the cross-process one (VERDICT r4: driver cold terminate 28.5 s on
a cold cache).

  python tools/prime_cache.py [--image_size 240 320] [--buffer 64]
      [--frames 44] [--compute_dtype bfloat16] [--stereo]

Defaults match bench.py's demo-scale session. Run once per (resolution,
buffer-bucket, dtype) you deploy.
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, nargs=2, default=[240, 320])
    ap.add_argument("--buffer", type=int, default=64)
    ap.add_argument("--frames", type=int, default=44,
                    help="dummy frames to track (sets the keyframe-count "
                    "quantization bucket warm_terminate warms)")
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--stereo", action="store_true")
    ap.add_argument("--weights", default=None,
                    help="optional checkpoint (programs are weight-agnostic; "
                    "random init compiles the same executables)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from droid_slam_tpu.runtime import Droid
    from droid_slam_tpu.runtime.config import DroidConfig

    H, W = args.image_size
    config = DroidConfig(image_size=(H, W), buffer=args.buffer,
                         compute_dtype=args.compute_dtype, stereo=args.stereo)
    droid = Droid(config, weights=args.weights)

    rng = np.random.default_rng(0)
    rig = (2,) if args.stereo else ()
    intr = jnp.asarray([1.2 * W, 1.2 * W, W / 2, H / 2], jnp.float32)

    t0 = time.perf_counter()
    n = min(args.frames, args.buffer - 18)  # leave filler headroom
    for t in range(n):
        img = jnp.asarray(rng.integers(0, 255, rig + (H, W, 3), np.uint8))
        droid.track(t, img, intrinsics=intr)
    droid.sync()
    t_track = time.perf_counter() - t0
    print(f"track programs compiled/loaded in {t_track:.1f}s ({n} frames)")

    t0 = time.perf_counter()
    droid.warm_terminate(expected_keyframes=n)
    print(f"terminate+filler programs compiled/loaded in "
          f"{time.perf_counter() - t0:.1f}s")
    print(f"cache primed: {os.environ['JAX_COMPILATION_CACHE_DIR']}")


if __name__ == "__main__":
    main()
