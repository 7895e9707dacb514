"""SLAM demo on an image directory (or a synthetic stream for smoke-driving).

TPU-native equivalent of /root/reference/demo.py: stream calibrated images,
track, terminate with global BA, optionally save the reconstruction
(tstamps / images / disps / poses / intrinsics as .npy — demo.py:64-81).

Usage:
  python -m droid_slam_tpu.apps.demo --imagedir <dir> --calib <calib.txt>
      [--weights droid.pth|params.msgpack] [--stride 3] [--buffer 512]
      [--reconstruction_path out]
  python -m droid_slam_tpu.apps.demo --synthetic    # no data needed
"""

from __future__ import annotations

import argparse
import os

# first compiles of the tracking/training steps are minutes; persistent
# cache unless the caller chose one (CLAUDE.md rule for all scripts)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import time

import numpy as np


def save_reconstruction(droid, path: str):
    """Export the keyframe map (demo.py:64-81)."""
    t = droid.video.counter
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "tstamps.npy"), np.asarray(droid.video.tstamp[:t]))
    np.save(os.path.join(path, "images.npy"), np.asarray(droid.video.images[:t]))
    np.save(os.path.join(path, "disps.npy"), np.asarray(droid.video.disps_up[:t]))
    np.save(os.path.join(path, "poses.npy"), np.asarray(droid.video.poses[:t]))
    np.save(
        os.path.join(path, "intrinsics.npy"), np.asarray(droid.video.intrinsics[:t])
    )


def synthetic_stream(n=24, H=64, W=64, seed=0):
    rng = np.random.default_rng(seed)
    intr = np.array([W, W, W / 2, H / 2], np.float32)
    for t in range(n):
        yield t, rng.integers(0, 255, (H, W, 3), np.uint8), intr


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imagedir", type=str, help="path to image directory")
    parser.add_argument("--calib", type=str, help="path to calibration file")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--buffer", type=int, default=512)
    parser.add_argument("--image_size", default=None, nargs=2, type=int,
                        help="approximate working resolution: frames are "
                        "resized (aspect preserved) to about H*W pixels; "
                        "default keeps the reference's 384*512-pixel area "
                        "(demo.py:47-52)")
    parser.add_argument("--t0", default=0, type=int, help="starting frame")
    parser.add_argument("--t1", default=None, type=int, help="ending frame")
    parser.add_argument("--stride", default=3, type=int)
    parser.add_argument("--filter_thresh", type=float, default=2.4)
    parser.add_argument("--warmup", type=int, default=8)
    parser.add_argument("--keyframe_thresh", type=float, default=4.0)
    parser.add_argument("--frontend_thresh", type=float, default=16.0)
    parser.add_argument("--frontend_window", type=int, default=25)
    parser.add_argument("--frontend_radius", type=int, default=2)
    parser.add_argument("--frontend_nms", type=int, default=1)
    parser.add_argument("--backend_thresh", type=float, default=22.0)
    parser.add_argument("--backend_radius", type=int, default=2)
    parser.add_argument("--backend_nms", type=int, default=3)
    parser.add_argument("--upsample", action="store_true")
    parser.add_argument("--visualize", action="store_true",
                        help="spawn the live map visualizer (open3d window "
                        "when available, headless point-cloud thread otherwise)")
    parser.add_argument("--reconstruction_path", default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="run on random frames (pipeline smoke drive)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler device trace of tracking")
    parser.add_argument("--warm_terminate", action="store_true",
                        help="precompile the global-BA terminate path before "
                        "tracking starts (Droid.warm_terminate; trades a "
                        "longer start-up for a fast first terminate — see "
                        "the compile-cliff note in README)")
    args = parser.parse_args()

    # the exported reconstruction's dense depths come from the upsampled
    # disparities; without them disps.npy would be zeros (demo.py:118-119)
    if args.reconstruction_path is not None:
        args.upsample = True

    import jax.numpy as jnp

    from ..runtime import Droid, DroidConfig
    from ..data.streams import image_stream

    if args.synthetic:
        stream = list(synthetic_stream())
        h, w = stream[0][1].shape[:2]
        config = DroidConfig(
            image_size=(h, w), buffer=64, warmup=4, max_factors=16,
            inactive_pad=16, window_pad=16, schur_pair_floor=512,
            filter_thresh=-1.0, keyframe_thresh=0.0,
            frontend_window=8, frontend_thresh=1e9, backend_thresh=1e9,
            upsample=args.upsample,
        )
    else:
        area = (
            args.image_size[0] * args.image_size[1]
            if args.image_size else 384 * 512
        )
        stream = list(
            image_stream(args.imagedir, args.calib, args.stride,
                         target_area=area)
        )
        # frame-range selection, t1 inclusive (reference demo.py:87-88,124-126)
        stream = stream[args.t0 : None if args.t1 is None else args.t1 + 1]
        h, w = stream[0][1].shape[:2]
        config = DroidConfig(
            image_size=(h, w),
            buffer=args.buffer,
            filter_thresh=args.filter_thresh,
            warmup=args.warmup,
            keyframe_thresh=args.keyframe_thresh,
            frontend_thresh=args.frontend_thresh,
            frontend_window=args.frontend_window,
            frontend_radius=args.frontend_radius,
            frontend_nms=args.frontend_nms,
            backend_thresh=args.backend_thresh,
            backend_radius=args.backend_radius,
            backend_nms=args.backend_nms,
            upsample=args.upsample,
        )

    droid = Droid(config, weights=args.weights, visualize=args.visualize)
    if args.warm_terminate:
        # every stream frame keyframing is the worst case; a real session
        # keyframes ~1/3 of frames — warm for that bucket (the method
        # clamps to the buffer capacity)
        droid.warm_terminate(expected_keyframes=max(len(stream) // 3, 8))

    import contextlib

    from ..utils.profiling import device_trace

    trace_ctx = device_trace(args.profile) if args.profile else contextlib.nullcontext()
    t_track0 = time.perf_counter()
    with trace_ctx:
        for (t, image, intrinsics) in stream:
            droid.track(t, jnp.asarray(image), intrinsics=jnp.asarray(intrinsics))
        droid.sync()
    t_track = time.perf_counter() - t_track0

    t_term0 = time.perf_counter()
    traj = droid.terminate(iter(stream))
    t_term = time.perf_counter() - t_term0

    print(f"tracked {len(stream)} frames / {droid.video.counter} keyframes")
    print(f"timings: track {t_track:.2f}s ({len(stream)/t_track:.2f} fps), "
          f"terminate {t_term:.2f}s")
    print("trajectory (first 5 poses, tx ty tz qx qy qz qw):")
    print(np.array2string(traj[:5], precision=4, suppress_small=True))

    if args.reconstruction_path:
        save_reconstruction(droid, args.reconstruction_path)
        print(f"saved reconstruction to {args.reconstruction_path}")


if __name__ == "__main__":
    main()
