"""Evaluation runner for the four reference protocols.

TPU-native equivalent of /root/reference/evaluation_scripts/test_{tum,euroc,
eth3d}.py and validate_tartanair.py, with the `evo` dependency replaced by
the in-repo Umeyama/ATE scorer (droid_slam_tpu.eval.ate). Protocols:

  tum:       stride 2, mono, APE align + scale-correct (test_tum.py:106-119)
  euroc:     track stride 2, fill stride 1, positions ×1.10, APE align+scale
             (test_euroc.py:111-138)
  eth3d:     RGB-D (depth/5000), APE align, NO scale correction
             (test_eth3d.py:94-131)
  tartanair: 384×512, scale-corrected ATE (validate_tartanair.py:64-100)

Usage:
  python -m droid_slam_tpu.apps.evaluate --dataset tum --datapath <seq>
      [--weights ...] [--gt groundtruth.txt]
"""

from __future__ import annotations

import argparse
import os

# first compiles of the tracking/training steps are minutes; persistent
# cache unless the caller chose one (CLAUDE.md rule for all scripts)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def run_slam(config, weights, track_stream, fill_stream):
    import jax.numpy as jnp

    from ..runtime import Droid

    droid = Droid(config, weights=weights)
    for item in track_stream:
        if len(item) == 4:
            t, image, depth, intrinsics = item
            droid.track(
                t, jnp.asarray(image), depth=jnp.asarray(depth),
                intrinsics=jnp.asarray(intrinsics),
            )
        else:
            t, image, intrinsics = item
            droid.track(t, jnp.asarray(image), intrinsics=jnp.asarray(intrinsics))

    return droid.terminate(iter(fill_stream)), droid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=["tum", "euroc", "eth3d", "tartanair", "synthetic"])
    parser.add_argument("--datapath", default=None,
                        help="sequence dir; for synthetic: 'seed:<int>'")
    parser.add_argument("--frames", type=int, default=96,
                        help="synthetic: sequence length")
    parser.add_argument("--image_size", type=int, nargs=2, default=[192, 256],
                        help="synthetic: render resolution")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--gt", default=None, help="ground-truth file (TUM format)")
    parser.add_argument("--stereo", action="store_true")
    parser.add_argument("--rgbd", action="store_true",
                        help="synthetic: feed the rendered depth channel "
                        "(disps_sens + BA α-prior); metric scale, unscaled ATE")
    parser.add_argument("--compute_dtype", default=None,
                        choices=["bfloat16", "float32"],
                        help="override the runtime compute dtype (bf16 is the "
                        "TPU default; use float32 on CPU, where bf16 is "
                        "emulated and ~2x slower)")
    parser.add_argument("--mono", action="store_true",
                        help="eth3d: ignore the depth stream (the named "
                        "protocol is RGB-D, test_eth3d.py:34; mono output "
                        "has arbitrary scale, so ATE is scored WITH scale "
                        "correction in this mode)")
    parser.add_argument("--save_traj", default=None)
    args = parser.parse_args()
    if args.dataset != "synthetic" and not args.datapath:
        parser.error("--datapath is required for non-synthetic datasets")

    from ..data import streams
    from ..eval.ate import Trajectory, ate_rmse
    from ..runtime.config import preset, DroidConfig

    ref = None  # in-memory GT (synthetic); else loaded from `gt` path
    if args.dataset == "synthetic":
        # procedurally rendered mono sequence with exact GT — the in-repo
        # accuracy protocol (no public dataset ships in this environment)
        from ..data.synthetic import render_sequence

        seed = 7
        if args.datapath and args.datapath.startswith("seed:"):
            seed = int(args.datapath.split(":", 1)[1])
        # motion sized so inter-frame flow at the 1/8 feature grid is
        # ~2-3 px — the regime the reference's keyframe threshold
        # (2.4 px mean 1/8-res flow, motion_filter.py:83) was tuned for;
        # slower sequences never trigger keyframing and SLAM never starts
        seq = render_sequence(
            np.random.default_rng(seed),
            n_frames=args.frames,
            image_size=tuple(args.image_size),
            t_sigma=0.25,
            r_sigma=0.02,
            stereo=args.stereo,
        )
        if args.stereo:
            # stereo rig: frames [2, H, W, 3]; the runtime's self-edges
            # carry the rig baseline, which matches the renderer's, so the
            # reconstruction is metric (scale 1) — gate ATE UNSCALED like
            # the reference's RGB-D protocol
            track = [
                (k, np.stack([seq["images"][k], seq["images_right"][k]]),
                 seq["intrinsics"][k])
                for k in range(args.frames)
            ]
        elif args.rgbd:
            # depth-sensor channel → disps_sens + the BA α-prior term
            # (metric scale; unscaled ATE, test_eth3d.py:34 protocol)
            track = [
                (k, seq["images"][k], seq["depths"][k], seq["intrinsics"][k])
                for k in range(args.frames)
            ]
        else:
            track = [
                (k, seq["images"][k], seq["intrinsics"][k])
                for k in range(args.frames)
            ]
        fill = [
            (k, seq["images"][k], seq["intrinsics"][k])
            for k in range(args.frames)
        ]
        config = DroidConfig(
            image_size=tuple(args.image_size),
            buffer=max(96, args.frames),
            warmup=8,
            stereo=args.stereo,
        )
        scale_correct = not (args.stereo or args.rgbd)
        pos_scale = 1.0
        gt = None
        ref = Trajectory(
            np.arange(args.frames, dtype=np.float64),
            seq["poses"][:, :3].astype(np.float64),
            seq["poses"][:, 3:].astype(np.float64),
        )
    elif args.dataset == "tum":
        track = list(streams.tum_stream(args.datapath, stride=2))
        fill = track
        config = preset("tum")
        scale_correct, pos_scale = True, 1.0
        gt = args.gt or f"{args.datapath}/groundtruth.txt"
    elif args.dataset == "euroc":
        track = list(streams.euroc_stream(args.datapath, stereo=args.stereo, stride=2))
        fill = list(streams.euroc_stream(args.datapath, stereo=False, stride=1))
        config = preset("euroc", stereo=args.stereo)
        scale_correct, pos_scale = True, 1.10
        gt_csv = f"{args.datapath}/mav0/state_groundtruth_estimate0/data.csv"
        gt = args.gt or (gt_csv if os.path.exists(gt_csv) else None)
    elif args.dataset == "eth3d":
        # the protocol is RGB-D (test_eth3d.py:34 streams depth/5000 always)
        # with NO scale correction; a --mono run has arbitrary scale and is
        # only meaningful scale-corrected
        track = list(
            streams.eth3d_stream(args.datapath, use_depth=not args.mono, stride=1)
        )
        fill = list(streams.eth3d_stream(args.datapath, use_depth=False, stride=1))
        config = preset("eth3d")
        scale_correct, pos_scale = (True, 1.0) if args.mono else (False, 1.0)
        gt = args.gt or f"{args.datapath}/groundtruth.txt"
    else:  # tartanair
        track = streams.tartanair_stream(args.datapath, stereo=args.stereo)
        fill = track
        config = preset("tartanair", stereo=args.stereo)
        scale_correct, pos_scale = True, 1.0
        gt = args.gt or f"{args.datapath}/pose_left.txt"

    # match the working resolution to the stream
    first = track[0][1]
    hw = first.shape[-3:-1] if first.ndim == 4 else first.shape[:2]
    import dataclasses

    config = dataclasses.replace(config, image_size=tuple(hw))
    if args.compute_dtype:
        config = dataclasses.replace(config, compute_dtype=args.compute_dtype)

    traj_est, droid = run_slam(config, args.weights, track, fill)
    print(f"keyframes: {droid.video.counter} / {len(track)} tracked frames")
    # streams yield integer frame indices as t (reference parity; the SLAM
    # float32 tstamp buffer and SE3 interpolation need small consistent
    # values); the epoch timestamps for GT association come from the
    # host-side *_times helpers (float64)
    if args.dataset == "tum":
        tstamps = streams.tum_times(args.datapath, stride=2)[: len(fill)]
    elif args.dataset == "euroc":
        tstamps = streams.euroc_times(args.datapath, stride=1)[: len(fill)]
    elif args.dataset == "eth3d":
        tstamps = streams.eth3d_times(args.datapath, stride=1)[: len(fill)]
    else:  # synthetic / tartanair already stamp with indices
        tstamps = np.asarray([item[0] for item in fill], np.float64)

    est = Trajectory(tstamps, pos_scale * traj_est[:, :3], traj_est[:, 3:])
    if args.save_traj:
        est.save_tum(args.save_traj)
        print(f"saved trajectory to {args.save_traj}")

    if gt is not None:
        if args.dataset == "tartanair":
            ref = Trajectory.load_tartanair(gt)
        else:
            ref = Trajectory.load(gt)
    if ref is not None:
        max_dt = 1e16 if args.dataset == "tartanair" else 0.02
        if args.dataset == "synthetic":
            max_dt = 0.25
        result = ate_rmse(ref, est, correct_scale=scale_correct, max_dt=max_dt)
        print({k: round(v, 6) if isinstance(v, float) else v for k, v in result.items()})
    else:
        print("no ground truth given; skipping ATE")


if __name__ == "__main__":
    main()
