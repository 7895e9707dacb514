"""In-process accuracy sweep over (weights × seeds) on the synthetic
protocol — the fast path for checkpoint selection and dtype A/Bs.

One Python process, one JAX runtime: jit caches stay warm across evals
(weights are ARGUMENTS to the compiled programs; only a new keyframe-count
shape bucket recompiles), so a 18-eval sweep costs minutes instead of the
~10 min/eval a process-per-eval sweep pays in program deserialization over
the axon tunnel. Protocol identical to `apps/evaluate.py --dataset
synthetic` (same renderer call, same config, same scale-corrected ATE).

  python tools/eval_sweep.py --weights A.msgpack B.msgpack --seeds 7 11 23 \
      [--frames 48] [--image_size 192 256] [--compute_dtype float32] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", nargs="+", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 11, 23])
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--image_size", type=int, nargs=2, default=[192, 256])
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--json", default=None, help="append JSONL here too")
    args = ap.parse_args()

    import jax.numpy as jnp

    from droid_slam_tpu.apps.evaluate import run_slam
    from droid_slam_tpu.data.synthetic import render_sequence
    from droid_slam_tpu.eval.ate import Trajectory, ate_rmse
    from droid_slam_tpu.runtime.config import DroidConfig

    H, W = args.image_size
    config = DroidConfig(
        image_size=(H, W), buffer=max(96, args.frames), warmup=8,
        compute_dtype=args.compute_dtype,
    )

    # render each seed once, reuse across checkpoints (protocol constants:
    # t_sigma/r_sigma from apps/evaluate.py:96-102)
    seqs = {}
    for seed in args.seeds:
        seqs[seed] = render_sequence(
            np.random.default_rng(seed), n_frames=args.frames,
            image_size=(H, W), t_sigma=0.25, r_sigma=0.02,
        )

    rows = []
    for wts in args.weights:
        for seed in args.seeds:
            seq = seqs[seed]
            track = [
                (k, seq["images"][k], seq["intrinsics"][k])
                for k in range(args.frames)
            ]
            t0 = time.perf_counter()
            traj, droid = run_slam(config, wts, track, track)
            ref = Trajectory(
                np.arange(args.frames, dtype=np.float64),
                seq["poses"][:, :3].astype(np.float64),
                seq["poses"][:, 3:].astype(np.float64),
            )
            est = Trajectory(
                np.arange(args.frames, dtype=np.float64),
                traj[:, :3], traj[:, 3:],
            )
            r = ate_rmse(ref, est, correct_scale=True, max_dt=0.25)
            row = {
                "weights": wts, "seed": seed, "dtype": args.compute_dtype,
                "kf": int(droid.video.counter),
                "ate": round(float(r["ate_rmse"]), 4),
                "scale": round(float(r.get("scale", 1.0)), 3),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            del droid
    if args.json:
        with open(args.json, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
