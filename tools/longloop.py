"""Reference-scale synthetic evaluation: long courtyard loop with revisit.

Runs track → warm_terminate → terminate (both global-BA passes) → filler on
the loop protocol (data/synthetic.render_loop_sequence) and reports keyframe
count, terminate wall time, and scale-corrected ATE — the buffer≳150 /
global-BA-with-loop-revisit regime the reference validates on
(/root/reference/evaluation_scripts/test_eth3d.py:62 buffer 1024).

The rendered sequence is cached (rendering 240 frames at 384×512 costs
minutes of host raycasting on one core; the cache makes reruns and the
bench extra cheap). Cache key includes the protocol constants.

  python tools/longloop.py [--frames 288] [--image_size 384 512] \
      [--seed 7] [--compute_dtype bfloat16] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def load_or_render(seed: int, frames: int, H: int, W: int,
                   cache_dir: str = "/tmp") -> dict:
    path = os.path.join(cache_dir, f"droid_longloop_{seed}_{frames}_{H}x{W}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    from droid_slam_tpu.data.synthetic import render_loop_sequence

    t0 = time.perf_counter()
    seq = render_loop_sequence(np.random.default_rng(seed), n_frames=frames,
                               image_size=(H, W))
    print(f"rendered {frames} frames at {H}x{W} in "
          f"{time.perf_counter() - t0:.0f}s; caching to {path}", flush=True)
    np.savez(path, **seq)
    return seq


def run(seed: int, frames: int, H: int, W: int, compute_dtype: str,
        warm: bool = True) -> dict:
    import jax.numpy as jnp

    from droid_slam_tpu.eval.ate import Trajectory, ate_rmse
    from droid_slam_tpu.runtime import Droid
    from droid_slam_tpu.runtime.config import DroidConfig

    seq = load_or_render(seed, frames, H, W)
    # buffer: every frame may keyframe on this protocol, plus the filler
    # needs >=16 free slots (batch headroom) — saturation would both drop
    # keyframes and fail the fill
    config = DroidConfig(
        image_size=(H, W), buffer=frames + 24, warmup=8,
        compute_dtype=compute_dtype,
    )
    droid = Droid(config, weights="weights/droid_synth.msgpack")

    t0 = time.perf_counter()
    for k in range(frames):
        droid.track(k, jnp.asarray(seq["images"][k]),
                    intrinsics=jnp.asarray(seq["intrinsics"][k]))
    droid.sync()
    track_s = time.perf_counter() - t0

    kf = int(droid._fused_state.counter) if droid.fused else droid.video.counter
    # pre-terminate keyframe ATE: separates frontend drift from backend
    # behavior when debugging the protocol
    from droid_slam_tpu.ops import lie

    droid._sync_fused_state()
    kf_n = droid.video.counter
    est_kf = np.asarray(lie.inv(droid.video.poses[:kf_n]))
    ts_kf = np.asarray(droid.video.tstamp[:kf_n]).astype(np.float64)
    ref_full = Trajectory(np.arange(frames, dtype=np.float64),
                          seq["poses"][:, :3].astype(np.float64),
                          seq["poses"][:, 3:].astype(np.float64))
    pre = ate_rmse(
        ref_full,
        Trajectory(ts_kf, est_kf[:, :3].astype(np.float64),
                   est_kf[:, 3:].astype(np.float64)),
        correct_scale=True, max_dt=0.25,
    )
    if warm:
        droid.warm_terminate(expected_keyframes=kf)

    stream = [(k, seq["images"][k], seq["intrinsics"][k])
              for k in range(frames)]
    t0 = time.perf_counter()
    traj = droid.terminate(iter(stream))
    term_s = time.perf_counter() - t0

    ref = Trajectory(np.arange(frames, dtype=np.float64),
                     seq["poses"][:, :3].astype(np.float64),
                     seq["poses"][:, 3:].astype(np.float64))
    est = Trajectory(np.arange(frames, dtype=np.float64),
                     traj[:, :3], traj[:, 3:])
    r = ate_rmse(ref, est, correct_scale=True, max_dt=0.25)
    return {
        "frames": frames, "image_size": [H, W], "seed": seed,
        "compute_dtype": compute_dtype,
        "keyframes": int(droid.video.counter),
        "track_s": round(track_s, 2),
        "track_fps": round(frames / track_s, 2),
        "terminate_s": round(term_s, 2),
        "ate_rmse": round(float(r["ate_rmse"]), 4),
        "scale": round(float(r["scale"]), 4),
        "ate_kf_pre_terminate": round(float(pre["ate_rmse"]), 4),
        "scale_kf_pre_terminate": round(float(pre["scale"]), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--frames", type=int, default=288)
    ap.add_argument("--image_size", type=int, nargs=2, default=[384, 512])
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    row = run(args.seed, args.frames, *args.image_size, args.compute_dtype)
    print(json.dumps(row))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
