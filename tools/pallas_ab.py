"""Hardware A/B: Pallas fused-corr kernel vs the production XLA one-hot path.

Round-3 retest of the Mosaic toolchain (VERDICT r2 item 6): the split
two-pallas_call variant (ops/pallas_corr.py corr_level_pallas_split) avoids
the two-chained-selection-stage signature that hangs/crashes the remote
Mosaic compiler. This script (a) hardware-compiles it, (b) oracle-checks the
output against `corr_lookup_fused`, (c) times both at demo scale — wire the
Pallas path into runtime/fused.py only if it wins.

Run ON the TPU with the remote Mosaic compiler enabled, under a timeout (the
known failure mode is a >30 min compile hang):

  PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
  PALLAS_AXON_REMOTE_COMPILE=1 JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
  timeout 900 python tools/pallas_ab.py [--split/--fused-kernel] [--n 48]
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
    ap.add_argument("--n", type=int, default=48, help="edges (bench scale)")
    ap.add_argument("--h", type=int, default=30)
    ap.add_argument("--w", type=int, default=40)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fused-kernel", action="store_true",
                    help="test the single-kernel variant (known Mosaic hang) "
                    "instead of the split two-call variant")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from droid_slam_tpu.ops import corr as corr_ops
    from droid_slam_tpu.ops import pallas_corr as pc

    n, h, w, c = args.n, args.h, args.w, args.c
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(5432)
    f1 = jnp.asarray(rng.standard_normal((n, h, w, c)), dt)
    f2 = jnp.asarray(rng.standard_normal((n, h, w, c)), dt)
    # plausible flow field: identity grid + small offsets (windows mostly
    # in-bounds, like tracking)
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    coords = np.stack([gx, gy], -1)[None] + 2.0 * rng.standard_normal(
        (n, h, w, 2)
    ).astype(np.float32)
    coords = jnp.asarray(coords)

    xla = jax.jit(lambda a, b, cc: corr_ops.corr_lookup_fused(a, b, cc))
    pall = jax.jit(
        lambda a, b, cc: pc.corr_lookup_pallas(
            a, b, cc, split=not args.fused_kernel
        )
    )

    t0 = time.perf_counter()
    ref = jax.block_until_ready(xla(f1, f2, coords))
    t_xla_compile = time.perf_counter() - t0
    print(f"xla compile+run: {t_xla_compile:.1f}s", flush=True)

    t0 = time.perf_counter()
    out = jax.block_until_ready(pall(f1, f2, coords))
    t_pallas_compile = time.perf_counter() - t0
    print(f"pallas compile+run: {t_pallas_compile:.1f}s", flush=True)

    err = float(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32)).max())
    print(f"max_abs_err: {err:.4g}", flush=True)

    def bench(fn):
        jax.block_until_ready(fn(f1, f2, coords))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = fn(f1, f2, coords)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / args.reps

    t_xla = bench(xla)
    t_pallas = bench(pall)
    print(json.dumps({
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pallas * 1e3, 3),
        "speedup": round(t_xla / t_pallas, 3),
        "max_abs_err": err,
        "variant": "fused" if args.fused_kernel else "split",
        "shape": [n, h, w, c], "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
