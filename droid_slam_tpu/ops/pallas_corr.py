"""Pallas TPU kernel: fused correlation-pyramid build + window lookup.

The production corr op of the SLAM runtime. Computes, per factor-graph edge
and per source pixel, the (2r+1)² bilinear window samples of the correlation
map around that pixel's reprojected coordinates — the combined job of the
reference's correlation volume + ``corr_index_forward`` sampler
(/root/reference/src/correlation_kernels_cpu.cc:8-84) and of its fused
low-memory ``altcorr`` CUDA kernel (/root/reference/src/altcorr_kernel.cu).

Why a hand kernel: the XLA formulation (ops/corr.py) expresses the window
selection as one-hot batched matmuls; XLA's layout assignment then re-lays-out
the [N, HW, H2, W2] volume between the correlation dot and the selection dots
— a ~140 MB HBM round-trip per operator iteration (measured 1.5 ms, the
single largest op in the tracking loop). Here the volume tile lives ONLY in
VMEM scratch:

  grid = (edge n, source-pixel tile pt); per step —
    1. ONE MXU dot  f2pad [H2·Wp, C] × f1ᵀ [C, TP]  →  volume tile,
       written into a y-padded VMEM scratch volpad [Yp, Wp, TP]
       (source pixels on the lane axis; x-padding is pre-built into f2pad
       by the XLA caller so every window is in-bounds),
    2. per-pixel window extraction WITHOUT gathers: the window start
       y0+PAD is split into coarse/fine (q, r) = divmod(·, 8) and the
       extraction becomes two stages of one-hot-weighted sums of SHIFTED
       STATIC slices (5 + 8 terms for rows, 6 + 8 for columns) — the
       TPU-native replacement for the per-thread gathers of the CUDA
       kernel, sized to keep the Mosaic op count (and compile time) small,
    3. bilinear combine of the four shifted sub-patches, flattened in the
       oracle's (i, j) tap order.

HBM traffic is only fmap reads + the [N, taps, HW] output; the correlation
dot accumulates in float32 (bf16 inputs) — strictly more precise than the
XLA path under default TPU matmul precision.

STATUS: semantics are pinned by tests/test_pallas_corr.py (interpret mode);
the Mosaic HARDWARE compile currently crashes the axon remote-compile helper
(HTTP 500 "tpu_compile_helper subprocess exit code 1"). Bisection: each
selection stage compiles alone (masked aligned-slice chain ≈ 2 s, unaligned
variant ≈ 3 s), but any TWO chained stages in one kernel either hang Mosaic
(>30 min) or crash the helper, with value-, scratch- and pltpu.roll-staged
formulations all affected. Until the toolchain clears, `corr_lookup_fused`
(ops/corr.py) — the XLA one-hot formulation, ~45× faster than the naive
gather path and fully fused — remains the production lookup.

Round-2 re-test (2026-08-17, PALLAS_AXON_REMOTE_COMPILE=1): unchanged — a
demo-scale `corr_level_pallas` compile (N=4, 1200 px, 30×40, r=3) did not
return within a 900 s timeout (hang signature, no HTTP error this time).
Re-tested again 2026-08-18 after the relay restart: identical 900 s hang on
the same demo-scale compile. Re-test each round per CLAUDE.md.

Round-4 re-test (2026-08-20, tools/pallas_ab.py --n 48): the SPLIT
two-`pallas_call` variant (`corr_level_pallas_split` — one masked-selection
stage per kernel, built in r3 specifically to dodge the two-chained-stage
signature) ALSO hangs the remote Mosaic compiler: the XLA baseline compiled
and ran in 2.1 s, the split kernel's compile did not return within the 900 s
cap (exit 124, no HTTP error). Since single stages compile in seconds in
isolation (r1 bisection above) but a stage embedded in the full kernel body
does not, the hang is NOT purely a function of chained selection stages —
the helper chokes on the full kernel regardless of how the stages are
partitioned across pallas_calls. VERDICT r3 item 2 is hereby closed as
"toolchain-blocked, retested, recorded": the XLA one-hot formulation
(`corr_lookup_fused`) is the production path, this module stays
interpret-pinned as the design artifact for when the toolchain clears.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

PAD = 8  # window padding in y and x: window starts land in [0, dim + 2*PAD)


def _corr_level_kernel(
    f1_ref,  # [1, TP, C]       source features (pre-scaled)
    f2_ref,  # [1, H2*Wp, C]    target features, x-prepadded (pre-scaled)
    coords_ref,  # [1, TP, 2]   float (x, y) window centers at this level
    out_ref,  # [1, RD*RD, TP]
    volpad_ref,  # VMEM scratch [Yp, Wp, TP] f32 (y-padded volume tile)
    *,
    h2: int,
    w2: int,
    radius: int,
):
    rd = 2 * radius + 1
    P = rd + 1  # 8: integer support of the bilinear window
    tp = f1_ref.shape[1]
    wp = 8 * ((w2 + 7) // 8) + 16  # must match corr_level_pallas
    yp = volpad_ref.shape[0]

    f1 = f1_ref[0]  # [TP, C]
    cx = coords_ref[0, :, 0] - radius  # [TP]
    cy = coords_ref[0, :, 1] - radius
    x0f = jnp.floor(jnp.clip(cx, -1000.0, 1000.0))
    y0f = jnp.floor(jnp.clip(cy, -1000.0, 1000.0))
    dx = (cx - x0f).astype(jnp.float32)[None, None, :]  # [1, 1, TP]
    dy = (cy - y0f).astype(jnp.float32)[None, None, :]
    # window starts in padded coordinates; exact one-hot matches only for
    # starts inside the padded buffer — everything else yields zeros
    ys = y0f.astype(jnp.int32) + PAD  # [TP] ∈ [0, h2+2*PAD) when in range
    xs = x0f.astype(jnp.int32) + PAD
    yq, yr = ys // 8, ys % 8
    xq, xr = xs // 8, xs % 8

    # ---- 1. one MXU dot builds the x-padded volume tile ----
    volpad_ref[:, :, :] = jnp.zeros_like(volpad_ref)
    vol = jax.lax.dot_general(
        f2_ref[0],
        f1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H2*Wp, TP]
    volpad_ref[PAD : PAD + h2, :, :] = vol.reshape(h2, wp, tp)

    # ---- 2. two-stage (coarse/fine) row & column window extraction ----
    # valid window starts satisfy start + 8 ≤ dim, so coarse blocks of 16
    # at offsets 8q with 8q + 16 ≤ dim cover every case (dims are padded to
    # guarantee the spill room); out-of-range starts match no one-hot → 0
    yblk = jnp.zeros((16, wp, tp), jnp.float32)
    for q in range((yp - 16) // 8 + 1):
        m = (yq == q).astype(jnp.float32)[None, None, :]
        yblk = yblk + m * volpad_ref[8 * q : 8 * q + 16, :, :]
    slab = jnp.zeros((P, wp, tp), jnp.float32)
    for r in range(8):
        m = (yr == r).astype(jnp.float32)[None, None, :]
        slab = slab + m * yblk[r : r + P, :, :]

    xblk = jnp.zeros((P, 16, tp), jnp.float32)
    for q in range((wp - 16) // 8 + 1):
        m = (xq == q).astype(jnp.float32)[None, None, :]
        xblk = xblk + m * slab[:, 8 * q : 8 * q + 16, :]
    patch = jnp.zeros((P, P, tp), jnp.float32)
    for v in range(8):
        mv = (xr == v).astype(jnp.float32)[None, None, :]
        patch = patch + mv * xblk[:, v : v + P, :]

    # ---- 3. bilinear combine, taps in (i, j) order ----
    v00 = patch[:rd, :rd]
    v01 = patch[1:, :rd]
    v10 = patch[:rd, 1:]
    v11 = patch[1:, 1:]
    out = (
        v00 * (1 - dx) * (1 - dy)
        + v10 * dx * (1 - dy)
        + v01 * (1 - dx) * dy
        + v11 * dx * dy
    )  # [rd(j), rd(i), TP]
    out_ref[0] = jnp.swapaxes(out, 0, 1).reshape(rd * rd, tp)


# ---------------------------------------------------------------------------
# Split formulation: two chained pallas_calls, ONE masked-selection stage each
# ---------------------------------------------------------------------------
# The Mosaic toolchain hangs on two chained selection stages in one kernel but
# compiles each stage alone (module docstring). This variant sidesteps the
# exact failing signature: kernel A does the correlation dot (VMEM-resident
# volume) + a single-stage UNALIGNED row selection and stages the [P, Wp, TP]
# slab through HBM; kernel B does a single-stage column selection + the
# bilinear combine. Costs one slab round-trip of HBM traffic per level
# (~2 MB/edge at demo scale) that the fused kernel avoids — wire in only if
# the A/B bench wins (VERDICT r2 item 6).


def _corr_slab_kernel(
    f1_ref,  # [1, TP, C]
    f2_ref,  # [1, H2*Wp, C]
    coords_ref,  # [1, TP, 2]
    slab_ref,  # [1, P, Wp, TP] out: row-selected slab
    volpad_ref,  # VMEM scratch [Yp, Wp, TP]
    *,
    h2: int,
    w2: int,
    radius: int,
):
    rd = 2 * radius + 1
    P = rd + 1
    tp = f1_ref.shape[1]
    wp = 8 * ((w2 + 7) // 8) + 16
    yp = volpad_ref.shape[0]

    f1 = f1_ref[0]
    cy = coords_ref[0, :, 1] - radius
    y0f = jnp.floor(jnp.clip(cy, -1000.0, 1000.0))
    ys = y0f.astype(jnp.int32) + PAD  # [TP]

    volpad_ref[:, :, :] = jnp.zeros_like(volpad_ref)
    vol = jax.lax.dot_general(
        f2_ref[0],
        f1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H2*Wp, TP]
    volpad_ref[PAD : PAD + h2, :, :] = vol.reshape(h2, wp, tp)

    # single-stage row selection (unaligned shifted slices; compiles alone
    # per the bisection). Starts outside [0, yp-P] match no one-hot -> 0,
    # and starts whose real rows are all padding sum zeros — both identical
    # to the fused kernel's semantics.
    slab = jnp.zeros((P, wp, tp), jnp.float32)
    for r in range(yp - P + 1):
        m = (ys == r).astype(jnp.float32)[None, None, :]
        slab = slab + m * volpad_ref[r : r + P, :, :]
    slab_ref[0] = slab


def _corr_window_kernel(
    slab_ref,  # [1, P, Wp, TP]
    coords_ref,  # [1, TP, 2]
    out_ref,  # [1, RD*RD, TP]
    *,
    w2: int,
    radius: int,
):
    rd = 2 * radius + 1
    P = rd + 1
    wp = slab_ref.shape[2]

    cx = coords_ref[0, :, 0] - radius
    cy = coords_ref[0, :, 1] - radius
    x0f = jnp.floor(jnp.clip(cx, -1000.0, 1000.0))
    y0f = jnp.floor(jnp.clip(cy, -1000.0, 1000.0))
    dx = (cx - x0f).astype(jnp.float32)[None, None, :]
    dy = (cy - y0f).astype(jnp.float32)[None, None, :]
    xs = x0f.astype(jnp.int32) + PAD

    slab = slab_ref[0]
    patch = jnp.zeros((P, P, slab.shape[-1]), jnp.float32)
    for v in range(wp - P + 1):
        m = (xs == v).astype(jnp.float32)[None, None, :]
        patch = patch + m * slab[:, v : v + P, :]

    v00 = patch[:rd, :rd]
    v01 = patch[1:, :rd]
    v10 = patch[:rd, 1:]
    v11 = patch[1:, 1:]
    out = (
        v00 * (1 - dx) * (1 - dy)
        + v10 * dx * (1 - dy)
        + v01 * (1 - dx) * dy
        + v11 * dx * dy
    )
    out_ref[0] = jnp.swapaxes(out, 0, 1).reshape(rd * rd, slab.shape[-1])


def corr_level_pallas_split(
    f1flat: Array,
    fmap2: Array,
    coords: Array,
    radius: int = 3,
    tile: int = 256,
    interpret: bool = False,
) -> Array:
    """Two-pallas_call variant of :func:`corr_level_pallas` (same contract)."""
    n, p, c = f1flat.shape
    h2, w2 = fmap2.shape[1:3]
    rd = 2 * radius + 1
    P = rd + 1
    wp = 8 * ((w2 + 7) // 8) + 16
    yp = 8 * ((h2 + 7) // 8) + 16

    f2pad = jnp.pad(fmap2, ((0, 0), (0, 0), (PAD, wp - PAD - w2), (0, 0)))
    f2pad = f2pad.reshape(n, h2 * wp, c)

    tile = max(128, (tile // 128) * 128)
    p_pad = -(-p // tile) * tile
    if p_pad != p:
        f1flat = jnp.pad(f1flat, ((0, 0), (0, p_pad - p), (0, 0)))
        coords = jnp.pad(coords, ((0, 0), (0, p_pad - p), (0, 0)))
    grid = (n, p_pad // tile)

    slab = pl.pallas_call(
        functools.partial(_corr_slab_kernel, h2=h2, w2=w2, radius=radius),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h2 * wp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile, 2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, P, wp, tile), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, P, wp, p_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((yp, wp, tile), jnp.float32)],
        interpret=interpret,
    )(f1flat, f2pad, coords)

    out = pl.pallas_call(
        functools.partial(_corr_window_kernel, w2=w2, radius=radius),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, P, wp, tile), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile, 2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rd * rd, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, rd * rd, p_pad), jnp.float32),
        interpret=interpret,
    )(slab, coords)
    return out[:, :, :p]


def corr_level_pallas(
    f1flat: Array,  # [N, P, C] pre-scaled source features
    fmap2: Array,  # [N, H2, W2, C] pre-scaled target features
    coords: Array,  # [N, P, 2] float window centers at this level
    radius: int = 3,
    tile: int = 256,
    interpret: bool = False,
) -> Array:
    """One pyramid level of fused correlation + window sampling.

    Returns [N, (2r+1)², P] float32 (taps leading so per-level outputs
    concatenate without relayout; transpose once at the end).
    """
    n, p, c = f1flat.shape
    h2, w2 = fmap2.shape[1:3]
    rd = 2 * radius + 1
    # padded dims guarantee 16-wide coarse slices for every matchable window
    # start (start ≤ dim + radius+… < 8·(dim//8+1)+8): 8·q + 16 ≤ padded dim
    wp = 8 * ((w2 + 7) // 8) + 16
    yp = 8 * ((h2 + 7) // 8) + 16

    # x-padding is pre-built into f2 so the kernel's dot emits padded rows
    f2pad = jnp.pad(fmap2, ((0, 0), (0, 0), (PAD, wp - PAD - w2), (0, 0)))
    f2pad = f2pad.reshape(n, h2 * wp, c)

    # lane-dim blocks must be multiples of 128: pad pixels to a tile multiple
    tile = max(128, (tile // 128) * 128)
    p_pad = -(-p // tile) * tile
    if p_pad != p:
        f1flat = jnp.pad(f1flat, ((0, 0), (0, p_pad - p), (0, 0)))
        coords = jnp.pad(coords, ((0, 0), (0, p_pad - p), (0, 0)))
    grid = (n, p_pad // tile)

    kernel = functools.partial(_corr_level_kernel, h2=h2, w2=w2, radius=radius)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h2 * wp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile, 2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rd * rd, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, rd * rd, p_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((yp, wp, tile), jnp.float32),
        ],
        interpret=interpret,
    )(f1flat, f2pad, coords)
    return out[:, :, :p]


def corr_lookup_pallas(
    fmap1: Array,
    fmap2: Array,
    coords: Array,
    num_levels: int = 4,
    radius: int = 3,
    interpret: bool = False,
    split: bool = False,
) -> Array:
    """Drop-in Pallas replacement for ``ops.corr.corr_lookup_fused``.

    fmap1/fmap2: [N, H, W, C]; coords: [N, H, W, 2] level-0 centers.
    Returns [N, H, W, L·(2r+1)²] float32, channel order (level, i, j).
    ``split=True`` uses the two-pallas_call formulation (one selection stage
    per kernel) that sidesteps the Mosaic two-stage hang.
    """
    from .corr import avg_pool2x2  # pooling of feature maps stays in XLA

    level_fn = corr_level_pallas_split if split else corr_level_pallas
    n, h1, w1, c = fmap1.shape
    f1 = (fmap1 * 0.25).reshape(n, h1 * w1, c)
    f2 = fmap2 * 0.25
    cflat = coords.reshape(n, h1 * w1, 2)
    out = []
    for i in range(num_levels):
        if i > 0:
            f2 = jnp.moveaxis(avg_pool2x2(jnp.moveaxis(f2, -1, 1)), 1, -1)
        out.append(
            level_fn(
                f1, f2, cflat / (2.0**i), radius=radius, interpret=interpret
            )
        )
    stacked = jnp.concatenate(out, axis=1)  # [N, L·rd², P]
    return jnp.swapaxes(stacked, 1, 2).reshape(n, h1, w1, -1)
