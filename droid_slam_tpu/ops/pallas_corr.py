"""Pallas TPU kernel: fused correlation-pyramid build + window lookup.

The production corr op of the SLAM runtime. Computes, per factor-graph edge
and per source pixel, the (2r+1)² bilinear window samples of the correlation
map around that pixel's reprojected coordinates — the combined job of the
reference's correlation volume + ``corr_index_forward`` sampler
(/root/reference/src/correlation_kernels_cpu.cc:8-84) and of its fused
low-memory ``altcorr`` CUDA kernel (/root/reference/src/altcorr_kernel.cu).

Why a hand kernel: the XLA formulation (ops/corr.py) expresses the window
selection as one-hot batched matmuls; XLA's layout assignment then insists on
re-laying-out the [N, HW, H2, W2] volume between the correlation dot and the
selection dots — a ~140 MB HBM round-trip per operator iteration (measured
1.5 ms, the single largest op in the tracking loop). Here the volume tile
lives ONLY in VMEM scratch:

  grid = (edge n, source-pixel tile pt); per step —
    1. 30 small MXU dots f2[y] [W2, C] × f1ᵀ [C, TP] write the volume tile
       into a zero-padded VMEM scratch volpad [H2+16, W2+16, TP]
       (pixels on the lane axis; padding makes every window in-bounds),
    2. row selection:  slab  = Σ_s (y0+8 == s) · volpad[s : s+8]      (VPU)
    3. col selection:  patch = Σ_s (x0+8 == s) · slab[:, s : s+8]     (VPU)
       — per-pixel dynamic windows become sums of SHIFTED STATIC slices
       weighted by one-hot scalars, the TPU-native replacement for the
       per-thread gathers of the CUDA kernel,
    4. bilinear combine of the four shifted sub-patches, flattened in the
       oracle's (i, j) tap order.

HBM traffic is only fmap reads + the [N, taps, HW] output. Numerics: the
correlation dot accumulates in float32 (bf16 inputs); selection/bilinear are
float32 — strictly more precise than the XLA path under default TPU matmul
precision. Parity vs the XLA oracle is tested at 1e-2 (bf16 inputs) and 1e-5
(f32 inputs, interpret mode) in tests/test_pallas_corr.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

PAD = 8  # window padding on each side: y0/x0 ∈ [−(r+1+3), H2+r] stays in-bounds


def _corr_level_kernel(
    f1_ref,  # [1, TP, C]   source features (pre-scaled)
    f2_ref,  # [1, H2*W2, C] target features (pre-scaled)
    coords_ref,  # [1, TP, 2] float (x, y) window centers at this level
    out_ref,  # [1, RD*RD, TP]
    volpad_ref,  # VMEM scratch [H2+2*PAD, W2+2*PAD, TP] f32
    slab_ref,  # VMEM scratch [RD+1, W2+2*PAD, TP] f32
    *,
    h2: int,
    w2: int,
    radius: int,
):
    rd = 2 * radius + 1
    P = rd + 1
    tp = f1_ref.shape[1]

    f1 = f1_ref[0]  # [TP, C]
    cx = coords_ref[0, :, 0] - radius  # [TP]
    cy = coords_ref[0, :, 1] - radius
    x0f = jnp.floor(cx)
    y0f = jnp.floor(cy)
    dx = (cx - x0f).astype(jnp.float32)[None, None, :]  # [1, 1, TP]
    dy = (cy - y0f).astype(jnp.float32)[None, None, :]
    x0 = x0f.astype(jnp.int32)  # [TP], in [−(r+1)−…, w2+r]
    y0 = y0f.astype(jnp.int32)

    # ---- 1. correlation volume tile into padded VMEM scratch ----
    # (static slices/stores only: dynamic offsets into VMEM scratch make
    # Mosaic stage whole-buffer copies on the scoped stack and OOM)
    volpad_ref[:, :, :] = jnp.zeros_like(volpad_ref)
    for y in range(h2):
        f2row = f2_ref[0, y * w2 : (y + 1) * w2, :]  # [W2, C]
        vrow = jax.lax.dot_general(
            f2row,
            f1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [W2, TP]
        volpad_ref[PAD + y, PAD : PAD + w2, :] = vrow

    # ---- 2. row selection: one-hot-weighted sums of shifted STATIC slices ----
    slab = jnp.zeros((P, w2 + 2 * PAD, tp), jnp.float32)
    for s in range(-PAD, h2 + PAD - P + 1):
        ry = (y0 == s).astype(jnp.float32)[None, None, :]
        slab = slab + ry * volpad_ref[PAD + s : PAD + s + P, :, :]
    slab_ref[:, :, :] = slab

    # ---- 3. col selection ----
    patch = jnp.zeros((P, P, tp), jnp.float32)
    for s in range(-PAD, w2 + PAD - P + 1):
        cxm = (x0 == s).astype(jnp.float32)[None, None, :]
        patch = patch + cxm * slab_ref[:, PAD + s : PAD + s + P, :]

    # ---- 4. bilinear combine, taps in (i, j) order ----
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


def corr_level_pallas(
    f1flat: Array,  # [N, P, C] pre-scaled source features
    fmap2: Array,  # [N, H2, W2, C] pre-scaled target features
    coords: Array,  # [N, P, 2] float window centers at this level
    radius: int = 3,
    tile: int = 240,
    interpret: bool = False,
) -> Array:
    """One pyramid level of fused correlation + window sampling.

    Returns [N, (2r+1)², P] float32 (taps leading so per-level outputs
    concatenate without relayout; transpose once at the end).
    """
    n, p, c = f1flat.shape
    h2, w2 = fmap2.shape[1:3]
    rd = 2 * radius + 1
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
                (1, h2 * w2, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile, 2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rd * rd, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, rd * rd, p_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h2 + 2 * PAD, w2 + 2 * PAD, tile), jnp.float32),
            pltpu.VMEM((rd + 1, w2 + 2 * PAD, tile), jnp.float32),
        ],
        interpret=interpret,
    )(f1flat, fmap2.reshape(n, h2 * w2, c), coords)
    return out[:, :, :p]


def corr_lookup_pallas(
    fmap1: Array,
    fmap2: Array,
    coords: Array,
    num_levels: int = 4,
    radius: int = 3,
    interpret: bool = False,
) -> Array:
    """Drop-in Pallas replacement for ``ops.corr.corr_lookup_fused``.

    fmap1/fmap2: [N, H, W, C]; coords: [N, H, W, 2] level-0 centers.
    Returns [N, H, W, L·(2r+1)²] float32, channel order (level, i, j).
    """
    from .corr import avg_pool2x2  # pooling of feature maps stays in XLA

    n, h1, w1, c = fmap1.shape
    f1 = (fmap1 * 0.25).reshape(n, h1 * w1, c)
    f2 = fmap2 * 0.25
    cflat = coords.reshape(n, h1 * w1, 2)
    out = []
    for i in range(num_levels):
        if i > 0:
            f2 = jnp.moveaxis(avg_pool2x2(jnp.moveaxis(f2, -1, 1)), 1, -1)
        out.append(
            corr_level_pallas(
                f1, f2, cflat / (2.0**i), radius=radius, interpret=interpret
            )
        )
    stacked = jnp.concatenate(out, axis=1)  # [N, L·rd², P]
    return jnp.swapaxes(stacked, 1, 2).reshape(n, h1, w1, -1)
