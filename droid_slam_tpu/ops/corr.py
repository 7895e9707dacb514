"""Correlation volumes and lookups (pure XLA formulation).

TPU-native equivalent of the reference's correlation stack:
  * volume mode — /root/reference/droid_slam/modules/corr.py:26-74 backed by
    the native window sampler ``corr_index_forward``
    (/root/reference/src/correlation_kernels_cpu.cc:8-84),
  * alt/low-memory mode — modules/corr.py:97-145 backed by the fused CUDA
    kernel (/root/reference/src/altcorr_kernel.cu) that recomputes correlation
    on the fly instead of storing the O(N·HW²) volume.

Semantics (shared by both modes, validated against the CPU kernel oracle):
the lookup at pixel (y, x) with float target coords (x0, y0) returns, for each
tap (i, j) ∈ [0, 2r]², the zero-padded bilinear sample of the correlation map
at (x0 − r + i, y0 − r + j). Channel order of the stacked feature is
(level, i, j) with i the x-offset — the order the update op's 1×1 corr encoder
was trained on.

Layouts are NHWC/feature-last throughout. Everything here is differentiable —
the reference needs hand-written backward kernels; XLA derives them.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def corr_volume(fmap1: Array, fmap2: Array) -> Array:
    """All-pairs correlation (modules/corr.py:66-74).

    fmap1, fmap2: [N, H, W, C] → [N, H, W, H, W] = ⟨f1/4, f2/4⟩ per pixel pair.
    One big MXU matmul.
    """
    n, h, w, c = fmap1.shape
    f1 = fmap1.reshape(n, h * w, c) * 0.25
    f2 = fmap2.reshape(n, h * w, c) * 0.25
    corr = jnp.einsum("nic,njc->nij", f1, f2, preferred_element_type=jnp.float32)
    return corr.reshape(n, h, w, h, w)


def avg_pool2x2(x: Array) -> Array:
    """2×2 average pool over the two trailing spatial dims (odd trailing
    rows/cols are dropped, matching torch's floor-mode avg_pool2d)."""
    *lead, h, w = x.shape
    h2, w2 = h // 2, w // 2
    x = x[..., : 2 * h2, : 2 * w2]
    x = x.reshape(*lead, h2, 2, w2, 2)
    return x.mean(axis=(-3, -1))


def build_pyramid(corr: Array, num_levels: int = 4) -> List[Array]:
    """Average-pool pyramid over the *target* spatial dims (corr.py:38-41)."""
    pyramid = [corr]
    for _ in range(num_levels - 1):
        pyramid.append(avg_pool2x2(pyramid[-1]))
    return pyramid


def _bilinear_window_sample(vol: Array, coords: Array, radius: int) -> Array:
    """Sample a (2r+1)² window from per-pixel 2-D maps at float centers.

    vol: [M, H2, W2] — one correlation map per output pixel (M = N·H1·W1);
    coords: [M, 2] float (x, y) centers.
    Returns [M, (2r+1)²] with tap order (i, j), i = x-offset — matching the
    CPU oracle correlation_kernels_cpu.cc:35-80 (zero outside bounds).
    """
    m, h2, w2 = vol.shape
    rd = 2 * radius + 1

    x0 = coords[:, 0] - radius
    y0 = coords[:, 1] - radius
    x0f = jnp.floor(x0)
    y0f = jnp.floor(y0)
    dx = (x0 - x0f)[:, None, None]  # [M, 1, 1]
    dy = (y0 - y0f)[:, None, None]

    off = jnp.arange(rd, dtype=vol.dtype)
    xi = x0f[:, None] + off[None, :]  # [M, rd] integer x of the low corner
    yj = y0f[:, None] + off[None, :]

    vol_flat = vol.reshape(m, h2 * w2)

    def gather(yy: Array, xx: Array) -> Array:
        # yy, xx: [M, rd, rd] integer coords; zero-pad out of bounds
        ok = (yy >= 0) & (yy < h2) & (xx >= 0) & (xx < w2)
        idx = jnp.where(ok, yy * w2 + xx, 0).astype(jnp.int32)
        vals = jnp.take_along_axis(vol_flat, idx.reshape(m, rd * rd), axis=1)
        return jnp.where(ok.reshape(m, rd * rd), vals, 0.0).reshape(m, rd, rd)

    xi_i = xi.astype(jnp.int32)[:, :, None]  # broadcast [M, rd(i), rd(j)]
    yj_i = yj.astype(jnp.int32)[:, None, :]
    xi1 = xi_i + 1
    yj1 = yj_i + 1

    v00 = gather(jnp.broadcast_to(yj_i, (m, rd, rd)), jnp.broadcast_to(xi_i, (m, rd, rd)))
    v10 = gather(jnp.broadcast_to(yj_i, (m, rd, rd)), jnp.broadcast_to(xi1, (m, rd, rd)))
    v01 = gather(jnp.broadcast_to(yj1, (m, rd, rd)), jnp.broadcast_to(xi_i, (m, rd, rd)))
    v11 = gather(jnp.broadcast_to(yj1, (m, rd, rd)), jnp.broadcast_to(xi1, (m, rd, rd)))

    out = (
        v00 * (1 - dx) * (1 - dy)
        + v10 * dx * (1 - dy)
        + v01 * (1 - dx) * dy
        + v11 * dx * dy
    )
    return out.reshape(m, rd * rd)


def corr_index(volume: Array, coords: Array, radius: int = 3) -> Array:
    """Window lookup into a precomputed correlation volume.

    volume: [N, H1, W1, H2, W2]; coords: [N, H1, W1, 2] (x, y) targets.
    Returns [N, H1, W1, (2r+1)²]. Matches ``corr_index_forward``
    (correlation_kernels_cpu.cc:8-84); the backward the reference hand-writes
    in CUDA comes from jax.grad for free.
    """
    n, h1, w1, h2, w2 = volume.shape
    vol = volume.reshape(n * h1 * w1, h2, w2)
    c = coords.reshape(n * h1 * w1, 2)
    out = _bilinear_window_sample(vol, c, radius)
    return out.reshape(n, h1, w1, (2 * radius + 1) ** 2)


class CorrPyramid(NamedTuple):
    """Precomputed 4-level correlation pyramid (volume mode).

    levels[i]: [N, H1, W1, H2/2^i, W2/2^i].
    """

    levels: List[Array]
    radius: int

    @staticmethod
    def build(fmap1: Array, fmap2: Array, num_levels: int = 4, radius: int = 3) -> "CorrPyramid":
        return CorrPyramid(build_pyramid(corr_volume(fmap1, fmap2), num_levels), radius)

    def __call__(self, coords: Array) -> Array:
        """coords: [N, H1, W1, 2] → stacked features [N, H1, W1, L·(2r+1)²]."""
        out = [
            corr_index(lvl, coords / (2.0**i), self.radius)
            for i, lvl in enumerate(self.levels)
        ]
        return jnp.concatenate(out, axis=-1)


jax.tree_util.register_pytree_node(
    CorrPyramid,
    lambda p: (tuple(p.levels), p.radius),
    lambda radius, levels: CorrPyramid(list(levels), radius),
)


# -----------------------------------------------------------------------------
# alt / low-memory mode: correlation recomputed on the fly per lookup window
# -----------------------------------------------------------------------------


def _alt_corr_level(
    fmap1: Array, fmap2: Array, coords: Array, radius: int
) -> Array:
    """One pyramid level of on-the-fly correlation (altcorr_kernel.cu).

    fmap1: [N, H1, W1, C] (level-0 source features, pre-scaled);
    fmap2: [N, H2, W2, C] (level-i target features, pre-scaled);
    coords: [N, H1, W1, 2] float (x, y) at level-i resolution.
    Returns [N, H1, W1, (2r+1)²], tap order (i, j) as in `corr_index`.

    Instead of materialising per-tap gathers of fmap2 ([N,HW,rd²,C] would be
    49× the fmap), we loop taps with `lax.fori_loop` — each iteration is a
    4-corner gather + a C-length dot, which XLA fuses; peak memory is O(N·HW·C).
    """
    n, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    rd = 2 * radius + 1
    m = n * h1 * w1

    f1 = fmap1.reshape(m, c)
    f2 = fmap2.reshape(n, h2 * w2, c)
    batch_ix = jnp.repeat(jnp.arange(n, dtype=jnp.int32), h1 * w1)

    cx = coords.reshape(m, 2)[:, 0]
    cy = coords.reshape(m, 2)[:, 1]
    x0f = jnp.floor(cx - radius)
    y0f = jnp.floor(cy - radius)
    dx = (cx - radius) - x0f
    dy = (cy - radius) - y0f

    def corner(yy, xx):
        ok = (yy >= 0) & (yy < h2) & (xx >= 0) & (xx < w2)
        idx = jnp.where(ok, yy * w2 + xx, 0).astype(jnp.int32)
        vals = f2[batch_ix, idx]  # [M, C]
        dots = jnp.sum(f1 * vals, axis=-1)
        return jnp.where(ok, dots, 0.0)

    def tap(t, acc):
        i = t // rd  # x offset
        j = t % rd  # y offset
        xi = (x0f + i).astype(jnp.int32)
        yj = (y0f + j).astype(jnp.int32)
        v = (
            corner(yj, xi) * (1 - dx) * (1 - dy)
            + corner(yj, xi + 1) * dx * (1 - dy)
            + corner(yj + 1, xi) * (1 - dx) * dy
            + corner(yj + 1, xi + 1) * dx * dy
        )
        return acc.at[:, t].set(v)

    out = jax.lax.fori_loop(0, rd * rd, tap, jnp.zeros((m, rd * rd), fmap1.dtype))
    return out.reshape(n, h1, w1, rd * rd)


class AltCorr(NamedTuple):
    """Feature-map pyramid for on-the-fly correlation (modules/corr.py:97-145).

    Stores pooled *feature maps* (O(N·HW·C)) instead of volumes (O(N·HW²)) —
    the memory strategy that makes global BA over hundreds of keyframes
    feasible. fmaps are pre-scaled by 1/4 so dot products carry the same
    1/16 normalisation as `corr_volume`.
    """

    pyramid: List[Array]  # level i: [F, H/2^i, W/2^i, C]
    radius: int

    @staticmethod
    def build(fmaps: Array, num_levels: int = 4, radius: int = 3) -> "AltCorr":
        f = fmaps * 0.25
        pyr = [f]
        for _ in range(num_levels - 1):
            f = avg_pool2x2(jnp.moveaxis(f, -1, 1))  # pool H, W
            f = jnp.moveaxis(f, 1, -1)
            pyr.append(f)
        return AltCorr(pyr, radius)

    def __call__(self, coords: Array, ii: Array, jj: Array) -> Array:
        """coords: [N, H, W, 2] level-0 targets for edges (ii → jj).

        Returns [N, H, W, L·(2r+1)²] matching `CorrPyramid.__call__`.
        """
        f1 = jnp.take(self.pyramid[0], ii, axis=0)
        out = []
        for i, lvl in enumerate(self.pyramid):
            f2 = jnp.take(lvl, jj, axis=0)
            out.append(_alt_corr_level(f1, f2, coords / (2.0**i), self.radius))
        return jnp.concatenate(out, axis=-1)


jax.tree_util.register_pytree_node(
    AltCorr,
    lambda p: (tuple(p.pyramid), p.radius),
    lambda radius, pyr: AltCorr(list(pyr), radius),
)
