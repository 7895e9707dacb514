"""Visualization-support geometry ops: back-projection and multi-view depth
consistency filtering.

TPU-native equivalents of the reference's `iproj`, `projmap` and
`depth_filter` kernels (/root/reference/src/droid_kernels_cpu.cc:304-666),
used by the point-cloud visualizer (droid_slam/visualization.py:100-111).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie
from . import projective as pops

Array = jax.Array


@jax.jit
def iproj_points(poses: Array, disps: Array, intrinsics0: Array) -> Array:
    """Back-project every pixel of every frame to world points
    (droid_kernels_cpu.cc:602-666). poses are world→camera; returns
    [F, H, W, 3] world-space points (X/d of the homogeneous back-projection
    carried through the inverse pose)."""
    F = poses.shape[0]
    X0 = pops.iproj(disps, jnp.broadcast_to(intrinsics0, (F, 4)))  # (X, Y, 1, d)
    Ginv = lie.inv(poses)
    X1 = lie.act(Ginv[:, None, None, :], X0)
    d = jnp.maximum(X1[..., 3:4], 1e-8)
    return X1[..., :3] / d


@jax.jit
def projmap(poses: Array, disps: Array, intrinsics0: Array, ii: Array, jj: Array):
    """Reprojection coordinates (+depth) and validity per edge
    (droid_kernels_cpu.cc:304-385)."""
    F = poses.shape[0]
    intr = jnp.broadcast_to(intrinsics0, (F, 4))
    coords, valid = pops.projective_transform(
        poses, disps, intr, ii, jj, return_depth=True,
        min_depth=pops.MIN_DEPTH_NATIVE,
    )
    return coords, valid


@jax.jit
def depth_filter(
    poses: Array, disps: Array, intrinsics0: Array, inds: Array, thresh: Array
) -> Array:
    """Multi-view inverse-depth consistency count (droid_kernels_cpu.cc:498-598).

    For each frame ix in `inds`, reproject every pixel into the 6 neighbor
    keyframes {ix−3, ix−2, ix−1, ix+3, ix+4, ix+5} and count how many agree:
    a neighbor agrees when any of the 4 bilinear corner pixels has
    |1/d_proj − 1/d_corner| < thresh. Returns [len(inds), H, W] counts.
    """
    F, ht, wd = disps.shape
    fx, fy, cx, cy = intrinsics0

    def one_pair(ix, jx, t):
        ok_pair = (jx >= 0) & (jx < F)
        jx_safe = jnp.clip(jx, 0, F - 1)
        Gij = pops.relative_poses(poses, ix[None], jx_safe[None])[0]
        X0 = pops.iproj(disps[ix][None], intrinsics0[None])[0]
        X1 = lie.act(Gij[None, None], X0)
        Z = X1[..., 2]
        uj = fx * X1[..., 0] / Z + cx
        vj = fy * X1[..., 1] / Z + cy
        dj = X1[..., 3] / Z

        u0 = jnp.floor(uj).astype(jnp.int32)
        v0 = jnp.floor(vj).astype(jnp.int32)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < wd - 1) & (v0 < ht - 1)
        u0c = jnp.clip(u0, 0, wd - 2)
        v0c = jnp.clip(v0, 0, ht - 2)

        dmap = disps[jx_safe]
        inv_dj = 1.0 / jnp.maximum(dj, 1e-8)
        agree = jnp.zeros_like(dj, dtype=bool)
        for dv in (0, 1):
            for du in (0, 1):
                corner = dmap[v0c + dv, u0c + du]
                agree = agree | (
                    jnp.abs(inv_dj - 1.0 / jnp.maximum(corner, 1e-8)) < t
                )
        return jnp.where(inb & ok_pair, agree, False).astype(jnp.float32)

    def one_frame(ix, t):
        neighbors = jnp.stack([ix - 1, ix - 2, ix - 3, ix + 3, ix + 4, ix + 5])
        counts = jax.vmap(lambda jx: one_pair(ix, jx, t))(neighbors)
        return jnp.sum(counts, axis=0)

    return jax.vmap(one_frame)(inds, thresh)
