"""Projective camera geometry with analytic Jacobians (pure JAX).

TPU-native equivalent of the reference's twin implementations — the Python
autodiff path (/root/reference/droid_slam/geom/projective_ops.py) and the
hand-written per-pixel CPU/CUDA kernels
(/root/reference/src/droid_kernels_cpu.cc:67-300). One jnp formulation serves
both: under ``jax.jit`` XLA fuses the whole residual/Jacobian pipeline into a
handful of elementwise+matmul kernels, and the same code is differentiable for
training.

Conventions (identical to the reference):
  * poses are world→camera SE(3) as (..., 7) = [t, q_xyzw]
  * points are homogeneous (X, Y, Z, d) where d is inverse depth of the pixel
    in the source frame; the source z-component is always 1
  * intrinsics are [fx, fy, cx, cy] at the operating (1/8) resolution
  * twist layout is translation-first, so pose Jacobians are [..., 2, 6] with
    columns (tx, ty, tz, wx, wy, wz)
  * stereo "self edges" (ii == jj) use the fixed rig baseline
    G_ij = [(−0.1, 0, 0), identity] (projective_ops.py:106, droid_kernels
    ``load_relative_pose(..., -0.1)``)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lie

Array = jax.Array

MIN_DEPTH = 0.2  # training-path threshold (geom/projective_ops.py:6)
MIN_DEPTH_NATIVE = 0.25  # SLAM-runtime threshold (src/droid_kernels.h:13)

# numpy, NOT jnp: a module-level device constant would initialise the JAX
# backend at import time (over the axon tunnel that dials the relay before
# any liveness probe can run)
STEREO_BASELINE = np.asarray([-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=np.float32)


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> Array:
    """Pixel coordinate grid [ht, wd, 2] holding (x, y)."""
    y, x = jnp.meshgrid(jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij")
    return jnp.stack([x, y], axis=-1)


def iproj(disps: Array, intrinsics: Array) -> Array:
    """Pinhole inverse projection to homogeneous points (X, Y, 1, d).

    disps: [..., H, W]; intrinsics: [..., 4] → [..., H, W, 4].
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    x = grid[..., 0]
    y = grid[..., 1]
    X = (x - cx) / fx
    Y = (y - cy) / fy
    ones = jnp.ones_like(disps)
    return jnp.stack([X, Y, ones, disps], axis=-1)


def proj(
    Xs: Array,
    intrinsics: Array,
    jacobian: bool = False,
    return_depth: bool = False,
    min_depth: float = MIN_DEPTH,
) -> Tuple[Array, Optional[Array]]:
    """Pinhole projection of homogeneous points.

    Xs: [..., H, W, 4]; intrinsics: [..., 4].
    Returns coords [..., H, W, 2 (or 3)] and optionally the 2×4 Jacobian
    d(coords)/d(X, Y, Z, d) (geom/projective_ops.py:39-65).
    """
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    X, Y, Z, D = jnp.moveaxis(Xs, -1, 0)

    Z = jnp.where(Z < 0.5 * min_depth, jnp.ones_like(Z), Z)
    d = 1.0 / Z

    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack(
        [fx * d, o, -fx * X * d * d, o, o, fy * d, -fy * Y * d * d, o],
        axis=-1,
    ).reshape(Xs.shape[:-1] + (2, 4))
    return coords, Jp


def actp(Gij: Array, X0: Array, jacobian: bool = False) -> Tuple[Array, Optional[Array]]:
    """SE(3) action on homogeneous point maps with optional 4×6 Jacobian.

    Gij: [..., 7] broadcast over X0's trailing [H, W, 4] map dims.
    Jacobian is w.r.t. a left-multiplied twist at the *target* frame,
    translation-first (geom/projective_ops.py:67-82).
    """
    X1 = lie.act(Gij[..., None, None, :], X0)
    if not jacobian:
        return X1, None

    X, Y, Z, d = jnp.moveaxis(X1, -1, 0)
    o = jnp.zeros_like(d)
    Ja = jnp.stack(
        [
            d, o, o, o, Z, -Y,
            o, d, o, -Z, o, X,
            o, o, d, Y, -X, o,
            o, o, o, o, o, o,
        ],
        axis=-1,
    ).reshape(X1.shape[:-1] + (4, 6))
    return X1, Ja


class TransformJacobians(NamedTuple):
    Ji: Array  # [..., N, H, W, 2, 6] — d(coords)/d(pose_i twist)
    Jj: Array  # [..., N, H, W, 2, 6] — d(coords)/d(pose_j twist)
    Jz: Array  # [..., N, H, W, 2, 1] — d(coords)/d(inverse depth)


def relative_poses(poses: Array, ii: Array, jj: Array) -> Array:
    """G_ij = G_j ∘ G_i⁻¹ per edge, with the stereo-baseline substitution on
    self edges (ii == jj)."""
    Gi = jnp.take(poses, ii, axis=-2)
    Gj = jnp.take(poses, jj, axis=-2)
    Gij = lie.rel(Gi, Gj)
    self_edge = (ii == jj)[..., None]
    return jnp.where(self_edge, jnp.asarray(STEREO_BASELINE, Gij.dtype), Gij)


def projective_transform(
    poses: Array,
    depths: Array,
    intrinsics: Array,
    ii: Array,
    jj: Array,
    jacobian: bool = False,
    return_depth: bool = False,
    min_depth: float = MIN_DEPTH,
):
    """Map pixels of frames ii into frames jj (geom/projective_ops.py:96-126).

    poses: [P, 7]; depths: [P, H, W]; intrinsics: [P, 4]; ii/jj: [N] int.
    Returns (coords [N, H, W, 2(|3)], valid [N, H, W, 1], jacobians?).
    Leading batch axes are supported via jax.vmap at call sites.
    """
    X0 = iproj(jnp.take(depths, ii, axis=0), jnp.take(intrinsics, ii, axis=0))
    Gij = relative_poses(poses, ii, jj)

    X1, Ja = actp(Gij, X0, jacobian=jacobian)
    x1, Jp = proj(
        X1,
        jnp.take(intrinsics, jj, axis=0),
        jacobian=jacobian,
        return_depth=return_depth,
        min_depth=min_depth,
    )

    valid = ((X1[..., 2] > min_depth) & (X0[..., 2] > min_depth)).astype(x1.dtype)[..., None]

    if not jacobian:
        return x1, valid

    # Jacobian w.r.t. the target pose, then dual-adjoint transport to the
    # source pose: Ji = −Ad(G_ij)ᵀ Jj (projective_ops.py:117-124).
    Jj_full = jnp.matmul(Jp, Ja)  # [N, H, W, 2, 6]
    Ji_full = -lie.adjT(Gij[..., None, None, None, :], Jj_full)

    # depth Jacobian: d X1 / d d = G_ij ∘ (0, 0, 0, 1) = (t_ij, 1)
    Jz_pt = jnp.concatenate(
        [lie.translation(Gij), jnp.ones_like(Gij[..., :1])], axis=-1
    )  # [N, 4]
    Jz = jnp.matmul(Jp, Jz_pt[..., None, None, :, None])  # [N, H, W, 2, 1]

    return x1, valid, TransformJacobians(Ji=Ji_full, Jj=Jj_full, Jz=Jz)


def induced_flow(poses: Array, disps: Array, intrinsics: Array, ii: Array, jj: Array):
    """Optical flow induced by camera motion (projective_ops.py:128-139)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
