"""Training losses (JAX): geodesic pose loss, BA-residual loss, flow loss.

TPU-native equivalent of /root/reference/droid_slam/geom/losses.py. All
functions take the per-step stacked outputs of `DroidNet.__call__`
([S, B, ...]) and return (scalar loss, metrics dict of scalars); the unroll
dimension is weighted by gamma^(S−1−s) (losses.py:42,83,106).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..ops import projective as pops

Array = jax.Array


def _step_weights(n: int, gamma: float) -> Array:
    return gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)


def _safe_norm(x: Array, axis: int = -1) -> Array:
    """L2 norm with a finite gradient at 0.

    d‖x‖/dx = x/‖x‖ is NaN at exactly 0, and masking the VALUE (v·‖x‖)
    does not mask the cotangent — one pixel whose estimated flow equals the
    GT bit-for-bit poisons the whole gradient (observed in training: loss
    finite, grad NaN). The 1e-12 floor perturbs the loss by ≤1e-6 px.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)


def _relative(poses: Array, ii: Array, jj: Array) -> Array:
    """dP = P[jj] ∘ P[ii]⁻¹ along the frame axis (axis -2)."""
    Pi = jnp.take(poses, ii, axis=-2)
    Pj = jnp.take(poses, jj, axis=-2)
    return lie.rel(Pi, Pj)


def fit_scale(dP: Array, dG: Array) -> Array:
    """Least-squares translation scale between relative-pose sets
    (losses.py:21-27). dP/dG: [B, N, 7] → [B]."""
    t1 = dP[..., :3].reshape(dP.shape[0], -1)
    t2 = dG[..., :3].reshape(dG.shape[0], -1)
    return jnp.sum(t1 * t2, axis=-1) / (jnp.sum(t2 * t2, axis=-1) + 1e-8)


def geodesic_loss(
    Ps: Array,  # [B, F, 7] ground-truth poses
    Gs_steps: Array,  # [S, B, F, 7] per-step estimates
    ii: Array,
    jj: Array,
    gamma: float = 0.9,
    do_scale: bool = True,
    edge_valid: Array = None,
) -> Tuple[Array, Dict[str, Array]]:
    """γ-weighted relative-pose geodesic distance (losses.py:30-74), with an
    optional per-sample scale fit for the monocular gauge. `edge_valid`
    masks padded edges of randomized training graphs."""
    S = Gs_steps.shape[0]
    dP = _relative(Ps, ii, jj)  # [B, N, 7]
    w = _step_weights(S, gamma)
    if edge_valid is None:
        edge_valid = jnp.ones(ii.shape, bool)
    ev = edge_valid.astype(jnp.float32)[None, :]

    def masked_mean(x):
        return jnp.sum(x * ev) / jnp.maximum(jnp.sum(jnp.broadcast_to(ev, x.shape)), 1.0)

    def one_step(Gs):
        dG = _relative(Gs, ii, jj)
        if do_scale:
            s = jax.lax.stop_gradient(fit_scale(dP, dG))
            dG = jnp.concatenate(
                [dG[..., :3] * s[:, None, None], dG[..., 3:]], axis=-1
            )
        dE = lie.mul(dG, lie.inv(dP))  # [B, N, 7] error transform
        d = lie.log(dE)  # [B, N, 6]
        tau = _safe_norm(d[..., :3])
        phi = _safe_norm(d[..., 3:])
        # metric translation error is the GROUP-element translation norm
        # (reference pose_metrics, geom/losses.py:9-18), not the log tangent
        t_grp = _safe_norm(dE[..., :3])
        return masked_mean(tau) + masked_mean(phi), (t_grp, phi)

    losses, (tgrps, phis) = jax.vmap(one_step)(Gs_steps)
    total = jnp.sum(w * losses)

    r_err = (180.0 / np.pi) * phis[-1]
    t_err = tgrps[-1]
    metrics = {
        "rot_error": masked_mean(r_err),
        "tr_error": masked_mean(t_err),
        "bad_rot": masked_mean((r_err < 0.1).astype(jnp.float32)),
        "bad_tr": masked_mean((t_err < 0.01).astype(jnp.float32)),
    }
    return total, metrics


def residual_loss(
    residuals: Array, gamma: float = 0.9, edge_valid: Array = None
) -> Tuple[Array, Dict]:
    """γ-weighted mean |BA flow residual| (losses.py:77-86).
    residuals: [S, E, h, w, 2] with E = B·N edge slots. `edge_valid` [E]
    masks padded edges of randomized graphs: their residuals are already
    zeroed upstream, but averaging over the padded slots would scale the
    loss by n_valid/n_pad — a weight that varies batch-to-batch."""
    S = residuals.shape[0]
    w = _step_weights(S, gamma)
    flat = jnp.abs(residuals.reshape(S, residuals.shape[1], -1))
    if edge_valid is None:
        per_step = jnp.mean(flat, axis=(1, 2))
    else:
        ev = edge_valid.astype(flat.dtype)
        denom = jnp.maximum(jnp.sum(ev), 1.0) * flat.shape[-1]
        per_step = jnp.sum(flat * ev[None, :, None], axis=(1, 2)) / denom
    total = jnp.sum(w * per_step)
    return total, {"residual": total}


def flow_loss(
    Ps: Array,  # [B, F, 7] GT poses
    disps: Array,  # [B, F, H, W] GT inverse depth (FULL resolution)
    poses_steps: Array,  # [S, B, F, 7]
    disps_steps: Array,  # [S, B, F, H, W] estimated, upsampled (FULL res)
    intrinsics: Array,  # [B, F, 4] FULL-resolution
    gamma: float = 0.9,
) -> Tuple[Array, Dict]:
    """End-point-error of induced flow vs GT on the adjacent-frame graph,
    at FULL image resolution like the reference (losses.py:89-118 is called
    with full-res disps/upsampled estimates/undivided intrinsics,
    train.py:112) — at 1/8 res the term would be 8x under-weighted and the
    '1px' metric would mean 8 full-res pixels."""
    S = poses_steps.shape[0]
    F = Ps.shape[1]
    ii, jj = [], []
    for a in range(F):
        for b in range(F):
            if abs(a - b) == 1:
                ii.append(a)
                jj.append(b)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)

    transform = jax.vmap(lambda p, d, k: pops.projective_transform(p, d, k, ii, jj))
    coords0, val0 = transform(Ps, disps, intrinsics)
    val0 = val0 * (jnp.take(disps, ii, axis=1) > 0).astype(val0.dtype)[..., None]

    w = _step_weights(S, gamma)

    # remat + scalar-only outputs: the full-res induced-flow coords per
    # unroll step are large ([S, B, N, H, W, 2]); recompute them in backward
    # instead of storing, and keep no per-pixel arrays across steps
    @jax.checkpoint
    def one_step(Gs, ds):
        coords1, val1 = transform(Gs, ds, intrinsics)
        v = (val0 * val1)[..., 0]
        epe = v * _safe_norm(coords1 - coords0)
        return jnp.mean(epe)

    losses = jax.vmap(one_step)(poses_steps, disps_steps)
    total = jnp.sum(w * losses)

    # metrics from the last step only (one extra forward transform, no grad)
    coords1, val1 = transform(
        jax.lax.stop_gradient(poses_steps[-1]),
        jax.lax.stop_gradient(disps_steps[-1]),
        intrinsics,
    )
    last_v = ((val0 * val1)[..., 0] > 0.5).reshape(-1)
    last_epe = _safe_norm(coords1 - coords0).reshape(-1)
    denom = jnp.maximum(jnp.sum(last_v), 1.0)
    metrics = {
        "f_error": jnp.sum(jnp.where(last_v, last_epe, 0.0)) / denom,
        "1px": jnp.sum(jnp.where(last_v & (last_epe < 1.0), 1.0, 0.0)) / denom,
    }
    return total, metrics
