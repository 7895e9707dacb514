"""SE(3) Lie-group operations on quaternion-parameterised poses.

Poses are stored as float arrays of shape ``(..., 7)`` laid out as
``[tx, ty, tz, qx, qy, qz, qw]`` (translation then xyzw unit quaternion),
matching the reference storage convention (``/root/reference/src/lie_groups.h``
and ``depth_video.py:28,45``). All functions broadcast over leading axes and
are differentiable, so the same module serves the jitted SLAM runtime and the
training-time differentiable bundle adjustment (the reference needs a separate
native header plus the external ``lietorch`` package for this split; on TPU a
single pure-jnp module covers both).

Numerical semantics follow the reference float32 behaviour, including the
Taylor-expansion switch-points (``theta_sq < 1e-8`` for the SO(3) exponential
and ``theta <= 1e-4`` for the SE(3) V-matrix terms; see
``src/lie_groups.h:57-122``) so that Gauss–Newton trajectories agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# -----------------------------------------------------------------------------
# quaternion primitives (xyzw layout, Hamilton product)
# -----------------------------------------------------------------------------


def quat_mul(q1: Array, q2: Array) -> Array:
    """Hamilton product q1 ⊗ q2 for xyzw quaternions."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: Array, x: Array) -> Array:
    """Rotate 3-vectors ``x`` by unit quaternions ``q``.

    Uses the two-cross-product form (``actSO3``, src/lie_groups.h:5-15) which
    is cheap on the VPU and exactly matches the reference arithmetic.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, x)
    return x + qw * uv + jnp.cross(qv, uv)


# -----------------------------------------------------------------------------
# SE(3) group operations on (..., 7) pose arrays
# -----------------------------------------------------------------------------


def identity(shape=(), dtype=jnp.float32) -> Array:
    """Identity pose(s) of shape ``shape + (7,)``."""
    pose = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return pose.at[..., 6].set(1.0)


def translation(pose: Array) -> Array:
    return pose[..., :3]


def quaternion(pose: Array) -> Array:
    return pose[..., 3:7]


def inv(pose: Array) -> Array:
    """Group inverse: (t, q) → (−R(q)⁻¹ t, q⁻¹)."""
    q_inv = quat_conj(quaternion(pose))
    t_inv = -quat_rotate(q_inv, translation(pose))
    return jnp.concatenate([t_inv, q_inv], axis=-1)


def mul(a: Array, b: Array) -> Array:
    """Group composition a ∘ b."""
    q = quat_mul(quaternion(a), quaternion(b))
    t = translation(a) + quat_rotate(quaternion(a), translation(b))
    return jnp.concatenate([t, q], axis=-1)


def rel(pose_i: Array, pose_j: Array) -> Array:
    """Relative pose G_ij = G_j ∘ G_i⁻¹ (``relSE3``, src/lie_groups.h:43-54)."""
    qij = quat_mul(quaternion(pose_j), quat_conj(quaternion(pose_i)))
    tij = translation(pose_j) - quat_rotate(qij, translation(pose_i))
    return jnp.concatenate([tij, qij], axis=-1)


def act(pose: Array, X: Array) -> Array:
    """Act on homogeneous points ``X = (x, y, z, h)``: Y = (R x + h t, h).

    Matches ``actSE3`` (src/lie_groups.h:17-24); with h = inverse depth this
    is the projective point action used throughout the DBA layer.
    """
    Y3 = quat_rotate(quaternion(pose), X[..., :3]) + X[..., 3:4] * translation(pose)
    return jnp.concatenate([Y3, X[..., 3:4]], axis=-1)


def act_point(pose: Array, x: Array) -> Array:
    """Act on ordinary 3-D points: y = R x + t."""
    return quat_rotate(quaternion(pose), x) + translation(pose)


def adjT(pose: Array, X: Array) -> Array:
    """Transpose-adjoint transport of a 6-vector (``adjSE3``, lie_groups.h:26-41).

    Used to turn a Jacobian w.r.t. the target pose j into the Jacobian w.r.t.
    the source pose i of a relative transform: Ji = −adjT(G_ij, Jj).
    """
    q_inv = quat_conj(quaternion(pose))
    a = quat_rotate(q_inv, X[..., :3])
    b = quat_rotate(q_inv, X[..., 3:6])
    # u = X_v × t  (the reference computes cross(t, X) with swapped sign)
    u = jnp.cross(X[..., :3], translation(pose))
    b = b + quat_rotate(q_inv, u)
    return jnp.concatenate([a, b], axis=-1)


# -----------------------------------------------------------------------------
# exponential / logarithm / retraction
# -----------------------------------------------------------------------------


def exp_so3(phi: Array) -> Array:
    """SO(3) exponential: axis-angle 3-vector → xyzw quaternion.

    Taylor branch below theta² < 1e-8 matches src/lie_groups.h:57-79.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < 1e-8
    # Guard sqrt for differentiability at 0.
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    imag_small = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_small = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    imag_big = jnp.sin(0.5 * theta) / theta
    real_big = jnp.cos(0.5 * theta)
    imag = jnp.where(small, imag_small, imag_big)
    real = jnp.where(small, real_small, real_big)
    return jnp.concatenate([imag * phi, real], axis=-1)


def exp(xi: Array) -> Array:
    """SE(3) exponential of twists ``xi = (tau, phi)`` → pose (..., 7).

    The translation part uses t = tau + a (phi×tau) + b (phi×(phi×tau)) with
    a = (1−cosθ)/θ², b = (θ−sinθ)/θ³, and — matching the reference
    (src/lie_groups.h:94-122) — falls back to t = tau exactly when θ ≤ 1e-4.
    """
    tau = xi[..., :3]
    phi = xi[..., 3:6]
    q = exp_so3(phi)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq <= (1e-4) ** 2
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)

    a = (1.0 - jnp.cos(theta)) / theta_sq_safe
    b = (theta - jnp.sin(theta)) / (theta * theta_sq_safe)

    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = tau + jnp.where(small, 0.0, a * c1 + b * c2)
    return jnp.concatenate([t, q], axis=-1)


def log_so3(q: Array) -> Array:
    """SO(3) logarithm: xyzw quaternion → axis-angle vector (principal)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # canonicalize the double cover FIRST: q and -q are the same rotation,
    # but 2*atan2(nv, qw) with qw < 0 lands in (pi, 2*pi] — the NON-principal
    # branch — inflating the angle to 2*pi - theta (and blowing up V^-1 in
    # the SE(3) log as theta -> 2*pi). lietorch/Sophus always reduce to the
    # qw >= 0 representative; datasets routinely store sign-inconsistent
    # quaternions, so this is reachable from any geodesic-loss edge.
    flip = jnp.where(qw < 0.0, -1.0, 1.0)
    qv = qv * flip
    qw = qw * flip
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = nv_sq < 1e-14
    nv = jnp.sqrt(jnp.where(small, 1.0, nv_sq))
    # angle in [0, pi]
    theta = 2.0 * jnp.arctan2(nv, qw)
    scale_big = theta / nv
    # series of 2/qw * (1 - nv²/(3 qw²)) around nv → 0
    qw_safe = jnp.where(jnp.abs(qw) < 1e-8, 1.0, qw)
    scale_small = 2.0 / qw_safe * (1.0 - nv_sq / (3.0 * qw_safe * qw_safe))
    return jnp.where(small, scale_small, scale_big) * qv


def log(pose: Array) -> Array:
    """SE(3) logarithm: pose → twist (tau, phi) with exp(log(G)) = G."""
    t = translation(pose)
    phi = log_so3(quaternion(pose))

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq <= (1e-4) ** 2
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)

    # V⁻¹ = I − ½[phi]× + c [phi]×² with c = (1 − θ cot(θ/2) / 2) / θ²
    half = 0.5 * theta
    cot_half = jnp.cos(half) / jnp.sin(half)
    c_big = (1.0 - half * cot_half) / theta_sq_safe
    c_small = 1.0 / 12.0  # series limit
    c = jnp.where(small, c_small, c_big)

    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = t - 0.5 * c1 + c * c2
    return jnp.concatenate([tau, phi], axis=-1)


def retr(pose: Array, xi: Array) -> Array:
    """Left-multiplicative retraction: G ← exp(xi) ∘ G (lie_groups.h:124-142)."""
    return mul(exp(xi), pose)


def normalize(pose: Array) -> Array:
    """Renormalise the quaternion part (guards against f32 drift)."""
    q = quaternion(pose)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([translation(pose), q], axis=-1)


def to_matrix(pose: Array) -> Array:
    """Pose → 4×4 homogeneous matrix (for evaluation/export)."""
    q = quaternion(pose)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    top = jnp.concatenate([R, translation(pose)[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


# -----------------------------------------------------------------------------
# Sim(3): similarity transforms (t[3], q[4], s[1]) as (..., 8) arrays
# -----------------------------------------------------------------------------
# The reference gets Sim3 from lietorch (geom/losses.py uses it for the
# scale-invariant geodesic loss; geom/ba.py:84 mentions Sim3 graphs). Layout
# follows lietorch: translation, xyzw quaternion, scale.


def sim3_identity(shape=(), dtype=jnp.float32) -> Array:
    return jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype), tuple(shape) + (8,)
    )


def sim3_scale(g: Array) -> Array:
    return g[..., 7:8]


def sim3_act(g: Array, x: Array) -> Array:
    """Apply s·R·x + t to 3-points."""
    return sim3_scale(g) * quat_rotate(g[..., 3:7], x) + g[..., :3]


def sim3_mul(a: Array, b: Array) -> Array:
    """(a ∘ b): scale s_a s_b, rotation q_a q_b, translation t_a + s_a R_a t_b."""
    t = a[..., :3] + sim3_scale(a) * quat_rotate(a[..., 3:7], b[..., :3])
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    s = sim3_scale(a) * sim3_scale(b)
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_inv(g: Array) -> Array:
    q_inv = quat_conj(g[..., 3:7])
    s_inv = 1.0 / sim3_scale(g)
    t_inv = -s_inv * quat_rotate(q_inv, g[..., :3])
    return jnp.concatenate([t_inv, q_inv, s_inv], axis=-1)


def sim3_exp(xi: Array) -> Array:
    """Sim(3) exponential of twists (tau, phi, sigma) → (..., 8).

    Translation t = W·tau with W = C·I + A·[phi]× + B·[phi]×² and the
    standard Sim(3) coefficients (Strasdat; same branch structure as Sophus's
    calcW): with s = e^sigma, theta = |phi|,

        C = (s − 1)/sigma                                  (σ→0: 1)
        A = (a·σ + (1 − b)·θ) / (θ·(θ² + σ²))              a = s·sinθ, b = s·cosθ
        B = (C − ((b − 1)σ + a·θ)/(θ² + σ²)) / θ²

    with the analytic θ→0 and σ→0 limits substituted where the general
    expressions are indeterminate. Verified against the 4×4 matrix
    exponential oracle in tests/test_lie.py.
    """
    tau = xi[..., :3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6:7]
    q = exp_so3(phi)
    s = jnp.exp(sigma)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small_t = theta_sq < 1e-10
    theta_sq_safe = jnp.where(small_t, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    small_s = jnp.abs(sigma) < 1e-5
    sigma_safe = jnp.where(small_s, 1.0, sigma)

    C = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sigma_safe)

    # sigma small: SE(3) coefficients
    A_s0 = jnp.where(small_t, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe)
    B_s0 = jnp.where(
        small_t, 1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (theta * theta_sq_safe),
    )
    # sigma not small, theta small
    A_t0 = ((sigma_safe - 1.0) * s + 1.0) / (sigma_safe * sigma_safe)
    B_t0 = (C - s * (1.0 - sigma_safe / 2.0)) / (sigma_safe * sigma_safe)
    # general case
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta_sq_safe + sigma * sigma
    A_g = (a * sigma + (1.0 - b) * theta) / (theta * c)
    B_g = (C - ((b - 1.0) * sigma + a * theta) / c) / theta_sq_safe

    A = jnp.where(small_s, A_s0, jnp.where(small_t, A_t0, A_g))
    B = jnp.where(small_s, B_s0, jnp.where(small_t, B_t0, B_g))

    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = C * tau + A * c1 + B * c2
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_retr(g: Array, xi: Array) -> Array:
    """Left-multiplicative Sim(3) retraction: g ← exp(xi) ∘ g."""
    return sim3_mul(sim3_exp(xi), g)
