"""Dense bundle adjustment (DBA): Gauss–Newton with depth-block Schur complement.

TPU-native replacement for BOTH reference BA implementations:
  * the native SLAM-time solver ``droid_backends.ba``
    (/root/reference/src/droid.cpp:680-798) with its hand-written CUDA kernel
    suite (``projective_transform_kernel``, ``EEt6x6``, ``Ev6x1``, ``EvT6x1``,
    ``accum/accum2``, ``pose_retr``, ``disp_retr``) and host-side Eigen sparse
    Cholesky, and
  * the training-time differentiable BA (/root/reference/droid_slam/geom/ba.py
    + chol.py).

Design (TPU-first, not a translation):
  * Per-edge residual/Jacobian/Hessian blocks are one fused einsum pipeline
    (`build_edge_blocks`) — the reference needed a 250-line per-pixel CUDA
    kernel; on TPU the contraction over pixels is an MXU matmul and XLA fuses
    the elementwise Jacobian arithmetic into it.
  * The reference's host-side sparse-matrix assembly (Eigen triplets,
    droid.cpp:474-585) becomes `segment_sum` scatters into a dense
    [P,P,6,6] pose Hessian — P (the optimization window) is at most a few
    hundred, so the dense system is tiny by MXU standards and the whole GN
    iteration stays on device (the reference ping-pongs device↔host every
    iteration).
  * The Schur complement S = E Q Eᵀ uses the same block-sparsity as the
    reference (blocks (pose p, keyframe k); droid.cpp:587-675) driven by a
    host-precomputed padded pair list (`SchurPairs`) that only changes when
    the graph topology changes — the product itself is a chunked batched
    6×HW×6 matmul.
  * The damped solve is float32 Cholesky + one iterative-refinement step in
    place of the reference's float64 Eigen SimplicialLLT (TPUs have no f64;
    refinement restores the accuracy GN needs).

Index conventions match the reference: poses [t0, t1) are optimized, poses
below t0 are held fixed, but inverse depths of *any* frame touched by an edge
are updated (droid.cpp:715-727).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lie
from . import projective as pops

Array = jax.Array


# -----------------------------------------------------------------------------
# damped Cholesky with safe failure + custom VJP (replaces geom/chol.py)
# -----------------------------------------------------------------------------


@jax.custom_vjp
def cholesky_solve(H: Array, b: Array) -> Array:
    """Solve H x = b (SPD H). Returns zeros if the factorization fails,
    mirroring the reference's keep-training-on-failure behaviour
    (geom/chol.py:5-19, droid.cpp:568-578)."""
    L = jnp.linalg.cholesky(H)
    x = jax.scipy.linalg.cho_solve((L, True), b)
    ok = jnp.all(jnp.isfinite(x), axis=(-2, -1), keepdims=True)
    return jnp.where(ok, x, jnp.zeros_like(x))


def _cholesky_solve_fwd(H, b):
    L = jnp.linalg.cholesky(H)
    x = jax.scipy.linalg.cho_solve((L, True), b)
    ok = jnp.all(jnp.isfinite(x), axis=(-2, -1), keepdims=True)
    x = jnp.where(ok, x, jnp.zeros_like(x))
    return x, (L, x, ok)


def _cholesky_solve_bwd(res, g):
    # analytic backward of the solve: db = H⁻¹ g, dH = −x dbᵀ (chol.py:21-30)
    L, x, ok = res
    db = jax.scipy.linalg.cho_solve((L, True), g)
    db = jnp.where(ok, db, jnp.zeros_like(db))
    dH = -jnp.matmul(x, jnp.swapaxes(db, -1, -2))
    return dH, db


cholesky_solve.defvjp(_cholesky_solve_fwd, _cholesky_solve_bwd)


# -----------------------------------------------------------------------------
# per-edge linearisation (replaces projective_transform_kernel)
# -----------------------------------------------------------------------------


class EdgeBlocks(NamedTuple):
    """Per-edge Gauss–Newton blocks. N edges, HW pixels at 1/8 resolution."""

    Hii: Array  # [N, 6, 6]
    Hij: Array  # [N, 6, 6]
    Hji: Array  # [N, 6, 6]
    Hjj: Array  # [N, 6, 6]
    vi: Array  # [N, 6]
    vj: Array  # [N, 6]
    Ei: Array  # [N, 6, HW]  pose-i / depth-ii coupling
    Ej: Array  # [N, 6, HW]  pose-j / depth-ii coupling
    Ck: Array  # [N, HW]     depth-block diagonal
    wk: Array  # [N, HW]     depth rhs


def build_edge_blocks(
    target: Array,
    weight: Array,
    poses: Array,
    disps: Array,
    intrinsics: Array,
    ii: Array,
    jj: Array,
    edge_valid: Optional[Array] = None,
    min_depth: float = pops.MIN_DEPTH_NATIVE,
) -> EdgeBlocks:
    """Linearise the reprojection factors of each edge.

    target/weight: [N, H, W, 2]; poses [F,7]; disps [F,H,W]; intrinsics [F,4].
    Matches src/droid_kernels_cpu.cc:67-300 semantics: weights are scaled by
    1e-3, zeroed where the transformed depth is below `min_depth`, and — for
    stereo self-edges (ii == jj) — zeroed in every pose block while still
    contributing to the depth system (Ck/wk).

    TPU layout note: everything is computed on [N, hw] PLANES (pixels on the
    lane axis) with the small twist/pixel-channel indices unrolled in Python.
    A channels-last [N, hw, 2, 6] Jacobian tensor — the direct transcription
    of the reference's per-pixel structs — puts 6 on the 128-wide lane axis
    (21× padding waste) and drives XLA into million-batch 2×4·4×6 matmuls;
    measured 9 ms for 144 edges vs <1 ms for this formulation. The Hessian
    contractions become clean [6, hw] @ [hw, 6] batched MXU matmuls.
    """
    N = ii.shape[0]
    ht, wd = disps.shape[-2:]
    hw = ht * wd
    dtype = poses.dtype

    # ---- per-edge relative pose, rotation matrix, adjoint-transpose ----
    Gij = pops.relative_poses(poses, ii, jj)  # [N, 7]
    t = lie.translation(Gij)  # [N, 3]
    R = lie.to_matrix(Gij)[..., :3, :3]  # [N, 3, 3]

    def col(v, k):  # [N, 1] broadcastable plane scalar
        return v[:, k, None]

    tx, ty, tz = col(t, 0), col(t, 1), col(t, 2)

    # ---- source back-projection planes (Z0 ≡ 1) ----
    grid = pops.coords_grid(ht, wd, dtype=dtype).reshape(hw, 2)
    gx, gy = grid[:, 0][None], grid[:, 1][None]  # [1, hw]
    intr_i = jnp.take(intrinsics, ii, axis=0)
    intr_j = jnp.take(intrinsics, jj, axis=0)
    X0 = (gx - col(intr_i, 2)) / col(intr_i, 0)
    Y0 = (gy - col(intr_i, 3)) / col(intr_i, 1)
    d0 = jnp.take(disps, ii, axis=0).reshape(N, hw)

    # ---- SE(3) action: X1 = R·(X0, Y0, 1) + t·d0 ----
    def rot(k):
        return R[:, k, 0, None] * X0 + R[:, k, 1, None] * Y0 + R[:, k, 2, None]

    X1 = rot(0) + tx * d0
    Y1 = rot(1) + ty * d0
    Z1 = rot(2) + tz * d0

    # ---- projection + residual/weight planes ----
    fx, fy, cx, cy = (col(intr_j, k) for k in range(4))
    zi = 1.0 / jnp.where(Z1 < 0.5 * min_depth, jnp.ones_like(Z1), Z1)
    x1 = fx * X1 * zi + cx
    y1 = fy * Y1 * zi + cy
    valid = (Z1 > min_depth).astype(dtype)

    tflat = target.reshape(N, hw, 2)
    wflat = weight.reshape(N, hw, 2)
    ru = tflat[..., 0] - x1
    rv = tflat[..., 1] - y1
    wu = 0.001 * valid * wflat[..., 0]
    wv = 0.001 * valid * wflat[..., 1]
    if edge_valid is not None:
        ev = edge_valid.astype(dtype)[:, None]
        wu = wu * ev
        wv = wv * ev

    # ---- analytic Jacobian planes ----
    # Jp rows: (au, 0, bu) and (0, av, bv); Ja columns per twist component a:
    # (d,0,0) (0,d,0) (0,0,d) (0,−Z,Y) (Z,0,−X) (−Y,X,0)  [all of X1]
    au = fx * zi
    bu = -fx * X1 * zi * zi
    av = fy * zi
    bv = -fy * Y1 * zi * zi
    zero = jnp.zeros_like(d0)
    Jj_u = [au * d0, zero, bu * d0, bu * Y1, au * Z1 - bu * X1, -au * Y1]
    Jj_v = [zero, av * d0, bv * d0, -av * Z1 + bv * Y1, -bv * X1, av * X1]
    Jju = jnp.stack(Jj_u, axis=1)  # [N, 6, hw]
    Jjv = jnp.stack(Jj_v, axis=1)

    # depth Jacobian: Jz = Jp · (t, 1)
    Jzu = au * tx + bu * tz  # [N, hw]
    Jzv = av * ty + bv * tz

    # Ji = −A · Jj with A = adjTᵀ… the matrix form of lie.adjT:
    #   A = [[Rᵀ, 0], [−Rᵀ[t]×, Rᵀ]]  (out_v = RᵀXv, out_w = RᵀXw − Rᵀ(t×Xv))
    Rt = jnp.swapaxes(R, -1, -2)
    o3 = jnp.zeros_like(R)
    tx_, ty_, tz_ = t[:, 0], t[:, 1], t[:, 2]
    zz = jnp.zeros_like(tx_)
    t_cross = jnp.stack(
        [
            jnp.stack([zz, -tz_, ty_], -1),
            jnp.stack([tz_, zz, -tx_], -1),
            jnp.stack([-ty_, tx_, zz], -1),
        ],
        axis=-2,
    )  # [N, 3, 3] = [t]×
    A = jnp.concatenate(
        [
            jnp.concatenate([Rt, o3], axis=-1),
            jnp.concatenate([-jnp.matmul(Rt, t_cross), Rt], axis=-1),
        ],
        axis=-2,
    )  # [N, 6, 6]
    Jiu = -jnp.einsum("nab,nbx->nax", A, Jju)
    Jiv = -jnp.einsum("nab,nbx->nax", A, Jjv)

    # pose blocks use weights zeroed on self-edges (stereo baseline is fixed);
    # the depth system keeps them (droid_kernels_cpu.cc:160-166,197-203)
    nself = (ii != jj).astype(dtype)[:, None]
    wpu = (wu * nself)[:, None, :]  # [N, 1, hw]
    wpv = (wv * nself)[:, None, :]
    wJiu = wpu * Jiu
    wJiv = wpv * Jiv
    wJju = wpu * Jju
    wJjv = wpv * Jjv

    def gram(wa_u, wa_v, b_u, b_v):
        return jnp.einsum("nax,nbx->nab", wa_u, b_u) + jnp.einsum(
            "nax,nbx->nab", wa_v, b_v
        )

    Hii = gram(wJiu, wJiv, Jiu, Jiv)
    Hij = gram(wJiu, wJiv, Jju, Jjv)
    Hji = gram(wJju, wJjv, Jiu, Jiv)
    Hjj = gram(wJju, wJjv, Jju, Jjv)

    vi = jnp.einsum("nax,nx->na", wJiu, ru) + jnp.einsum("nax,nx->na", wJiv, rv)
    vj = jnp.einsum("nax,nx->na", wJju, ru) + jnp.einsum("nax,nx->na", wJjv, rv)

    Ei = wJiu * Jzu[:, None, :] + wJiv * Jzv[:, None, :]  # [N, 6, hw]
    Ej = wJju * Jzu[:, None, :] + wJjv * Jzv[:, None, :]

    Ck = wu * Jzu * Jzu + wv * Jzv * Jzv  # [N, hw]
    wk = wu * ru * Jzu + wv * rv * Jzv

    return EdgeBlocks(Hii, Hij, Hji, Hjj, vi, vj, Ei, Ej, Ck, wk)


# -----------------------------------------------------------------------------
# training-path BA (differentiable; replaces geom/ba.py BA / MoBA)
# -----------------------------------------------------------------------------


def _onehot_scatter(blocks: Array, idx: Array, ok: Array, n_seg: int) -> Array:
    """Scatter-add [N, ...] blocks into [n_seg, ...] as a one-hot matmul.

    XLA lowers segment_sum/scatter on TPU to a sequential chain of
    dynamic-update-slices (one per edge — measured milliseconds per BA
    iteration at demo scale); the [n_seg, N] one-hot contraction is one MXU
    matmul. For float32 inputs this is exact: one-hot entries are 0/1 and
    the contraction runs at HIGHEST precision, so sums match scatter
    ordering-independently. For bfloat16 inputs (the dense-window path's
    schur_dtype) the accumulation rounds to bf16 — the documented ~0.4%
    speed/accuracy tradeoff, NOT lossless.
    """
    N = blocks.shape[0]
    oh = (
        (idx[None, :] == jnp.arange(n_seg, dtype=idx.dtype)[:, None]) & ok[None, :]
    ).astype(blocks.dtype)
    flat = jnp.einsum(
        "sn,nd->sd",
        oh,
        blocks.reshape(N, -1),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=blocks.dtype,
    )
    return flat.reshape((n_seg,) + blocks.shape[1:])


def _scatter_mat(blocks: Array, ii: Array, jj: Array, n: int, m: int) -> Array:
    """Scatter-add [N, ...] blocks into a dense [n, m, ...] grid, dropping
    out-of-range rows (geom/ba.py:12-14)."""
    ok = (ii >= 0) & (jj >= 0) & (ii < n) & (jj < m)
    idx = jnp.where(ok, ii * m + jj, 0)
    flat = _onehot_scatter(blocks, idx, ok, n * m)
    return flat.reshape((n, m) + blocks.shape[1:])


def _scatter_vec(blocks: Array, ii: Array, n: int) -> Array:
    ok = (ii >= 0) & (ii < n)
    idx = jnp.where(ok, ii, 0)
    return _onehot_scatter(blocks, idx, ok, n)


def schur_solve(
    H: Array, E: Array, C: Array, v: Array, w: Array, ep: float = 0.1, lm: float = 1e-4
) -> Tuple[Array, Array]:
    """Dense Schur-complement solve (geom/chol.py:46-73).

    H: [P, P, 6, 6]; E: [P, M, 6, HW]; C, w: [M, HW]; v: [P, 6].
    Returns (dx [P, 6], dz [M, HW]).
    """
    P = H.shape[0]
    M, HW = C.shape
    Hm = H.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    Em = E.transpose(0, 2, 1, 3).reshape(P * 6, M * HW)
    Q = (1.0 / C).reshape(M * HW)

    eye = jnp.eye(P * 6, dtype=Hm.dtype)
    Hm = Hm + (ep + lm * Hm) * eye

    vm = v.reshape(P * 6, 1)
    wm = w.reshape(M * HW, 1)

    S = Hm - jnp.matmul(Em, Q[:, None] * Em.T)
    rhs = vm - jnp.matmul(Em, Q[:, None] * wm)

    dx = cholesky_solve(S, rhs)
    dz = Q[:, None] * (wm - jnp.matmul(Em.T, dx))
    return dx.reshape(P, 6), dz.reshape(M, HW)


def bundle_adjust(
    target: Array,
    weight: Array,
    eta: Array,
    poses: Array,
    disps: Array,
    intrinsics: Array,
    ii: Array,
    jj: Array,
    fixedp: int = 1,
    ep: float = 0.1,
    lm: float = 1e-4,
    motion_only: bool = False,
    min_depth: float = pops.MIN_DEPTH,
) -> Tuple[Array, Array]:
    """One differentiable DBA step over frames [fixedp, F) (geom/ba.py:31-106).

    target/weight: [N, H, W, 2]; eta: [F, H, W] (damping for every frame —
    frames without edges are untouched because their Schur rows are zero);
    poses [F, 7]; disps [F, H, W]; intrinsics [F, 4].

    Unlike the reference we use all F frames as depth columns instead of
    `unique(ii)` — identical math (columns of frames without edges are zero)
    but a static shape, which is what jit wants. Batched use: jax.vmap.
    """
    F = poses.shape[0]
    ht, wd = disps.shape[-2:]
    hw = ht * wd
    blocks = build_edge_blocks(
        target, weight, poses, disps, intrinsics, ii, jj, min_depth=min_depth
    )

    P = F - fixedp
    ii_r = ii - fixedp
    jj_r = jj - fixedp

    H = (
        _scatter_mat(blocks.Hii, ii_r, ii_r, P, P)
        + _scatter_mat(blocks.Hij, ii_r, jj_r, P, P)
        + _scatter_mat(blocks.Hji, jj_r, ii_r, P, P)
        + _scatter_mat(blocks.Hjj, jj_r, jj_r, P, P)
    )
    v = _scatter_vec(blocks.vi, ii_r, P) + _scatter_vec(blocks.vj, jj_r, P)

    if motion_only:
        Hm = H.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
        eye = jnp.eye(P * 6, dtype=Hm.dtype)
        Hm = Hm + (ep + lm * Hm) * eye
        dx = cholesky_solve(Hm, v.reshape(P * 6, 1)).reshape(P, 6)
        dposes = jnp.zeros((F, 6), poses.dtype).at[fixedp:].set(dx)
        return lie.retr(poses, dposes), disps

    # depth columns over all frames
    E = _scatter_mat(blocks.Ei, ii_r, ii, P, F) + _scatter_mat(blocks.Ej, jj_r, ii, P, F)
    C = _scatter_vec(blocks.Ck, ii, F)
    w = _scatter_vec(blocks.wk, ii, F)
    C = C + eta.reshape(F, hw) + 1e-7

    dx, dz = schur_solve(H, E, C, v, w, ep=ep, lm=lm)

    dposes = jnp.zeros((F, 6), poses.dtype).at[fixedp:].set(dx)
    poses = lie.retr(poses, dposes)
    disps = disps + dz.reshape(F, ht, wd)
    disps = jnp.where(disps > 10.0, jnp.zeros_like(disps), disps)
    disps = jnp.clip(disps, 0.0, None)
    return poses, disps


# -----------------------------------------------------------------------------
# SLAM-runtime BA (native droid_backends.ba equivalent, block-sparse Schur)
# -----------------------------------------------------------------------------


def pair_schedule(blk_k: np.ndarray, blk_ok: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """All ordered block pairs (a, b) with blk_k[a] == blk_k[b], both valid.

    Vectorised (the reference enumerates this on the host with nested loops
    per GN iteration, droid.cpp:613-645; a Python double loop is O(Σ n_k²)
    interpreter steps and stalls at backend scale — ~150k pairs at t=500).
    Pair order: groups by ascending keyframe, a-major within a group, block
    ids ascending — identical to the nested-loop enumeration.
    """
    ids = np.nonzero(blk_ok)[0]
    if ids.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    order = np.argsort(blk_k[ids], kind="stable")
    sid = ids[order]  # block ids sorted by keyframe, ascending within groups
    _, starts, counts = np.unique(blk_k[ids][order], return_index=True, return_counts=True)

    # a: each block of a size-n group repeated n times (a-major order)
    a_idx = np.repeat(sid, np.repeat(counts, counts))
    # b: the group tiled n times, aligned with the flattened pair order
    seg_len = counts * counts
    total = int(seg_len.sum())
    seg_off = np.repeat(np.cumsum(seg_len) - seg_len, seg_len)
    within = np.arange(total) - seg_off
    b_idx = sid[np.repeat(starts, seg_len) + within % np.repeat(counts, seg_len)]
    return a_idx, b_idx


class SchurPairs(NamedTuple):
    """Host-precomputed block-pair schedule for the block-sparse Schur product.

    Blocks are the rows of E = concat(Ei_window [P], Ej_edges [N]): block b has
    a source keyframe k(b) (whose inverse depths it couples) and a pose p(b).
    S[p(a), p(b)] += E_a · diag(Q_{k}) · E_bᵀ for every ordered pair (a, b)
    with k(a) == k(b) and both poses inside the optimization window — exactly
    the pair set the reference enumerates on the host per iteration
    (droid.cpp:613-645); here it is computed once per graph edit and padded to
    a static shape.
    """

    pair_a: Array  # [NP] int32 block index
    pair_b: Array  # [NP] int32 block index
    pair_valid: Array  # [NP] bool

    @staticmethod
    def build(
        ii: np.ndarray,
        jj: np.ndarray,
        edge_valid: np.ndarray,
        t0: int,
        t1: int,
        window: int,
        pad_to: Optional[int] = None,
        pad_floor: int = 16,
    ) -> "SchurPairs":
        """ii/jj: [N] host edge lists. Window rows occupy block ids [0, window);
        edge e is block window + e. Only blocks with pose in [t0, t1) pair up.
        The list is padded to a power of two ≥ pad_floor so that repeated
        graph edits reuse compiled programs."""
        N = len(ii)
        P = t1 - t0
        # guard the window-span assumption here, where every pair-path caller
        # funnels through: a window smaller than the span silently drops
        # H/v/E blocks in _scatter_mat's range masks and freezes the poses
        # past t0+window while their depths keep updating
        assert P <= window, f"BA window span {P} > static window pad {window}"
        # block lists: source keyframe and pose per block
        blk_k = np.concatenate([np.arange(t0, t0 + window), ii])
        blk_p = np.concatenate([np.arange(t0, t0 + window), jj])
        blk_ok = np.concatenate(
            [np.arange(window) < P, edge_valid.astype(bool)]
        ) & (blk_p >= t0) & (blk_p < t1)

        pa, pb = pair_schedule(blk_k, blk_ok)

        np_total = len(pa)
        if pad_to is None:
            pad_to = max(
                int(2 ** np.ceil(np.log2(max(np_total, pad_floor)))), pad_floor
            )
        assert np_total <= pad_to, f"pair list {np_total} exceeds pad {pad_to}"
        pair_a = np.zeros(pad_to, np.int32)
        pair_b = np.zeros(pad_to, np.int32)
        pair_valid = np.zeros(pad_to, bool)
        pair_a[:np_total] = pa
        pair_b[:np_total] = pb
        pair_valid[:np_total] = True
        return SchurPairs(
            jnp.asarray(pair_a), jnp.asarray(pair_b), jnp.asarray(pair_valid)
        )


def _pair_products(
    E_blocks: Array, Qk: Array, pairs: SchurPairs, chunk: int = 2048
) -> Array:
    """S_pair[n] = E[a_n] · diag(Q[k(a_n)]) · E[b_n]ᵀ, chunked to bound memory.

    E_blocks: [NB, 6, HW]; Qk: [NB, HW] (Q already gathered per block).
    Returns [NP, 6, 6].
    """
    NP = pairs.pair_a.shape[0]
    if NP <= chunk:
        Ea = E_blocks[pairs.pair_a] * Qk[pairs.pair_a][:, None, :]
        Eb = E_blocks[pairs.pair_b]
        S = jnp.einsum(
            "nak,nbk->nab", Ea, Eb, preferred_element_type=jnp.float32
        )
        return S * pairs.pair_valid[:, None, None].astype(S.dtype)

    n_chunks = -(-NP // chunk)
    pad = n_chunks * chunk - NP
    pa = jnp.pad(pairs.pair_a, (0, pad)).reshape(n_chunks, chunk)
    pb = jnp.pad(pairs.pair_b, (0, pad)).reshape(n_chunks, chunk)
    pv = jnp.pad(pairs.pair_valid, (0, pad)).reshape(n_chunks, chunk)

    def body(args):
        a, b, ok = args
        Ea = E_blocks[a] * Qk[a][:, None, :]
        Eb = E_blocks[b]
        S = jnp.einsum(
            "nak,nbk->nab", Ea, Eb, preferred_element_type=jnp.float32
        )
        return S * ok[:, None, None].astype(S.dtype)

    S = jax.lax.map(body, (pa, pb, pv))
    return S.reshape(n_chunks * chunk, 6, 6)[:NP]


class BAProblem(NamedTuple):
    """Static-shape inputs of the jitted SLAM-time BA (device arrays)."""

    target: Array  # [N, H, W, 2]
    weight: Array  # [N, H, W, 2]
    eta: Array  # [F, H, W] per-frame damping (frames outside kx ignored)
    ii: Array  # [N] int32 (padded entries arbitrary valid frame ids)
    jj: Array  # [N]
    edge_valid: Array  # [N] bool
    t0: Array  # scalar int32 — first optimized pose
    t1: Array  # scalar int32 — one past last optimized pose
    pairs: SchurPairs



def _assemble_pose_system(blocks, ii_r, jj_r, P: int, t0, t1, dtype):
    """Scatter the per-edge 6x6 blocks into the dense windowed pose system.

    Shared by ba_iteration (block-sparse Schur) and ba_iteration_dense_window.
    Rows past the live window [0, t1-t0) get identity so the damped solve
    returns zeros there. Returns (Hm [P6,P6], v [P,6], live [P], live6 [P6]).
    """
    H = (
        _scatter_mat(blocks.Hii, ii_r, ii_r, P, P)
        + _scatter_mat(blocks.Hij, ii_r, jj_r, P, P)
        + _scatter_mat(blocks.Hji, jj_r, ii_r, P, P)
        + _scatter_mat(blocks.Hjj, jj_r, jj_r, P, P)
    )
    v = _scatter_vec(blocks.vi, ii_r, P) + _scatter_vec(blocks.vj, jj_r, P)
    live = (jnp.arange(P) < (t1 - t0)).astype(dtype)
    live6 = jnp.repeat(live, 6)
    Hm = H.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    Hm = Hm * live6[:, None] * live6[None, :] + jnp.diag(1.0 - live6)
    return Hm, v * live[:, None], live, live6


def _damped_pose_solve(Hm, rhs, live, live6, P: int, lm, ep):
    """((1+lm)·diag + ep)-damped Cholesky solve of the live pose system
    (droid.cpp:559-579's damping), masked to live rows. rhs: [P*6]."""
    eye = jnp.eye(P * 6, dtype=Hm.dtype)
    Hd = Hm + (ep + lm * Hm) * eye * live6[:, None]
    return cholesky_solve(Hd, rhs.reshape(P * 6, 1)).reshape(P, 6) * live[:, None]


def _retract_window(poses, dx, t0, P: int):
    """Apply the window update dx [P, 6] to poses [F, 7] at offset t0."""
    F = poses.shape[0]
    dposes = jnp.zeros((F + P, 6), poses.dtype)
    dposes = jax.lax.dynamic_update_slice(dposes, dx, (t0, 0))[:F]
    return lie.retr(poses, dposes)


def ba_iteration(
    poses: Array,
    disps: Array,
    intrinsics: Array,
    disps_sens: Array,
    prob: BAProblem,
    window: int,
    lm: float = 1e-4,
    ep: float = 0.1,
    alpha: float = 0.05,
    motion_only: bool = False,
    schur_dtype: str = "float32",
) -> Tuple[Array, Array]:
    """One Gauss–Newton iteration of the SLAM-time BA (droid.cpp:743-795).

    poses [F,7], disps/disps_sens [F,H,W], intrinsics [4] (shared across
    frames, like droid.cpp's `intrinsics[0]`). `window` is the static padded
    size of the optimization window; the true window is [t0, t1).

    ``schur_dtype``: storage dtype of the E blocks consumed by the Schur
    pair products and back-substitution (same contract as
    `ba_iteration_dense_window`: the contractions still accumulate in
    float32). At backend scale the pair products gather ~2 copies of the
    [P+N, 6, HW] E tensor per GN iteration — bfloat16 halves that HBM
    traffic at the documented ~0.4% Schur perturbation.
    """
    F = poses.shape[0]
    ht, wd = disps.shape[-2:]
    hw = ht * wd
    t0, t1 = prob.t0, prob.t1
    P = window

    intr_all = jnp.broadcast_to(intrinsics, (F, 4))
    blocks = build_edge_blocks(
        prob.target,
        prob.weight,
        poses,
        disps,
        intr_all,
        prob.ii,
        prob.jj,
        edge_valid=prob.edge_valid,
        min_depth=pops.MIN_DEPTH_NATIVE,
    )

    # ---- pose Hessian over the window (relative indices, padded to P) ----
    ii_r = prob.ii - t0
    jj_r = prob.jj - t0
    Hm, v, live, live6 = _assemble_pose_system(
        blocks, ii_r, jj_r, P, t0, t1, poses.dtype
    )

    if motion_only:
        dx = _damped_pose_solve(Hm, v, live, live6, P, lm, ep)
        return _retract_window(poses, dx, t0, P), disps

    # ---- depth system over all frames (full-frame static shape) ----
    in_window = (jnp.arange(F) >= t0) & (jnp.arange(F) < t1)
    # "any edge touches this frame" as a compare-reduce, not a scatter
    # (scatters lower to sequential dynamic-update-slices on TPU)
    touched = jnp.any(
        (prob.ii[None, :] == jnp.arange(F)[:, None]) & prob.edge_valid[None, :],
        axis=1,
    )
    in_kx = in_window | touched  # frames whose depths are updated (kx)

    C_edges = _scatter_vec(blocks.Ck, prob.ii, F)
    w_edges = _scatter_vec(blocks.wk, prob.ii, F)

    m = (disps_sens.reshape(F, hw) > 0).astype(poses.dtype)
    C = C_edges + m * alpha + (1.0 - m) * prob.eta.reshape(F, hw)
    w = w_edges - m * alpha * (disps - disps_sens).reshape(F, hw)
    kx_mask = in_kx.astype(poses.dtype)[:, None]
    Q = kx_mask / jnp.where(C == 0.0, 1.0, C)

    # ---- block-sparse Schur complement ----
    # E block rows: the window's accumulated Ei rows, then per-edge Ej rows.
    sd = jnp.dtype(schur_dtype)
    Ei_acc = _scatter_vec(blocks.Ei, prob.ii, F)  # [F, 6, HW]
    # zero-pad so a window that sticks out past the buffer slices zeros
    Ei_pad = jnp.pad(Ei_acc, ((0, P), (0, 0), (0, 0)))
    Ei_win = jax.lax.dynamic_slice(Ei_pad, (t0, 0, 0), (P, 6, hw))
    E_blocks = jnp.concatenate(
        [Ei_win, blocks.Ej], axis=0
    ).astype(sd)  # [P+N, 6, HW]

    blk_k = jnp.concatenate([t0 + jnp.arange(P), prob.ii])
    blk_p = jnp.concatenate([t0 + jnp.arange(P), prob.jj])
    blk_ok = (
        jnp.concatenate([jnp.arange(P) < (t1 - t0), prob.edge_valid])
        & (blk_p >= t0)
        & (blk_p < t1)
    )
    Qk = (Q[blk_k] * blk_ok[:, None].astype(Q.dtype)).astype(sd)  # [P+N, HW]

    S_pairs = _pair_products(E_blocks, Qk, prob.pairs)  # f32 accumulation
    pa_p = blk_p[prob.pairs.pair_a] - t0
    pb_p = blk_p[prob.pairs.pair_b] - t0
    S = _scatter_mat(S_pairs, pa_p, pb_p, P, P)

    # v −= E Q w per block, scattered to the block's pose row
    Qw = Q * w  # [F, HW]
    v_blocks = jnp.einsum(
        "nak,nk->na",
        E_blocks,
        (Qw[blk_k] * blk_ok[:, None]).astype(sd),
        preferred_element_type=jnp.float32,
    )
    v = v - _scatter_vec(v_blocks, blk_p - t0, P)

    Sm = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    A = Hm - Sm * live6[:, None] * live6[None, :]
    eye = jnp.eye(P * 6, dtype=A.dtype)
    Ad = A + (ep + lm * A) * eye * live6[:, None]
    dx = cholesky_solve(Ad, v.reshape(P * 6, 1))
    r = v.reshape(P * 6, 1) - jnp.matmul(Ad, dx)
    dx = dx + cholesky_solve(Ad, r)  # f32 refinement (reference solves in f64)
    dx = dx.reshape(P, 6) * live[:, None]

    # ---- back-substitute depths: dz = Q (w − Eᵀ dx) ----
    dx_pose = dx[jnp.clip(blk_p - t0, 0, P - 1)] * blk_ok[:, None].astype(dx.dtype)
    w_corr = jnp.einsum(
        "nak,na->nk",
        E_blocks,
        dx_pose.astype(sd),
        preferred_element_type=jnp.float32,
    )  # [P+N, HW]
    w_corr_k = _scatter_vec(w_corr, blk_k, F)
    dz = Q * (w - w_corr_k)

    # ---- retractions ----
    dposes = jnp.zeros((F + P, 6), poses.dtype)
    dposes = jax.lax.dynamic_update_slice(dposes, dx, (t0, 0))[:F]
    poses = lie.retr(poses, dposes)
    disps = disps + dz.reshape(F, ht, wd)
    return poses, disps


def ba_iteration_dense_window(
    poses: Array,
    disps: Array,
    intrinsics: Array,  # [4]
    disps_sens: Array,
    target: Array,  # [N, H, W, 2]
    weight: Array,
    eta: Array,  # [F, H, W]
    ii: Array,  # [N]
    jj: Array,
    edge_valid: Array,  # [N] bool
    t0: Array,  # scalar — first optimized pose
    t1: Array,  # scalar — one past last optimized pose
    kf0: Array,  # scalar — first depth frame of the window
    window: int,  # static pose-window pad (Pw)
    kwin: int,  # static depth-window pad (Ka ≥ window + margin)
    lm: float = 1e-4,
    ep: float = 0.1,
    alpha: float = 0.05,
    motion_only: bool = False,
    schur_dtype: str = "float32",
) -> Tuple[Array, Array]:
    """One GN iteration with a DENSE windowed Schur complement.

    ``schur_dtype``: storage dtype of the dense windowed E tensor for the
    Schur products (its two einsums still accumulate in float32). bfloat16
    halves the dominant HBM traffic of the GN iteration (E is ~37 MB at
    demo scale) at ~0.4% perturbation of the Schur complement — well inside
    what the damped GN absorbs; float32 (default) keeps the solver exact for
    tests and the training path.

    Device-only alternative to `ba_iteration`: instead of a host-enumerated
    block-pair schedule (SchurPairs), the pose–depth coupling is scattered
    into a dense E [kwin, window·6, HW] tensor and S = Σ_k E_k Q_k E_kᵀ is one
    batched MXU matmul — no host involvement at all, which is what the fused
    zero-sync tracking step needs. Feasible because the frontend's sliding
    window is small (kwin ≈ 40, window·6 ≈ 200, so E ≈ 37 MB and S costs a
    few GFLOP); the global backend keeps the block-sparse pair path.

    Every valid edge must satisfy kf0 ≤ ii < kf0 + kwin.
    """
    F = poses.shape[0]
    ht, wd = disps.shape[-2:]
    hw = ht * wd
    Pw = window

    intr_all = jnp.broadcast_to(intrinsics, (F, 4))
    blocks = build_edge_blocks(
        target, weight, poses, disps, intr_all, ii, jj,
        edge_valid=edge_valid, min_depth=pops.MIN_DEPTH_NATIVE,
    )

    ii_r = ii - t0
    jj_r = jj - t0
    Hm, v, live, live6 = _assemble_pose_system(
        blocks, ii_r, jj_r, Pw, t0, t1, poses.dtype
    )

    if motion_only:
        dx = _damped_pose_solve(Hm, v, live, live6, Pw, lm, ep)
        return _retract_window(poses, dx, t0, Pw), disps

    # ---- depth system over the kwin-frame window ----
    k_rel = ii - kf0  # [N], valid edges in [0, kwin)
    kframes = kf0 + jnp.arange(kwin)
    in_window = (kframes >= t0) & (kframes < t1) & (kframes < F)
    # compare-reduce, not segment_sum (sequential dynamic-update-slices on
    # TPU — this runs inside the fused track step's GN loop)
    touched = jnp.any(
        (jnp.clip(k_rel, 0, kwin - 1)[None, :] == jnp.arange(kwin)[:, None])
        & edge_valid[None, :],
        axis=1,
    )
    in_kx = in_window | (touched & (kframes < F))

    safe_k = jnp.minimum(kframes, F - 1)
    sens_w = disps_sens[safe_k].reshape(kwin, hw)
    disps_w = disps[safe_k].reshape(kwin, hw)
    eta_w = eta[safe_k].reshape(kwin, hw)

    C = _scatter_vec(blocks.Ck, k_rel, kwin)
    w_rhs = _scatter_vec(blocks.wk, k_rel, kwin)
    m = (sens_w > 0).astype(poses.dtype)
    C = C + m * alpha + (1.0 - m) * eta_w
    w_rhs = w_rhs - m * alpha * (disps_w - sens_w)
    Q = in_kx.astype(poses.dtype)[:, None] / jnp.where(C == 0.0, 1.0, C)

    # ---- dense windowed E: scatter edge couplings to (k, p) cells ----
    def scatter_E(E_blocks_, p_rel):
        idx = jnp.clip(k_rel, 0, kwin - 1) * Pw + p_rel
        ok = edge_valid & (p_rel >= 0) & (p_rel < Pw) & (k_rel >= 0) & (k_rel < kwin)
        idx = jnp.where(ok, idx, 0)
        flat = _onehot_scatter(E_blocks_, idx, ok, kwin * Pw)
        return flat.reshape(kwin, Pw, 6, hw)

    sd = jnp.dtype(schur_dtype)
    E = scatter_E(blocks.Ei.astype(sd), ii_r) + scatter_E(blocks.Ej.astype(sd), jj_r)
    E = E.reshape(kwin, Pw * 6, hw) * live6[None, :, None].astype(sd)

    EQ = E * Q[:, None, :].astype(sd)
    S = jnp.einsum("kux,kvx->uv", EQ, E, preferred_element_type=jnp.float32)
    v_schur = jnp.einsum(
        "kux,kx->u", EQ, w_rhs.astype(sd), preferred_element_type=jnp.float32
    )

    A = Hm - S * live6[:, None] * live6[None, :]
    eye = jnp.eye(Pw * 6, dtype=A.dtype)
    Ad = A + (ep + lm * A) * eye * live6[:, None]
    rhs = (v.reshape(Pw * 6) - v_schur).reshape(Pw * 6, 1)
    dx = cholesky_solve(Ad, rhs)
    dx = dx + cholesky_solve(Ad, rhs - jnp.matmul(Ad, dx))  # f32 refinement
    dx6 = dx.reshape(Pw * 6) * live6

    dz = Q * (
        w_rhs
        - jnp.einsum("kux,u->kx", E, dx6.astype(sd), preferred_element_type=jnp.float32)
    )

    dposes = jnp.zeros((F + Pw, 6), poses.dtype)
    dposes = jax.lax.dynamic_update_slice(
        dposes, dx6.reshape(Pw, 6), (t0, 0)
    )[:F]
    poses = lie.retr(poses, dposes)

    dz_full = jnp.zeros((F + kwin, hw), dz.dtype)
    dz_full = jax.lax.dynamic_update_slice(dz_full, dz, (kf0, 0))[:F]
    disps = disps + dz_full.reshape(F, ht, wd)
    return poses, disps


@functools.partial(
    jax.jit,
    static_argnames=("window", "iterations", "motion_only", "schur_dtype"),
)
def ba_solve(
    poses: Array,
    disps: Array,
    intrinsics: Array,
    disps_sens: Array,
    prob: BAProblem,
    window: int,
    iterations: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    motion_only: bool = False,
    schur_dtype: str = "float32",
) -> Tuple[Array, Array]:
    """Run `iterations` GN iterations and clamp disparities (depth_video.py:190-209)."""

    def body(_, carry):
        p, d = carry
        return ba_iteration(
            p, d, intrinsics, disps_sens, prob, window,
            lm=lm, ep=ep, motion_only=motion_only, schur_dtype=schur_dtype,
        )

    poses, disps = jax.lax.fori_loop(0, iterations, body, (poses, disps))
    if not motion_only:
        disps = jnp.clip(disps, 0.001, None)
    return poses, disps
