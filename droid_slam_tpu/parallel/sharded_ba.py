"""Pod-sliced global bundle adjustment: keyframe/edge-sharded GN with a
distributed Schur reduction.

This capability has NO reference counterpart — the reference is single-GPU
(/root/reference/README.md:31) and its global BA is bounded by one device's
memory (the 24 GB requirement for ETH3D/TartanAir, README.md:100). Here the
factor graph is sharded over a `jax.sharding.Mesh` axis:

  * each device owns a contiguous range of keyframes and ALL edges whose
    source frame ii falls in that range (so every depth block C_k, w_k, E_k
    is device-local),
  * per-edge linearisation (`ops.ba.build_edge_blocks`) runs shard-locally —
    the O(N·HW) heavy work scales linearly with devices,
  * the pose Hessian H, rhs v, and the Schur complement S = E Q Eᵀ are
    computed as shard-local partial sums and combined with ONE `psum` of the
    pre-combined damped-GN system (H − S, v − v_schur) over ICI,
  * the damped Cholesky solve is replicated (it is tiny), the depth
    back-substitution dz = Q (w − Eᵀ dx) is shard-local, and the owned dz
    slices are assembled with a tiled `all_gather`.

Communication per GN iteration: one psum of P·6·(P·6+1) floats plus an
all_gather of F·hw — for P = 512 that is ~38 MB + 2.5 MB, far below ICI
bandwidth; everything that scales with N·HW stays local. (Measured tables:
BASELINE.md §scaling; tools/scaling_analysis.py regenerates them.) This is
the scaling-book recipe: shard the big axis, reduce the small one.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ba as ba_ops
from ..ops import lie
from ..ops import projective as pops

Array = jax.Array


class ShardedBAPlan(NamedTuple):
    """Host-built shard layout: edges partitioned by source-keyframe owner.

    All arrays have a leading shard axis D; per-shard edge counts are padded
    to the max across shards. Pair lists address LOCAL block ids
    (0..Fd-1 = owned window rows, Fd..Fd+Ne-1 = local edges).
    """

    ii: np.ndarray  # [D, Ne] global frame ids
    jj: np.ndarray  # [D, Ne]
    valid: np.ndarray  # [D, Ne]
    perm: np.ndarray  # [D, Ne] original edge index (for gathering target/weight)
    f0: np.ndarray  # [D] first owned frame per shard
    pair_a: np.ndarray  # [D, NP] local block ids
    pair_b: np.ndarray  # [D, NP]
    pair_valid: np.ndarray  # [D, NP]
    frames_per_shard: int

    @staticmethod
    def build(
        ii: np.ndarray,
        jj: np.ndarray,
        valid: np.ndarray,
        n_shards: int,
        num_frames: int,
        t0: int,
        t1: int,
        pad_floor: int = 64,
    ) -> "ShardedBAPlan":
        fd = -(-num_frames // n_shards)  # owned frames per shard
        owner = np.clip(ii // fd, 0, n_shards - 1)

        idx_by_shard = [
            np.nonzero(valid & (owner == s))[0] for s in range(n_shards)
        ]
        ne = max(
            max((len(x) for x in idx_by_shard), default=1),
            1,
        )
        ne = max(int(2 ** np.ceil(np.log2(max(ne, pad_floor)))), pad_floor)

        D = n_shards
        s_ii = np.zeros((D, ne), np.int32)
        s_jj = np.zeros((D, ne), np.int32)
        s_valid = np.zeros((D, ne), bool)
        s_perm = np.zeros((D, ne), np.int32)
        f0 = (np.arange(D) * fd).astype(np.int32)

        pair_lists = []
        for s in range(D):
            idx = idx_by_shard[s]
            n = len(idx)
            s_ii[s, :n] = ii[idx]
            s_jj[s, :n] = jj[idx]
            s_valid[s, :n] = True
            s_perm[s, :n] = idx

            # local Schur blocks: [owned window rows (Fd)] + [local edges (ne)]
            blk_k = np.concatenate([f0[s] + np.arange(fd), s_ii[s]])
            blk_p = np.concatenate([f0[s] + np.arange(fd), s_jj[s]])
            blk_ok = np.concatenate(
                [
                    (f0[s] + np.arange(fd) >= t0)
                    & (f0[s] + np.arange(fd) < t1)
                    & (f0[s] + np.arange(fd) < num_frames),
                    s_valid[s],
                ]
            ) & (blk_p >= t0) & (blk_p < t1)

            pair_lists.append(ba_ops.pair_schedule(blk_k, blk_ok))

        np_max = max(max((len(p[0]) for p in pair_lists), default=1), 1)
        np_max = max(int(2 ** np.ceil(np.log2(max(np_max, pad_floor)))), pad_floor)
        pair_a = np.zeros((D, np_max), np.int32)
        pair_b = np.zeros((D, np_max), np.int32)
        pair_valid = np.zeros((D, np_max), bool)
        for s, (pa, pb) in enumerate(pair_lists):
            pair_a[s, : len(pa)] = pa
            pair_b[s, : len(pb)] = pb
            pair_valid[s, : len(pa)] = True

        return ShardedBAPlan(
            ii=s_ii, jj=s_jj, valid=s_valid, perm=s_perm, f0=f0,
            pair_a=pair_a, pair_b=pair_b, pair_valid=pair_valid,
            frames_per_shard=fd,
        )

    def shard_edge_data(self, x: np.ndarray) -> np.ndarray:
        """Gather per-edge arrays [N, ...] into the shard layout [D, Ne, ...]."""
        return np.asarray(x)[self.perm]

    def shard_edge_data_device(self, x: Array) -> Array:
        """Device-side variant (keeps target/weight in HBM when the runtime
        integrates the sharded backend)."""
        flat = jnp.take(jnp.asarray(x), jnp.asarray(self.perm.reshape(-1)), axis=0)
        return flat.reshape(self.perm.shape + x.shape[1:])


_BUILD_CACHE: dict = {}


def build_sharded_ba(
    mesh: Mesh,
    window: int,
    frames_per_shard: int,
    axis: str = "ba",
    lm: float = 1e-5,
    ep: float = 1e-2,
    alpha: float = 0.05,
):
    """Build the jitted sharded GN iteration for a fixed mesh/window.

    Cached per (mesh, window, frames_per_shard, …) so repeated backend steps
    reuse the compiled program instead of re-tracing a fresh closure."""
    key = (mesh, window, frames_per_shard, axis, lm, ep, alpha)
    hit = _BUILD_CACHE.get(key)
    if hit is not None:
        return hit

    n_shards = mesh.shape[axis]

    def local_iteration(
        target, weight, ii, jj, valid, pair_a, pair_b, pair_valid, f0,
        poses, disps, intrinsics0, disps_sens, eta, t0, t1,
    ):
        """Runs per shard: leading shard axis of size 1 stripped inside."""
        (target, weight, ii, jj, valid, pair_a, pair_b, pair_valid, f0) = (
            x[0] for x in (target, weight, ii, jj, valid, pair_a, pair_b, pair_valid, f0)
        )
        F = poses.shape[0]
        h, w = disps.shape[-2:]
        hw = h * w
        fd = frames_per_shard
        Pw = window

        intr_all = jnp.broadcast_to(intrinsics0, (F, 4))
        blocks = ba_ops.build_edge_blocks(
            target, weight, poses, disps, intr_all, ii, jj,
            edge_valid=valid, min_depth=pops.MIN_DEPTH_NATIVE,
        )

        # ---- pose system: shard-local partial sums → psum ----
        ii_r = ii - t0
        jj_r = jj - t0
        H = (
            ba_ops._scatter_mat(blocks.Hii, ii_r, ii_r, Pw, Pw)
            + ba_ops._scatter_mat(blocks.Hij, ii_r, jj_r, Pw, Pw)
            + ba_ops._scatter_mat(blocks.Hji, jj_r, ii_r, Pw, Pw)
            + ba_ops._scatter_mat(blocks.Hjj, jj_r, jj_r, Pw, Pw)
        )
        v = ba_ops._scatter_vec(blocks.vi, ii_r, Pw) + ba_ops._scatter_vec(
            blocks.vj, jj_r, Pw
        )

        # ---- owned depth blocks (all edges for owned frames are local) ----
        k_local = ii - f0  # [Ne] in [0, fd)
        C_own = ba_ops._scatter_vec(blocks.Ck, k_local, fd)  # [fd, hw]
        w_own = ba_ops._scatter_vec(blocks.wk, k_local, fd)
        E_win = ba_ops._scatter_vec(blocks.Ei, k_local, fd)  # [fd, 6, hw]

        own_frames = f0 + jnp.arange(fd)
        own_ok = (own_frames < F)
        safe_frames = jnp.minimum(own_frames, F - 1)
        sens_own = disps_sens[safe_frames].reshape(fd, hw)
        disps_own = disps[safe_frames].reshape(fd, hw)
        eta_own = eta[safe_frames].reshape(fd, hw)

        m = (sens_own > 0).astype(poses.dtype)
        C = C_own + m * alpha + (1.0 - m) * eta_own
        w_rhs = w_own - m * alpha * (disps_own - sens_own)

        in_window = own_ok & (own_frames >= t0) & (own_frames < t1)
        # boolean "any edge touches this frame" as a compare-reduce, NOT
        # segment_sum (which lowers to a sequential dynamic-update-slice
        # chain on TPU — see the one-hot scatter rule in CLAUDE.md)
        touched = jnp.any(
            (jnp.clip(k_local, 0, fd - 1)[None, :] == jnp.arange(fd)[:, None])
            & valid[None, :],
            axis=1,
        )
        in_kx = (in_window | (touched & own_ok)).astype(poses.dtype)
        Q = in_kx[:, None] / jnp.where(C == 0.0, 1.0, C)

        # ---- local Schur blocks + pair products ----
        E_blocks = jnp.concatenate([E_win, blocks.Ej], axis=0)  # [fd+Ne, 6, hw]
        blk_k = jnp.concatenate([jnp.arange(fd), k_local])  # local keyframe ids
        blk_p = jnp.concatenate([own_frames, jj])
        blk_ok = (
            jnp.concatenate([in_window, valid])
            & (blk_p >= t0)
            & (blk_p < t1)
        )
        Qk = Q[jnp.clip(blk_k, 0, fd - 1)] * blk_ok[:, None].astype(Q.dtype)

        pairs = ba_ops.SchurPairs(pair_a, pair_b, pair_valid)
        S_pairs = ba_ops._pair_products(E_blocks, Qk, pairs)
        pa_p = blk_p[pairs.pair_a] - t0
        pb_p = blk_p[pairs.pair_b] - t0
        S = ba_ops._scatter_mat(S_pairs, pa_p, pb_p, Pw, Pw)

        Qw = Q * w_rhs
        v_blocks = jnp.einsum(
            "nak,nk->na", E_blocks, Qw[jnp.clip(blk_k, 0, fd - 1)] * blk_ok[:, None]
        )
        v_schur = ba_ops._scatter_vec(v_blocks, blk_p - t0, Pw)

        # ---- THE collective: ONE psum of the combined damped-GN system.
        # H and S enter the solve only as H − S (and v, v_schur as
        # v − v_schur): combining BEFORE the reduction halves the bytes on
        # the wire vs psumming the four partial sums separately.
        A_blk = jax.lax.psum(H - S, axis)
        rhs_v = jax.lax.psum(v - v_schur, axis)

        # ---- replicated damped solve ----
        row = jnp.arange(Pw)
        live = (row < (t1 - t0)).astype(poses.dtype)
        live6 = jnp.repeat(live, 6)
        Am = A_blk.transpose(0, 2, 1, 3).reshape(Pw * 6, Pw * 6)
        A = Am * live6[:, None] * live6[None, :] + jnp.diag(1.0 - live6)
        eye = jnp.eye(Pw * 6, dtype=A.dtype)
        Ad = A + (ep + lm * A) * eye * live6[:, None]
        rhs = (rhs_v * live[:, None]).reshape(Pw * 6, 1)
        dx = ba_ops.cholesky_solve(Ad, rhs)
        dx = dx + ba_ops.cholesky_solve(Ad, rhs - jnp.matmul(Ad, dx))
        dx = dx.reshape(Pw, 6) * live[:, None]

        # ---- shard-local depth back-substitution ----
        dx_blocks = dx[jnp.clip(blk_p - t0, 0, Pw - 1)] * blk_ok[:, None].astype(
            dx.dtype
        )
        w_corr = jnp.einsum("nak,na->nk", E_blocks, dx_blocks)  # [fd+Ne, hw]
        w_corr_own = ba_ops._scatter_vec(w_corr, blk_k, fd)
        dz_own = Q * (w_rhs - w_corr_own)  # [fd, hw]

        # disjoint contiguous frame ownership → a tiled all_gather assembles
        # the global dz with (D−1)/D·F·hw on the wire, half the psum of the
        # zero-padded [F, hw] array this used to be
        dz_g = jax.lax.all_gather(dz_own, axis, tiled=True)  # [D·fd, hw]
        total = n_shards * fd
        if total >= F:
            dz = dz_g[:F]
        else:  # buffer frames past the owned ranges hold no edges: dz = 0
            dz = jnp.pad(dz_g, ((0, F - total), (0, 0)))

        # ---- retractions (replicated) ----
        dposes = jnp.zeros((F + Pw, 6), poses.dtype)
        dposes = jax.lax.dynamic_update_slice(dposes, dx, (t0, 0))[:F]
        poses = lie.retr(poses, dposes)
        # no per-iteration clamp: callers clamp once after all iterations,
        # matching ops.ba.ba_solve (depth_video.py:190-209)
        disps = disps + dz.reshape(F, h, w)
        # every shard holds the identical post-collective result — returned
        # as replicated (out_specs P()). Stacking on the shard axis and
        # slicing [0] instead made XLA broadcast shard 0's outputs with an
        # extra all-reduce of (poses, disps) per iteration (seen in HLO).
        return poses, disps

    spec_e = P(axis)
    spec_r = P()  # replicated
    f = shard_map(
        local_iteration,
        mesh=mesh,
        in_specs=(
            spec_e, spec_e, spec_e, spec_e, spec_e,  # target/weight/ii/jj/valid
            spec_e, spec_e, spec_e, spec_e,  # pairs + f0
            spec_r, spec_r, spec_r, spec_r, spec_r, spec_r, spec_r,
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(plan_arrays, poses, disps, intrinsics0, disps_sens, eta, t0, t1):
        return f(
            *plan_arrays, poses, disps, intrinsics0, disps_sens, eta, t0, t1
        )

    _BUILD_CACHE[key] = run
    return run


# programs already AOT-compiled + barriered in multi-process mode (keyed by
# jitted fn identity + arg shapes/dtypes); both processes mutate this
# symmetrically, so the barrier names agree
_MP_AOT_DONE: set = set()


def _put(x, sharding: NamedSharding):
    """Place a host/local-device array with ``sharding``, including on a
    MULTI-PROCESS mesh (the DCN-analogue backend path): `device_put` cannot
    target non-addressable devices, so build the global array from each
    process's addressable shards instead. Every process holds the full
    array host-side (the plan/window state is computed identically on every
    process), so the callback just slices it."""
    if jax.process_count() > 1:
        x = np.asarray(x)  # fetch local device arrays to host once
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: np.ascontiguousarray(x[idx])
        )
    return jax.device_put(jnp.asarray(x), sharding)


def _put_sharded(mesh: Mesh, axis: str, x):
    return _put(
        x, NamedSharding(mesh, P(axis, *([None] * (np.ndim(x) - 1))))
    )


def host_replicated(arr: Array) -> np.ndarray:
    """Host copy of a replicated global array, valid even when the array
    spans non-addressable devices (where plain np.asarray raises)."""
    return np.asarray(arr.addressable_shards[0].data)


def place_plan_constants(mesh: Mesh, plan: ShardedBAPlan, axis: str = "ba"):
    """Place the per-topology constant plan arrays on the mesh ONCE; only
    target/weight change between GN steps of the same graph, so callers
    looping sharded_ba_solve should hoist this out of the loop."""
    return tuple(
        _put_sharded(mesh, axis, x)
        for x in (
            plan.ii, plan.jj, plan.valid,
            plan.pair_a, plan.pair_b, plan.pair_valid, plan.f0,
        )
    )


def place_plan(
    mesh: Mesh,
    plan: ShardedBAPlan,
    target: Array,
    weight: Array,
    axis: str = "ba",
    constants=None,
):
    """Shard the plan + per-edge data over the mesh axis (device-side gather)."""
    if constants is None:
        constants = place_plan_constants(mesh, plan, axis)
    return (
        _put_sharded(mesh, axis, plan.shard_edge_data_device(target)),
        _put_sharded(mesh, axis, plan.shard_edge_data_device(weight)),
    ) + tuple(constants)


def sharded_ba_solve(
    mesh: Mesh,
    plan: ShardedBAPlan,
    target: Array,  # [N, h, w, 2] original edge order (device or host)
    weight: Array,
    eta: Array,  # [F, h, w]
    poses: Array,
    disps: Array,
    intrinsics0: Array,
    disps_sens: Array,
    t0: int,
    t1: int,
    window: int,
    iterations: int = 2,
    axis: str = "ba",
    constants=None,  # pre-placed output of place_plan_constants (hoist per graph)
    **kw,
) -> Tuple[Array, Array]:
    """Multi-iteration sharded GN solve: place data once, iterate the cached
    compiled step, clamp disparities once at the end (ops.ba.ba_solve
    semantics). This is the backend's distributed `droid_backends.ba`
    replacement (droid.cpp:680-798 / BASELINE north star 3)."""
    run = build_sharded_ba(mesh, window, plan.frames_per_shard, axis=axis, **kw)
    plan_arrays = place_plan(mesh, plan, target, weight, axis=axis,
                             constants=constants)

    def put_repl(x):
        return _put(x, NamedSharding(mesh, P()))

    poses = put_repl(poses)
    disps = put_repl(disps)
    intrinsics0 = put_repl(intrinsics0)
    disps_sens = put_repl(disps_sens)
    eta = put_repl(eta)
    if jax.process_count() > 1:
        # gloo discipline (CLAUDE.md rule 1, found by real 2-process
        # failures): AOT-compile the first cross-process program, then
        # barrier, THEN execute — asymmetric compile durations (cache hit
        # on one process only) otherwise park one process in the gloo
        # communicator rendezvous past its 30 s cap. Once per program.
        args = (plan_arrays, poses, disps, intrinsics0, disps_sens, eta,
                jnp.int32(t0), jnp.int32(t1))
        akey = (id(run), tuple(
            (a.shape, str(a.dtype)) for a in jax.tree.leaves(args)
        ))
        if akey not in _MP_AOT_DONE:
            run.lower(*args).compile()
            _MP_AOT_DONE.add(akey)
            from jax._src import distributed

            distributed.global_state.client.wait_at_barrier(
                f"sharded_ba_aot_{len(_MP_AOT_DONE)}", timeout_in_ms=1_500_000
            )
    for _ in range(iterations):
        poses, disps = run(
            plan_arrays, poses, disps, intrinsics0, disps_sens, eta,
            jnp.int32(t0), jnp.int32(t1),
        )
    disps = jnp.clip(disps, 0.001, None)
    if jax.process_count() > 1:
        # hand process-LOCAL arrays back: callers (update_lowmem's chunked
        # update-op step) run plain local jits that cannot consume arrays
        # spanning non-addressable devices
        return (jnp.asarray(host_replicated(poses)),
                jnp.asarray(host_replicated(disps)))
    return poses, disps


def sharded_ba_iteration(
    mesh: Mesh,
    plan: ShardedBAPlan,
    target: np.ndarray,  # [N, h, w, 2] in original edge order
    weight: np.ndarray,
    eta: np.ndarray,  # [F, h, w]
    poses: Array,
    disps: Array,
    intrinsics0: Array,
    disps_sens: Array,
    t0: int,
    t1: int,
    window: int,
    axis: str = "ba",
    **kw,
) -> Tuple[Array, Array]:
    """Convenience wrapper: place the plan on the mesh and run one iteration."""
    return sharded_ba_solve(
        mesh, plan, target, weight, eta, poses, disps, intrinsics0,
        disps_sens, t0, t1, window, iterations=1, axis=axis, **kw,
    )
