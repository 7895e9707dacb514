"""Covisibility factor graph over keyframes — padded static-shape edition.

TPU-native re-design of /root/reference/droid_slam/factor_graph.py. The
reference mutates variable-length edge tensors (cat/boolean-index per edit);
under XLA that would recompile constantly, so here:

  * canonical edge bookkeeping (ii, jj, age, validity, dedup sets, the
    inactive/bad stores) lives on the HOST in numpy, padded to static
    capacities (`max_factors` active + `inactive_pad` inactive — the
    reference caps active edges at 48 in the frontend anyway),
  * per-edge device state (GRU hidden `net`, flow `target`, confidence
    `weight`) lives in fixed [Nmax, ...] HBM slots; adds/removals are masked
    writes, never reshapes,
  * one operator iteration (`update`) — reproject → motion features → corr
    pyramid build+lookup → ConvGRU update → dense BA — is ONE jitted program
    (the reference crosses the Python↔C++ boundary 4+ times per iteration and
    ping-pongs device↔host inside the BA loop, factor_graph.py:199-251,
    droid.cpp:743-795).

Correlation: volumes are rebuilt from the keyframes' feature maps inside the
jitted update (an MXU matmul) instead of being cached per edge — this removes
all volume state from graph edits at negligible FLOP cost; the low-memory
backend path (`update_lowmem`) uses on-the-fly AltCorr like the reference's
CUDA altcorr kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.update import GraphAgg, UpdateModule, upsample_disp
from ..ops import ba as ba_ops
from ..ops import corr as corr_ops
from ..ops import projective as pops
from .video import persist_window, read_window

Array = jax.Array


class EdgeState(NamedTuple):
    """Device-resident padded per-edge state."""

    ii: Array  # [Nmax] int32
    jj: Array  # [Nmax] int32
    valid: Array  # [Nmax] bool
    net: Array  # [Nmax, h, w, 128]
    target: Array  # [Nmax, h, w, 2]
    weight: Array  # [Nmax, h, w, 2]


class InactiveState(NamedTuple):
    ii: Array  # [Kmax] int32
    jj: Array
    valid: Array
    target: Array  # [Kmax, h, w, 2]
    weight: Array


def _empty_edges(n: int, h: int, w: int, net_dtype=jnp.float32) -> EdgeState:
    # `net_dtype`: the per-edge GRU hidden dominates backend memory
    # (n·h·w·128). The backend passes the compute dtype (bf16 in
    # production): at reference scale (t≈300, 384×512 → 4.6k edges, 48×64
    # grid) an f32 store alone is ~7 GB and OOM'd a 16 GB chip (r5
    # long-loop). target/weight stay f32 — they carry sub-pixel coordinate
    # precision the BA residuals need (bf16 ulp at u≈64 px is 0.5 px).
    return EdgeState(
        ii=jnp.zeros((n,), jnp.int32),
        jj=jnp.zeros((n,), jnp.int32),
        valid=jnp.zeros((n,), bool),
        net=jnp.zeros((n, h, w, 128), net_dtype),
        target=jnp.zeros((n, h, w, 2), jnp.float32),
        weight=jnp.zeros((n, h, w, 2), jnp.float32),
    )


def _empty_inactive(k: int, h: int, w: int) -> InactiveState:
    return InactiveState(
        ii=jnp.zeros((k,), jnp.int32),
        jj=jnp.zeros((k,), jnp.int32),
        valid=jnp.zeros((k,), bool),
        target=jnp.zeros((k, h, w, 2), jnp.float32),
        weight=jnp.zeros((k, h, w, 2), jnp.float32),
    )


# -----------------------------------------------------------------------------
# jitted kernels
# -----------------------------------------------------------------------------


@functools.partial(jax.jit, donate_argnums=(1,))
def _add_edges_kernel(
    nets: Array,  # video.nets [B, h, w, 128]
    graph: EdgeState,
    poses: Array,
    disps: Array,
    intrinsics: Array,
    new_ii: Array,  # [Nmax] — per SLOT: the edge to write (garbage if masked)
    new_jj: Array,
    write: Array,  # [Nmax] bool — which slots receive a new edge
) -> EdgeState:
    """Write new edges into their slots: hidden state from the source
    keyframe, target = current reprojection, weight = 0
    (factor_graph.py:110-135)."""
    target, _ = pops.projective_transform(poses, disps, intrinsics, new_ii, new_jj)
    # cast to the STORE dtype (the backend keeps the hidden in compute
    # dtype; an f32 video.nets would otherwise promote the where and
    # silently double the store)
    net_new = jnp.take(nets, new_ii, axis=0).astype(graph.net.dtype)
    w4 = write[:, None, None, None]
    return EdgeState(
        ii=jnp.where(write, new_ii, graph.ii),
        jj=jnp.where(write, new_jj, graph.jj),
        valid=graph.valid | write,
        net=jnp.where(w4, net_new, graph.net),
        target=jnp.where(w4, target, graph.target),
        weight=jnp.where(w4, 0.0, graph.weight),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _deactivate_kernel(
    graph: EdgeState,
    inactive: InactiveState,
    drop: Array,  # [Nmax] bool — active slots to deactivate
    dst: Array,  # [Nmax] int32 — inactive slot each dropped edge moves to
    store: Array,  # [Nmax] bool — whether the dropped edge is stored
) -> Tuple[EdgeState, InactiveState]:
    """Move edges from the active store to the inactive store
    (factor_graph.py:138-162)."""
    keep_mask = store & drop
    safe_dst = jnp.where(keep_mask, dst, inactive.ii.shape[0])  # OOB drops
    inactive = InactiveState(
        ii=inactive.ii.at[safe_dst].set(graph.ii, mode="drop"),
        jj=inactive.jj.at[safe_dst].set(graph.jj, mode="drop"),
        valid=inactive.valid.at[safe_dst].set(True, mode="drop"),
        target=inactive.target.at[safe_dst].set(graph.target, mode="drop"),
        weight=inactive.weight.at[safe_dst].set(graph.weight, mode="drop"),
    )
    graph = graph._replace(valid=graph.valid & ~drop)
    return graph, inactive


@functools.partial(jax.jit, donate_argnums=(0,))
def _shift_down_kernel(buf: Array, ix: Array) -> Array:
    """buf[k] ← buf[k+1] for k ≥ ix (keyframe removal, factor_graph.py:166-178)."""
    n = buf.shape[0]
    idx = jnp.arange(n)
    src = jnp.where(idx >= ix, jnp.minimum(idx + 1, n - 1), idx)
    return jnp.take(buf, src, axis=0)


@jax.jit
def _edge_confidence_kernel(graph: EdgeState) -> Array:
    """Mean confidence per edge (for filter_edges, factor_graph.py:71-78)."""
    return jnp.mean(graph.weight, axis=(1, 2, 3))


@functools.lru_cache(maxsize=None)
def _build_update_step(stereo: bool, upsample: bool = False, dtype: str = "float32"):
    """Build the jitted one-iteration operator update (factor_graph.py:199-251).

    With ``upsample``, the step also maintains the full-resolution disparity
    buffer: post-BA window disparities are convex-upsampled with the GraphAgg
    mask and written into ``disps_up`` at frames touched by active edges
    (reference factor_graph.py:248-249 + depth_video.py:126-130).

    ``dtype`` is the conv computation dtype (bfloat16 in production — the
    channel-heavy update operator takes the MXU speedup; geometry/BA stays
    float32; the heads cast their outputs back to float32)."""

    cdt = None if dtype == "float32" else jnp.dtype(dtype)
    update_op = UpdateModule(dtype=cdt)

    @functools.partial(
        jax.jit,
        static_argnames=("window", "agg_frames", "itrs", "use_inactive", "motion_only"),
        donate_argnums=(1, 2, 5, 6, 7),
    )
    def update_step(
        params,
        poses: Array,
        disps: Array,
        intrinsics: Array,  # [B, 4]
        disps_sens: Array,
        graph: EdgeState,
        damping: Array,  # [B, h, w] persistent per-frame damping memory
        disps_up: Array,  # [B, 8h, 8w] full-res disparities (unused w/o upsample)
        fmaps: Array,  # [B, rig, h, w, 128]
        inps: Array,  # [B, h, w, 128]
        inactive: InactiveState,
        pairs: ba_ops.SchurPairs,
        t0: Array,
        t1: Array,
        kf0: Array,  # window base for the graph aggregation
        window: int,
        agg_frames: int,
        itrs: int = 2,
        use_inactive: bool = True,
        motion_only: bool = False,
        ep: float = 1e-7,
    ):
        ii, jj, valid = graph.ii, graph.jj, graph.valid
        h, w = disps.shape[-2:]

        # ---- motion features --------------------------------------------
        coords0 = pops.coords_grid(h, w)
        coords1, _ = pops.projective_transform(poses, disps, intrinsics, ii, jj)
        motn = jnp.clip(
            jnp.concatenate([coords1 - coords0, graph.target - coords1], axis=-1),
            -64.0,
            64.0,
        )

        # ---- correlation: rebuild pyramid + lookup (MXU matmul + gather) --
        fmap1 = fmaps[ii, 0]
        if stereo:
            rig2 = (ii == jj).astype(jnp.int32)
            fmap2 = fmaps[jj, rig2]
        else:
            fmap2 = fmaps[jj, 0]
        corr_feat = corr_ops.CorrPyramid.build(fmap1, fmap2)(coords1)

        # ---- ConvGRU update ----------------------------------------------
        net, delta, weight, eta_win, upmask = update_op.apply(
            params,
            graph.net,
            jnp.take(inps, ii, axis=0),
            corr_feat,
            motn,
            jnp.clip(ii - kf0, 0, agg_frames - 1),
            agg_frames,
            valid,
        )

        target = coords1 + delta
        # hidden-state slots stay f32 (stable jit signature across calls)
        graph = graph._replace(
            net=net.astype(graph.net.dtype), target=target, weight=weight
        )

        # persist damping at frames touched by active edges (only)
        touched_rel = (
            jax.ops.segment_sum(
                valid.astype(jnp.int32),
                jnp.clip(ii - kf0, 0, agg_frames - 1),
                num_segments=agg_frames,
            )
            > 0
        )
        damping = persist_window(damping, eta_win, touched_rel, kf0)

        # ---- dense bundle adjustment -------------------------------------
        if use_inactive:
            inac_ok = (
                inactive.valid
                & (inactive.ii >= t0 - 3)
                & (inactive.jj >= t0 - 3)
            )
            ba_ii = jnp.concatenate([inactive.ii, ii])
            ba_jj = jnp.concatenate([inactive.jj, jj])
            ba_valid = jnp.concatenate([inac_ok, valid])
            ba_target = jnp.concatenate([inactive.target, target])
            ba_weight = jnp.concatenate([inactive.weight, weight])
        else:
            ba_ii, ba_jj, ba_valid = ii, jj, valid
            ba_target, ba_weight = target, weight

        eta_full = 0.2 * damping + ep
        prob = ba_ops.BAProblem(
            target=ba_target,
            weight=ba_weight,
            eta=eta_full,
            ii=ba_ii,
            jj=ba_jj,
            edge_valid=ba_valid,
            t0=t0,
            t1=t1,
            pairs=pairs,
        )
        poses, disps = ba_ops.ba_solve(
            poses, disps, intrinsics[0], disps_sens, prob, window,
            iterations=itrs, motion_only=motion_only,
        )

        if upsample:
            # maintain full-res disparities for the window frames touched by
            # active edges (post-BA disps, matching video.upsample intent)
            win = read_window(disps, kf0, agg_frames)
            up_win = upsample_disp(win, upmask.astype(jnp.float32))
            disps_up = persist_window(disps_up, up_win, touched_rel, kf0)

        return poses, disps, graph, damping, disps_up

    return update_step


@functools.lru_cache(maxsize=None)
def _build_lowmem_step(
    stereo: bool,
    chunk: int = 256,
    upsample: bool = False,
    do_ba: bool = True,
    dtype: str = "float32",
):
    """Build the jitted low-memory global-BA iteration (factor_graph.py:255-302).

    Correlation is computed on the fly per lookup window (AltCorr — the
    reference's CUDA altcorr kernel), so no O(N·HW²) volumes are ever
    materialised; the update operator runs over fixed-size edge chunks via
    `lax.map` to bound peak memory. Unlike the reference (which chunks by
    source-frame ranges and aggregates per chunk), the per-frame damping
    aggregation accumulates across all chunks and the GraphAgg convolutions
    run once over the whole buffer — identical math, static shapes.
    """

    cdt = None if dtype == "float32" else jnp.dtype(dtype)
    update_op = UpdateModule(dtype=cdt)

    @functools.partial(
        jax.jit,
        static_argnames=("window", "itrs"),
        donate_argnums=(1, 2, 5, 6, 7),
    )
    def lowmem_step(
        params,
        poses: Array,
        disps: Array,
        intrinsics: Array,
        disps_sens: Array,
        graph: EdgeState,
        damping: Array,
        disps_up: Array,  # [B, 8h, 8w] (unused unless upsample)
        fmaps: Array,  # [B, rig, h, w, 128]
        inps: Array,
        pairs: ba_ops.SchurPairs,
        t0: Array,
        t1: Array,
        window: int,
        itrs: int = 2,
        lm: float = 1e-5,
        ep_ba: float = 1e-2,
        ep: float = 1e-7,
    ):
        ii, jj, valid = graph.ii, graph.jj, graph.valid
        N = ii.shape[0]
        h, w = disps.shape[-2:]
        B = poses.shape[0]

        coords0 = pops.coords_grid(h, w)
        coords1, _ = pops.projective_transform(poses, disps, intrinsics, ii, jj)
        motn = jnp.clip(
            jnp.concatenate([coords1 - coords0, graph.target - coords1], axis=-1),
            -64.0,
            64.0,
        )

        # on-the-fly correlation over the (rig-flattened) keyframe features.
        # In bf16 mode the correlation matmuls run in compute dtype — the
        # same treatment the fused tracking engine gives its corr lookups
        # (channel-heavy dot products are where bf16 pays off, CLAUDE.md);
        # targets/weights fed to the BA stay float32 below.
        rig = fmaps.shape[1]
        flat_fmaps = fmaps.reshape(B * rig, h, w, 128)
        if cdt is not None:
            flat_fmaps = flat_fmaps.astype(cdt)
        alt = corr_ops.AltCorr.build(flat_fmaps)
        if stereo:
            c1 = rig * ii
            c2 = rig * jj + (ii == jj).astype(jnp.int32)
        else:
            c1, c2 = ii, jj

        n_chunks = -(-N // chunk)
        pad = n_chunks * chunk - N

        def pad_to(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

        chunks = jax.tree.map(
            lambda x: pad_to(x).reshape((n_chunks, chunk) + x.shape[1:]),
            (coords1, motn, graph.net, jnp.take(inps, ii, axis=0), c1, c2),
        )

        def body(args):
            crd, mot, net_c, inp_c, a, b = args
            corr = alt(crd, a, b)
            net_c, delta, weight = update_op.apply(
                params, net_c, inp_c, corr, mot
            )
            return net_c, crd + delta, weight

        net, target, weight = jax.lax.map(body, chunks)
        unpad = lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:N]
        net, target, weight = unpad(net), unpad(target), unpad(weight)
        graph = graph._replace(
            net=net.astype(graph.net.dtype),
            target=target.astype(jnp.float32),
            weight=weight.astype(jnp.float32),
        )

        # graph aggregation over ALL edges at once (damping + upmask)
        eta_all, upmask = GraphAgg(dtype=cdt).apply(
            {"params": params["params"]["agg"]}, net, ii, B, valid
        )
        touched = (
            jax.ops.segment_sum(
                valid.astype(jnp.int32), jnp.clip(ii, 0, B - 1), num_segments=B
            )
            > 0
        )
        damping = jnp.where(touched[:, None, None], eta_all, damping)

        if do_ba:
            prob = ba_ops.BAProblem(
                target=target,
                weight=weight,
                eta=0.2 * damping + ep,
                ii=ii,
                jj=jj,
                edge_valid=valid,
                t0=t0,
                t1=t1,
                pairs=pairs,
            )
            poses, disps = ba_ops.ba_solve(
                poses, disps, intrinsics[0], disps_sens, prob, window,
                iterations=itrs, lm=lm, ep=ep_ba, schur_dtype=dtype,
            )
        # else: the caller hands target/weight/damping to the mesh-sharded
        # BA (parallel/sharded_ba.py) — poses/disps pass through

        if upsample:
            up_all = upsample_disp(disps, upmask.astype(jnp.float32))
            disps_up = jnp.where(touched[:, None, None], up_all, disps_up)

        return poses, disps, graph, damping, disps_up

    return lowmem_step


# -----------------------------------------------------------------------------
# host-side factor graph
# -----------------------------------------------------------------------------


class FactorGraph:
    """Host orchestrator around the padded device state."""

    def __init__(
        self,
        video,
        params,
        max_factors: int = 48,
        inactive_pad: int = 96,
        window_pad: int = 64,
        schur_pair_floor: int = 4096,
        upsample: bool = False,
        edge_pad: int = None,
        net_dtype=None,  # per-edge hidden store dtype (default f32)
    ):
        self.video = video
        self.params = params
        self.max_factors = max_factors
        # static capacity of the ACTIVE edge store. max_factors is the
        # reference's eviction/budget THRESHOLD, not a hard capacity: with
        # remove=False the reference appends past it (factor_graph.py:102-103
        # guards the LRU drop on `remove`), e.g. the tum/euroc initialization
        # neighborhood (6*warmup - 12 edges > 48). A store capped at
        # max_factors silently dropped those init edges.
        self.edge_pad = edge_pad if edge_pad is not None else 2 * max_factors
        self.window_pad = window_pad
        self.schur_pair_floor = schur_pair_floor
        self.upsample = upsample

        h, w = video.config.feat_size
        self.h, self.w = h, w

        # host-canonical edge bookkeeping
        self.ii = np.zeros(self.edge_pad, np.int32)
        self.jj = np.zeros(self.edge_pad, np.int32)
        self.age = np.zeros(self.edge_pad, np.int32)
        self.valid = np.zeros(self.edge_pad, bool)

        self.inactive_pad = inactive_pad
        self.ii_inac = np.zeros(inactive_pad, np.int32)
        self.jj_inac = np.zeros(inactive_pad, np.int32)
        self.valid_inac = np.zeros(inactive_pad, bool)
        self.inac_next = 0  # ring pointer for inactive slot reuse

        self.bad_edges: set = set()
        self._topology_version = 0  # bumped on every edge/keyframe edit

        self.edges = _empty_edges(
            self.edge_pad, h, w,
            net_dtype=net_dtype if net_dtype is not None else jnp.float32,
        )
        self.inactive = _empty_inactive(inactive_pad, h, w)
        self.damping = 1e-6 * jnp.ones((video.config.buffer, h, w), jnp.float32)

        self._update_step = _build_update_step(
            video.config.stereo, upsample,
            dtype=getattr(video.config, "compute_dtype", "float32"),
        )
        self._lowmem_step = None  # built lazily by update_lowmem

    # ------------------------------------------------------------- queries

    @property
    def edge_set(self) -> set:
        active = {
            (int(i), int(j))
            for i, j, v in zip(self.ii, self.jj, self.valid)
            if v
        }
        inac = {
            (int(i), int(j))
            for i, j, v in zip(self.ii_inac, self.jj_inac, self.valid_inac)
            if v
        }
        return active | inac

    @property
    def num_active(self) -> int:
        return int(self.valid.sum())

    # ---------------------------------------------------------------- edits

    def add_factors(self, ii, jj, remove: bool = False):
        """Add edges (dedup; LRU eviction by age when out of capacity —
        factor_graph.py:86-135)."""
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)

        existing = self.edge_set
        keep = [
            k
            for k in range(len(ii))
            if (int(ii[k]), int(jj[k])) not in existing
        ]
        # also dedup within the batch
        seen = set()
        uniq = []
        for k in keep:
            key = (int(ii[k]), int(jj[k]))
            if key not in seen:
                seen.add(key)
                uniq.append(k)
        ii, jj = ii[uniq], jj[uniq]
        if len(ii) == 0:
            return
        self._topology_version += 1

        free = np.nonzero(~self.valid)[0]
        if remove:
            # reference semantics (factor_graph.py:102-107): with remove=True
            # the ACTIVE COUNT is held at max_factors — evict oldest so that
            # count + new <= max_factors (NOT merely until the store fits;
            # the store is deliberately larger for remove=False appends)
            need = int(self.valid.sum()) + len(ii) - self.max_factors
            if need > 0:
                # stable sort so ties break by ascending slot — the fused
                # engine's argsort order
                active_slots = np.nonzero(self.valid)[0]
                order = active_slots[
                    np.argsort(-self.age[active_slots], kind="stable")
                ]
                self._deactivate(order[:need], store=True)
                free = np.nonzero(~self.valid)[0]
        n_write = min(len(ii), len(free))
        ii, jj = ii[:n_write], jj[:n_write]
        slots = free[:n_write]

        new_ii = np.zeros(self.edge_pad, np.int32)
        new_jj = np.zeros(self.edge_pad, np.int32)
        write = np.zeros(self.edge_pad, bool)
        new_ii[slots] = ii
        new_jj[slots] = jj
        write[slots] = True

        self.ii[slots] = ii
        self.jj[slots] = jj
        self.age[slots] = 0
        self.valid[slots] = True

        self.edges = _add_edges_kernel(
            self.video.nets,
            self.edges,
            self.video.poses,
            self.video.disps,
            self.video.intrinsics,
            jnp.asarray(new_ii),
            jnp.asarray(new_jj),
            jnp.asarray(write),
        )

    def _alloc_inactive(self, n: int) -> np.ndarray:
        """Ring-allocate n inactive slots (oldest entries are overwritten)."""
        slots = (self.inac_next + np.arange(n)) % self.inactive_pad
        self.inac_next = int((self.inac_next + n) % self.inactive_pad)
        return slots.astype(np.int64)

    def _deactivate(self, slots: np.ndarray, store: bool):
        slots = np.asarray(slots, np.int64)
        if slots.size == 0:
            return
        self._topology_version += 1
        drop = np.zeros(self.edge_pad, bool)
        drop[slots] = True
        dst = np.zeros(self.edge_pad, np.int32)
        store_mask = np.zeros(self.edge_pad, bool)
        store_slots = slots
        if store and len(store_slots) > self.inactive_pad:
            # ring-allocating more than the ring holds would hand DUPLICATE
            # destination slots to the scatter, whose winner is unspecified
            # in XLA while the host bookkeeping takes numpy's last write —
            # the two could disagree. Store only the newest `inactive_pad`
            # edges of the batch (the rest would be overwritten immediately);
            # ALL dropped edges still deactivate.
            store_slots = store_slots[-self.inactive_pad:]
        if store:
            inac_slots = self._alloc_inactive(len(store_slots))
            dst[store_slots] = inac_slots
            store_mask[store_slots] = True
            self.ii_inac[inac_slots] = self.ii[store_slots]
            self.jj_inac[inac_slots] = self.jj[store_slots]
            self.valid_inac[inac_slots] = True
        self.valid[slots] = False

        self.edges, self.inactive = _deactivate_kernel(
            self.edges,
            self.inactive,
            jnp.asarray(drop),
            jnp.asarray(dst),
            jnp.asarray(store_mask),
        )

    def rm_factors(self, mask: np.ndarray, store: bool = False):
        """mask: [Nmax] bool over slots (only valid slots considered)."""
        slots = np.nonzero(mask & self.valid)[0]
        self._deactivate(slots, store=store)

    def filter_edges(self):
        """Remove edges with weak confidence (factor_graph.py:71-78).

        API parity: like the reference, the shipped pipeline never calls
        this (the frontend prunes via rm_factors/rm_keyframe instead); it
        is kept for users who drive FactorGraph directly, and pinned by
        tests/test_factor_graph.py::test_filter_edges_drops_weak_long_range.
        """
        conf = np.asarray(_edge_confidence_kernel(self.edges))
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001) & self.valid
        for s in np.nonzero(mask)[0]:
            self.bad_edges.add((int(self.ii[s]), int(self.jj[s])))
        self.rm_factors(mask, store=False)

    def rm_keyframe(self, ix: int):
        """Remove keyframe ix: shift video buffers down, reindex/drop edges
        (factor_graph.py:166-195)."""
        self._topology_version += 1
        v = self.video
        jx = jnp.int32(ix)
        for name in (
            "tstamp", "images", "poses", "disps", "disps_sens", "disps_up",
            "intrinsics", "fmaps", "nets", "inps",
        ):
            setattr(v, name, _shift_down_kernel(getattr(v, name), jx))
        # the persistent per-frame damping memory is indexed by absolute
        # frame id too (the fused engine shifts its copy; leaving this one
        # behind applies frame k+1's damping to frame k after a cull)
        self.damping = _shift_down_kernel(self.damping, jx)

        # inactive edges: drop those touching ix, shift the rest
        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.valid_inac &= ~m
        self.ii_inac = np.where(self.ii_inac > ix, self.ii_inac - 1, self.ii_inac)
        self.jj_inac = np.where(self.jj_inac > ix, self.jj_inac - 1, self.jj_inac)
        self.inactive = self.inactive._replace(
            ii=jnp.asarray(self.ii_inac),
            jj=jnp.asarray(self.jj_inac),
            valid=jnp.asarray(self.valid_inac),
        )

        self.bad_edges = {
            (i - (i > ix), j - (j > ix))
            for (i, j) in self.bad_edges
            if i != ix and j != ix
        }

        # active edges: drop those touching ix, shift the rest
        m = ((self.ii == ix) | (self.jj == ix)) & self.valid
        self.ii = np.where(self.ii > ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj > ix, self.jj - 1, self.jj)
        self.edges = self.edges._replace(
            ii=jnp.asarray(self.ii), jj=jnp.asarray(self.jj)
        )
        self.rm_factors(m, store=False)

    def clear_edges(self):
        self._topology_version += 1
        self.rm_factors(self.valid.copy(), store=False)

    # --------------------------------------------------------------- update

    def _sync_device_edges(self):
        self.edges = self.edges._replace(
            ii=jnp.asarray(self.ii),
            jj=jnp.asarray(self.jj),
            valid=jnp.asarray(self.valid),
        )

    def update(
        self,
        t0: Optional[int] = None,
        t1: Optional[int] = None,
        itrs: int = 2,
        use_inactive: bool = False,
        EP: float = 1e-7,
        motion_only: bool = False,
    ):
        """One operator iteration (factor_graph.py:199-251)."""
        if self.num_active == 0:
            return
        active_ii = self.ii[self.valid]
        active_jj = self.jj[self.valid]
        if t0 is None:
            t0 = max(1, int(active_ii.min()) + 1)
        if t1 is None:
            t1 = max(int(active_ii.max()), int(active_jj.max())) + 1
        assert t1 - t0 <= self.window_pad, f"window {t1 - t0} > pad {self.window_pad}"

        kf0 = max(0, min(int(active_ii.min()), t0) - 1)
        agg_frames = self.window_pad + 8

        self._sync_device_edges()

        # Schur pair schedule over (inactive ∥ active) edge blocks
        if use_inactive:
            inac_ok = (
                self.valid_inac
                & (self.ii_inac >= t0 - 3)
                & (self.jj_inac >= t0 - 3)
            )
            ba_ii = np.concatenate([self.ii_inac, self.ii])
            ba_jj = np.concatenate([self.jj_inac, self.jj])
            ba_valid = np.concatenate([inac_ok, self.valid])
        else:
            ba_ii, ba_jj, ba_valid = self.ii, self.jj, self.valid

        # the frontend calls update() 4-6x per keyframe with UNCHANGED edge
        # topology — cache the host-built pair schedule on its inputs (the
        # per-edit bump of _topology_version invalidates it)
        key = (
            self._topology_version, int(t0), int(t1), bool(use_inactive)
        )
        if getattr(self, "_pairs_key", None) == key:
            pairs = self._pairs_cache
        else:
            pairs = ba_ops.SchurPairs.build(
                ba_ii, ba_jj, ba_valid, t0, t1, self.window_pad,
                pad_floor=self.schur_pair_floor,
            )
            self._pairs_key, self._pairs_cache = key, pairs

        (
            self.video.poses,
            self.video.disps,
            self.edges,
            self.damping,
            self.video.disps_up,
        ) = self._update_step(
            self.params,
            self.video.poses,
            self.video.disps,
            self.video.intrinsics,
            self.video.disps_sens,
            self.edges,
            self.damping,
            self.video.disps_up,
            self.video.fmaps,
            self.video.inps,
            self.inactive,
            pairs,
            jnp.int32(t0),
            jnp.int32(t1),
            jnp.int32(kf0),
            self.window_pad,
            agg_frames,
            itrs,
            use_inactive,
            motion_only,
            EP,
        )

        self.age[self.valid] += 1
        self.video.dirty[int(active_ii.min()) : t1] = True

    def update_lowmem(
        self,
        t0: int = 1,
        t1: Optional[int] = None,
        itrs: int = 2,
        steps: int = 8,
        EP: float = 1e-7,
        mesh=None,
    ):
        """Global-BA iterations with on-the-fly correlation
        (factor_graph.py:255-302). lm=1e-5/ep=1e-2 as in the reference.

        With ``mesh`` (a jax.sharding.Mesh with a 'ba' axis), the GN solve of
        every step runs through the edge-sharded distributed BA
        (parallel/sharded_ba.py) instead of the single-device solver: the
        update operator produces targets/weights as usual, then the per-edge
        linearisation + Schur reduction is sharded over the mesh with one
        psum of the pose system per iteration."""
        # resolved per call, NOT lazily cached on self: do_ba depends on
        # mesh-ness, and a step built for one mode must not serve the other
        # (_build_lowmem_step is lru_cached, so this is free after the first
        # call per mode)
        chunk = getattr(self.video.config, "backend_chunk", 256)
        # cap the chunk by the AltCorr working set: each chunk materialises
        # a [chunk, h, w, h·w] correlation block (bf16), so the configured
        # chunk (tuned at 240×320, hw=1200 — CLAUDE.md A/B) must shrink at
        # larger grids. Budget ~1.2 GB: at 384×512 (hw=3072) that caps the
        # chunk at 64 (an unscaled 256-chunk block alone is 4.5 GB and
        # OOM'd the reference-scale long loop, r5).
        hw = self.h * self.w
        bytes_per = 2 if getattr(
            self.video.config, "compute_dtype", "float32") == "bfloat16" else 4
        cap = max(32, int(2 ** np.floor(
            np.log2(max(1.2e9 / (hw * hw * bytes_per), 32))
        )))
        chunk = min(chunk, cap)
        self._lowmem_step = _build_lowmem_step(
            self.video.config.stereo,
            chunk=chunk,
            upsample=self.upsample,
            do_ba=(mesh is None),
            dtype=getattr(self.video.config, "compute_dtype", "float32"),
        )
        t = self.video.counter
        if t1 is None:
            t1 = t
        if t1 - t0 <= 0:
            return  # nothing to optimize (degenerate run with ≤1 keyframe)
        # pad the window to a multiple of 32 for compile reuse across calls
        window = max(min(-(-(t1 - t0) // 32) * 32, self.video.config.buffer), 1)

        self._sync_device_edges()
        # process only the OCCUPIED chunk prefix of the edge store: the
        # store is padded to a power of two (4096 at the bench's 200-kf
        # scale) while e.g. 3138 slots are live — running the update-op
        # loop over the dead ~25% cost a fifth of every backend step
        # (the chunk loop is ~80% of the 0.53 s step; r4 trace). Slots are
        # sliced to the highest valid index so non-prefix stores (after
        # rm_factors) stay correct, just less tightly.
        occupied = np.nonzero(self.valid)[0]
        if len(occupied) == 0:
            return
        hi = int(occupied.max()) + 1
        n_used = min(-(-hi // chunk) * chunk, self.edge_pad)
        edges_dev = jax.tree.map(lambda x: x[:n_used], self.edges)
        pairs = ba_ops.SchurPairs.build(
            self.ii[:n_used], self.jj[:n_used], self.valid[:n_used],
            t0, t1, window, pad_floor=self.schur_pair_floor,
        )
        plan = plan_consts = None
        if mesh is not None:
            from ..parallel.sharded_ba import (
                ShardedBAPlan,
                place_plan_constants,
                sharded_ba_solve,
            )

            plan = ShardedBAPlan.build(
                self.ii[:n_used], self.jj[:n_used], self.valid[:n_used],
                mesh.shape["ba"], t, t0, t1,
            )
            # the plan's index arrays are per-topology constants: place them
            # on the mesh once, not once per GN step
            plan_consts = place_plan_constants(mesh, plan)
        for _ in range(steps):
            (
                self.video.poses,
                self.video.disps,
                edges_dev,
                self.damping,
                self.video.disps_up,
            ) = self._lowmem_step(
                self.params,
                self.video.poses,
                self.video.disps,
                self.video.intrinsics,
                self.video.disps_sens,
                edges_dev,
                self.damping,
                self.video.disps_up,
                self.video.fmaps,
                self.video.inps,
                pairs,
                jnp.int32(t0),
                jnp.int32(t1),
                window,
                itrs,
                ep=EP,  # the mesh branch uses EP too — keep the paths equal
            )
            if mesh is not None:
                self.video.poses, self.video.disps = sharded_ba_solve(
                    mesh,
                    plan,
                    edges_dev.target,
                    edges_dev.weight,
                    0.2 * self.damping + EP,
                    self.video.poses,
                    self.video.disps,
                    self.video.intrinsics[0],
                    self.video.disps_sens,
                    t0,
                    t1,
                    window,
                    iterations=itrs,
                    constants=plan_consts,
                )
            self.video.dirty[:t] = True
        # write the optimized per-edge state back into the full store (the
        # tail past n_used holds only invalid slots)
        if n_used < self.edge_pad:
            self.edges = jax.tree.map(
                lambda part, full: jnp.concatenate([part, full[n_used:]], 0),
                edges_dev, self.edges,
            )
        else:
            self.edges = edges_dev

    # --------------------------------------------------- edge construction

    def add_neighborhood_factors(self, t0: int, t1: int, r: int = 3):
        """|i − j| ≤ r edges (factor_graph.py:304-314)."""
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1), indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        c = 1 if self.video.config.stereo else 0
        keep = (np.abs(ii - jj) > c) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(
        self,
        t0: int = 0,
        t1: int = 0,
        rad: int = 2,
        nms: int = 2,
        beta: float = 0.25,
        thresh: float = 16.0,
        remove: bool = False,
    ):
        """Distance-ranked greedy edge selection with Chebyshev-ball NMS
        (factor_graph.py:317-381). Selection runs on the host over a small
        [t, t] matrix; the distances come from one jitted kernel call."""
        t = self.video.counter
        if t - t0 <= 0 or t - t1 <= 0:
            return
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)

        d = self.video.distance(ii, jj, beta=beta, bidirectional=True).astype(np.float64)
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf
        d = d.reshape(len(ix), len(jx))

        def suppress(i, j):
            """NMS ball around a chosen edge."""
            r = max(min(abs(i - j) - 2, nms), 0)
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= r:
                        i1, j1 = i + di, j + dj
                        if t0 <= i1 < t and t1 <= j1 < t:
                            d[i1 - t0, j1 - t1] = np.inf

        for (i, j) in self.edge_set | self.bad_edges:
            suppress(i, j)

        es = []
        for i in range(t0, t):
            if self.video.config.stereo:
                es.append((i, i))
                if t1 <= i < t:
                    d[i - t0, i - t1] = np.inf
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                if t1 <= j < t:
                    d[i - t0, j - t1] = np.inf

        flat = d.reshape(-1)
        order = np.argsort(flat)
        n_i, n_j = d.shape
        for k in order:
            if flat[k] > thresh:
                continue
            if len(es) > self.max_factors:
                break
            i = int(ii[k])
            j = int(jj[k])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)
            flat = d.reshape(-1)

        if es:
            es_arr = np.asarray(es, np.int32)
            self.add_factors(es_arr[:, 0], es_arr[:, 1], remove)
