"""Fused on-device tracking: the ENTIRE per-frame SLAM update as one jitted
program with zero host synchronisation.

The reference crosses the Python↔C++ boundary and synchronises the host at
every stage of `Droid.track` (motion-filter decision, proximity distances,
keyframe-cull test — droid.py:62-73, motion_filter.py:83, factor_graph.py:
317-381, droid_frontend.py:57-65). The host-driven runtime in this package
(`frontend.py`/`factor_graph.py`) mirrors that structure and pays ≥3 blocking
device round-trips per frame — which caps throughput hard when the device is
remote and still wastes 100s of µs locally.

This module is the TPU-native answer: ALL runtime state (keyframe buffers,
factor-graph slots, inactive store, counters, flags) lives in one device
pytree, and `track_step(state, frame)` executes motion filter + keyframe
append + graph maintenance (aged-edge culling, proximity/NMS edge selection,
keyframe removal) + the operator iterations + windowed dense-Schur BA under a
single `jax.jit`, with `lax.cond`/`lax.fori_loop` for the data-dependent
control flow the reference does in Python. The host only streams frames and
reads state at termination: frames pipeline through the async dispatch queue
back-to-back.

Semantics follow droid_frontend.py / factor_graph.py / motion_filter.py; the
one deliberate difference is the BA Schur complement, which uses the dense
windowed formulation (`ops.ba.ba_iteration_dense_window`) instead of a
host-enumerated sparse-pair schedule.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.droid_net import DroidNet, normalize_images
from ..models.update import UpdateModule, upsample_disp
from ..ops import ba as ba_ops
from ..ops import corr as corr_ops
from ..ops import lie
from ..ops import projective as pops

Array = jax.Array

# Static upper bound on greedy proximity picks per update (each pick adds 2
# directed edges). The actual number of picks is gated at trace time by the
# same running edge-count budget the host loop uses
# (factor_graph.py:805-818: pick while len(es) <= max_factors), so the two
# engines build identical graphs; this only sizes the lax.scan.
def _n_greedy(max_factors: int) -> int:
    return max_factors // 2 + 1


class SLAMState(NamedTuple):
    """All SLAM runtime state, device-resident."""

    # keyframe video (depth_video.py:24-45 layout)
    tstamp: Array  # [B]
    images: Array  # [B, H, W, 3] uint8
    poses: Array  # [B, 7]
    disps: Array  # [B, h, w]
    disps_sens: Array  # [B, h, w]
    intrinsics: Array  # [B, 4] (1/8 res)
    fmaps: Array  # [B, rig, h, w, 128]
    nets: Array  # [B, h, w, 128]
    inps: Array  # [B, h, w, 128]
    # float32 features of the LAST keyframe, feeding the motion-filter probe
    # only: keyframe DECISIONS must not depend on the compute dtype (bf16
    # changed keyframe sets on marginal sequences; the reference decides in
    # f32, motion_filter.py:83), so the probe runs in f32 regardless of
    # config.compute_dtype. ~1.5 MB — the full buffers stay compact.
    pfmap: Array  # [rig, h, w, 128] f32
    pnet: Array  # [h, w, 128] f32
    pinp: Array  # [h, w, 128] f32
    counter: Array  # int32 scalar — keyframe count
    # frontend
    t1: Array  # int32 — frames tracked by the frontend
    is_init: Array  # bool
    # factor graph (padded slots)
    ii: Array  # [Nmax]
    jj: Array
    age: Array
    valid: Array
    enet: Array  # [Nmax, h, w, 128]
    target: Array  # [Nmax, h, w, 2]
    weight: Array
    # inactive edge ring
    inac_ii: Array  # [K]
    inac_jj: Array
    inac_valid: Array
    inac_target: Array
    inac_weight: Array
    inac_next: Array  # int32 ring pointer
    # per-frame damping memory (factor_graph.py:31 damping)
    damping: Array  # [B, h, w]
    # full-res disparities (depth_video.py disps_up); [1,1,1] dummy unless
    # config.upsample — the upsample einsum is skipped statically when off
    disps_up: Array  # [B, H, W] or [1, 1, 1]


def init_state(config) -> SLAMState:
    B = config.buffer
    H, W = config.image_size
    h, w = config.feat_size
    rig = 2 if config.stereo else 1
    Nmax = _edge_slots(config)
    K = config.inactive_pad
    f32 = jnp.float32
    # matching features only feed the correlation matmuls — store them in the
    # compute dtype (bfloat16 by default) to halve gather traffic per iteration
    cdt = jnp.dtype(getattr(config, "compute_dtype", "float32"))
    return SLAMState(
        tstamp=jnp.zeros((B,), f32),
        images=jnp.zeros((B, H, W, 3), jnp.uint8),
        poses=jnp.tile(lie.identity((1,)), (B, 1)),
        disps=jnp.ones((B, h, w), f32),
        disps_sens=jnp.zeros((B, h, w), f32),
        intrinsics=jnp.zeros((B, 4), f32),
        fmaps=jnp.zeros((B, rig, h, w, 128), cdt),
        # hidden/context state also lives in the compute dtype: the convs run
        # bf16 anyway, and f32 storage forced a convert pass per conv input
        nets=jnp.zeros((B, h, w, 128), cdt),
        inps=jnp.zeros((B, h, w, 128), cdt),
        pfmap=jnp.zeros((rig, h, w, 128), f32),
        pnet=jnp.zeros((h, w, 128), f32),
        pinp=jnp.zeros((h, w, 128), f32),
        counter=jnp.int32(0),
        t1=jnp.int32(0),
        is_init=jnp.bool_(False),
        ii=jnp.zeros((Nmax,), jnp.int32),
        jj=jnp.zeros((Nmax,), jnp.int32),
        age=jnp.zeros((Nmax,), jnp.int32),
        valid=jnp.zeros((Nmax,), bool),
        enet=jnp.zeros((Nmax, h, w, 128), cdt),
        target=jnp.zeros((Nmax, h, w, 2), f32),
        weight=jnp.zeros((Nmax, h, w, 2), f32),
        inac_ii=jnp.zeros((K,), jnp.int32),
        inac_jj=jnp.zeros((K,), jnp.int32),
        inac_valid=jnp.zeros((K,), bool),
        inac_target=jnp.zeros((K, h, w, 2), f32),
        inac_weight=jnp.zeros((K, h, w, 2), f32),
        inac_next=jnp.int32(0),
        damping=1e-6 * jnp.ones((B, h, w), f32),
        disps_up=jnp.zeros((B, H, W) if config.upsample else (1, 1, 1), f32),
    )


# -----------------------------------------------------------------------------
# device-side geometry helpers
# -----------------------------------------------------------------------------


# the masked flow-magnitude distance kernel and the window persist/read
# helpers are SHARED with the host-loop engine (runtime/video.py) — single
# source of truth for the numeric semantics the two engines are
# cross-validated on (src/droid_kernels_cpu.cc:389-472)
from .video import _frame_distance, persist_window, read_window  # noqa: E402


def _bidir_distance(st: SLAMState, ii, jj, beta):
    d1 = _frame_distance(st.poses, st.disps, st.intrinsics[0], ii, jj, beta)
    d2 = _frame_distance(st.poses, st.disps, st.intrinsics[0], jj, ii, beta)
    return 0.5 * (d1 + d2)


# -----------------------------------------------------------------------------
# masked graph edits
# -----------------------------------------------------------------------------


def _rm_factors(st: SLAMState, drop: Array, store: bool) -> SLAMState:
    """Deactivate edges; optionally move them to the inactive ring
    (factor_graph.py:138-162)."""
    K = st.inac_ii.shape[0]
    if store:
        order = jnp.cumsum(drop.astype(jnp.int32)) - 1
        dst = jnp.where(drop, (st.inac_next + order) % K, K)  # K → dropped
        st = st._replace(
            inac_ii=st.inac_ii.at[dst].set(st.ii, mode="drop"),
            inac_jj=st.inac_jj.at[dst].set(st.jj, mode="drop"),
            inac_valid=st.inac_valid.at[dst].set(True, mode="drop"),
            inac_target=st.inac_target.at[dst].set(st.target, mode="drop"),
            inac_weight=st.inac_weight.at[dst].set(st.weight, mode="drop"),
            inac_next=(st.inac_next + jnp.sum(drop)) % K,
        )
    return st._replace(valid=st.valid & ~drop)


def _edge_slots(config) -> int:
    """Static capacity of the active edge store. max_factors is the
    reference's eviction/budget THRESHOLD, not a capacity — remove=False
    appends past it during initialization, whose |i-j|<=3 neighborhood alone
    is 6*warmup - 12 edges (factor_graph.py:102-107): a store capped at
    max_factors silently dropped HALF the tum/euroc init graph. Every update
    iteration pays compute over all slots (masked), so the store is sized to
    the init neighborhood, not beyond: the few init greedy picks that would
    exceed it are dropped (a deliberate approximation; steady state is
    budget-evicted to max_factors anyway)."""
    init_peak = 6 * config.warmup - 12 + (config.warmup if config.stereo else 0)
    return -(-max(config.max_factors, init_peak) // 8) * 8


def _add_edges(
    st: SLAMState,
    cand_ii: Array,  # [C]
    cand_jj: Array,
    cand_ok: Array,  # [C] bool
    evict: Array,  # bool scalar — LRU-evict to make room (frontend remove=True)
    budget: int = None,  # static eviction threshold (config.max_factors)
) -> SLAMState:
    """Masked add_factors (factor_graph.py:86-135): dedup against existing
    edges and within the batch, optionally evict oldest, write new slots.
    With evict, the active COUNT is held at `budget` (reference
    factor_graph.py:102-107), not merely at the store capacity."""
    Nmax = st.ii.shape[0]
    cap = budget if budget is not None else Nmax
    C = cand_ii.shape[0]

    # dedup vs active + inactive stores
    def is_dup(ci, cj):
        a = jnp.any(st.valid & (st.ii == ci) & (st.jj == cj))
        b = jnp.any(st.inac_valid & (st.inac_ii == ci) & (st.inac_jj == cj))
        return a | b

    dup = jax.vmap(is_dup)(cand_ii, cand_jj)
    # dedup within the candidate list (keep first occurrence)
    same = (cand_ii[:, None] == cand_ii[None, :]) & (cand_jj[:, None] == cand_jj[None, :])
    earlier = same & (jnp.arange(C)[None, :] < jnp.arange(C)[:, None]) & cand_ok[None, :]
    dup_in_batch = jnp.any(earlier, axis=1)
    ok = cand_ok & ~dup & ~dup_in_batch

    n_new = jnp.sum(ok)
    need = jnp.maximum(jnp.sum(st.valid) + n_new - cap, 0)

    # LRU eviction by age (only when evict flag set)
    age_key = jnp.where(st.valid, st.age, -1)
    evict_order = jnp.argsort(-age_key)  # oldest valid first
    evict_rank = jnp.zeros((Nmax,), jnp.int32).at[evict_order].set(jnp.arange(Nmax))
    drop = st.valid & (evict_rank < jnp.where(evict, need, 0))
    st = _rm_factors(st, drop, store=True)

    # assign candidates to free slots (invalid-first stable order)
    slot_order = jnp.argsort(st.valid.astype(jnp.int32), stable=True)
    ranks = jnp.cumsum(ok.astype(jnp.int32)) - 1
    n_free2 = Nmax - jnp.sum(st.valid)
    write = ok & (ranks < n_free2)
    slots = jnp.where(write, slot_order[jnp.clip(ranks, 0, Nmax - 1)], Nmax)

    # new-edge state: hidden from source keyframe, target = reprojection
    tgt, _ = pops.projective_transform(
        st.poses, st.disps, st.intrinsics, cand_ii, cand_jj
    )
    net_new = jnp.take(st.nets, cand_ii, axis=0)

    return st._replace(
        ii=st.ii.at[slots].set(cand_ii, mode="drop"),
        jj=st.jj.at[slots].set(cand_jj, mode="drop"),
        age=st.age.at[slots].set(0, mode="drop"),
        valid=st.valid.at[slots].set(True, mode="drop"),
        enet=st.enet.at[slots].set(net_new, mode="drop"),
        target=st.target.at[slots].set(tgt, mode="drop"),
        weight=st.weight.at[slots].set(0.0, mode="drop"),
    )


def _rm_keyframe(st: SLAMState, ix: Array) -> SLAMState:
    """Remove keyframe ix: shift buffers down, drop/reindex edges
    (factor_graph.py:166-195)."""
    B = st.poses.shape[0]
    idx = jnp.arange(B)
    src = jnp.where(idx >= ix, jnp.minimum(idx + 1, B - 1), idx)

    def shift(buf):
        return jnp.take(buf, src, axis=0)

    st = st._replace(
        tstamp=shift(st.tstamp),
        images=shift(st.images),
        poses=shift(st.poses),
        disps=shift(st.disps),
        disps_sens=shift(st.disps_sens),
        intrinsics=shift(st.intrinsics),
        fmaps=shift(st.fmaps),
        nets=shift(st.nets),
        inps=shift(st.inps),
        damping=shift(st.damping),
        disps_up=shift(st.disps_up) if st.disps_up.shape[0] == B else st.disps_up,
    )

    touching = st.valid & ((st.ii == ix) | (st.jj == ix))
    st = st._replace(
        valid=st.valid & ~touching,
        ii=jnp.where(st.ii > ix, st.ii - 1, st.ii),
        jj=jnp.where(st.jj > ix, st.jj - 1, st.jj),
    )
    inac_touching = st.inac_valid & ((st.inac_ii == ix) | (st.inac_jj == ix))
    return st._replace(
        inac_valid=st.inac_valid & ~inac_touching,
        inac_ii=jnp.where(st.inac_ii > ix, st.inac_ii - 1, st.inac_ii),
        inac_jj=jnp.where(st.inac_jj > ix, st.inac_jj - 1, st.inac_jj),
    )


# -----------------------------------------------------------------------------
# proximity edge selection (device NMS + greedy, factor_graph.py:317-381)
# -----------------------------------------------------------------------------


def _suppression_radius(i, j, nms):
    return jnp.maximum(jnp.minimum(jnp.abs(i - j) - 2, nms), 0)


def _proximity_candidates(
    st: SLAMState,
    t0: Array,  # candidate source range [t0, t)
    t1r: Array,  # candidate target range [t1r, t)
    rows: int,  # static pad of the source range
    cols: int,  # static pad of the target range
    rad: int,
    nms: int,
    thresh: float,
    beta: float,
    stereo: bool,
    max_factors: int,
):
    """Distance-ranked greedy proximity edges with NMS, fully on device.

    Returns (cand_ii, cand_jj, cand_ok) of static length
    rows·(rad+1)·2 [+rows stereo] + 2·n_greedy. Greedy picks stop when the
    running directed-edge count (base + picks) would exceed ``max_factors``,
    matching the host loop's `len(es) > max_factors` break.
    """
    t = st.counter
    i_abs = t0 + jnp.arange(rows)  # [rows]
    j_abs = t1r + jnp.arange(cols)  # [cols]
    i_ok = i_abs < t
    j_ok = j_abs < t

    ii_g = jnp.broadcast_to(i_abs[:, None], (rows, cols))
    jj_g = jnp.broadcast_to(j_abs[None, :], (rows, cols))

    d = _bidir_distance(st, ii_g.reshape(-1), jj_g.reshape(-1), beta).reshape(rows, cols)
    inf = jnp.float32(jnp.inf)
    d = jnp.where(i_ok[:, None] & j_ok[None, :], d, inf)
    d = jnp.where(ii_g - rad < jj_g, inf, d)  # only i ≥ j + rad candidates
    d = jnp.where(d > 100.0, inf, d)

    def suppress(d, si, sj, r):
        """NMS ball |di|+|dj| ≤ r around absolute edge (si, sj)."""
        ball = (jnp.abs(ii_g - si) + jnp.abs(jj_g - sj)) <= r
        return jnp.where(ball, inf, d)

    # suppress around every existing (active + inactive) edge
    ex_i = jnp.concatenate([st.ii, st.inac_ii])
    ex_j = jnp.concatenate([st.jj, st.inac_jj])
    ex_ok = jnp.concatenate([st.valid, st.inac_valid])

    # one broadcast compare-reduce over all existing edges, NOT a fori_loop:
    # a serial chain of ~150 tiny elementwise kernels per track step
    # serializes on the VPU (the scalar-chain pattern CLAUDE.md flags)
    ex_r = _suppression_radius(ex_i, ex_j, nms)  # [E]
    ex_ball = (
        jnp.abs(ii_g[None] - ex_i[:, None, None])
        + jnp.abs(jj_g[None] - ex_j[:, None, None])
    ) <= ex_r[:, None, None]
    d = jnp.where(jnp.any(ex_ball & ex_ok[:, None, None], axis=0), inf, d)

    # base edges: temporal neighbors (i, j) for j ∈ [i−rad−1, i), both
    # directions (+ stereo self edges), with their cells suppressed.
    # j ascends to match the host candidate order (factor_graph.py:793-803)
    # so slot assignment agrees when capacity binds.
    base_ii, base_jj, base_ok = [], [], []
    for r_i in range(rows):
        i = i_abs[r_i]
        if stereo:
            base_ii.append(i)
            base_jj.append(i)
            base_ok.append(i_ok[r_i])
        for doff in range(rad + 1, 0, -1):
            j = i - doff
            ok = i_ok[r_i] & (j >= 0)
            base_ii.extend([i, j])
            base_jj.extend([j, i])
            base_ok.extend([ok, ok])
    base_ii = jnp.stack(base_ii)
    base_jj = jnp.stack(base_jj)
    base_ok = jnp.stack(base_ok)

    base_cell = (
        (ii_g[None] == base_ii[:, None, None])
        & (jj_g[None] == base_jj[:, None, None])
        & base_ok[:, None, None]
    )
    d = jnp.where(jnp.any(base_cell, axis=0), inf, d)
    if stereo:
        # also suppress all self cells
        d = jnp.where(ii_g == jj_g, inf, d)

    # greedy selection: up to n_greedy picks, each adds (i, j) and (j, i);
    # budget-gated exactly like the host loop (base edges count too)
    n_base = jnp.sum(base_ok.astype(jnp.int32))

    def pick(carry, _):
        d, cnt = carry
        k = jnp.argmin(d.reshape(-1))
        best = d.reshape(-1)[k]
        si = ii_g.reshape(-1)[k]
        sj = jj_g.reshape(-1)[k]
        ok = (best <= thresh) & (cnt <= max_factors)
        r = _suppression_radius(si, sj, nms)
        d = jnp.where(ok, suppress(d, si, sj, r), d)
        cnt = cnt + jnp.where(ok, 2, 0)
        return (d, cnt), (si, sj, ok)

    (_, _), (gi, gj, gok) = jax.lax.scan(
        pick, (d, n_base), None, length=_n_greedy(max_factors)
    )

    cand_ii = jnp.concatenate([base_ii, gi, gj])
    cand_jj = jnp.concatenate([base_jj, gj, gi])
    cand_ok = jnp.concatenate([base_ok, gok, gok])
    return cand_ii.astype(jnp.int32), cand_jj.astype(jnp.int32), cand_ok


# -----------------------------------------------------------------------------
# the fused track step
# -----------------------------------------------------------------------------


def build_track_step(params, config):
    """Return the jitted zero-sync track step for fixed params/config."""
    cdt = jnp.dtype(getattr(config, "compute_dtype", "float32"))
    # encoders stay float32: the 3-channel stem is layout-bound and measured
    # FASTER in f32 (1.3 ms vs 1.9 ms bf16 at 240x320); the channel-heavy
    # update operator takes the bf16 MXU speedup
    model = DroidNet()
    update_op = UpdateModule(dtype=cdt)
    update_params = {"params": params["params"]["update"]}

    h, w = config.feat_size
    hw = h * w
    Nmax = config.max_factors
    K = config.inactive_pad
    Pw = config.window_pad
    Ka = Pw + 8
    stereo = config.stereo
    warmup = config.warmup
    beta = config.beta

    # the motion-filter probe runs in f32 so keyframe decisions are
    # dtype-invariant (matches the host engine's MotionFilter and the
    # reference, motion_filter.py:83)
    update_op32 = UpdateModule()

    def fnet32(image):
        return model.apply(
            params, normalize_images(image), method=lambda m, x: m.fnet(x)
        )

    def cnet32(image):
        ctx = model.apply(
            params, normalize_images(image[None]), method=lambda m, x: m.cnet(x)
        )[0].astype(jnp.float32)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return jnp.tanh(net), jax.nn.relu(inp)

    # ---------------- one operator iteration (factor_graph.py:199-251) -----

    def update_iteration(st: SLAMState, fixed_t0: Array) -> SLAMState:
        ii, jj, valid = st.ii, st.jj, st.valid

        big = jnp.int32(10**6)
        min_ii = jnp.min(jnp.where(valid, ii, big))
        max_any = jnp.max(jnp.where(valid, jnp.maximum(ii, jj), -1))
        t0 = jnp.where(fixed_t0 > 0, fixed_t0, jnp.maximum(1, min_ii + 1))
        t1 = max_any + 1
        # never let the BA window outgrow the static window_pad: raise t0 so
        # poses older than t1 - Pw FREEZE (sliding-window semantics, the
        # fixedp treatment) instead of silently losing their Hessian blocks
        # to the dense-window scatter's range masks (ops/ba.py _scatter_mat)
        t0 = jnp.maximum(t0, t1 - Pw)
        kf0 = jnp.clip(jnp.minimum(min_ii, t0) - 1, 0, st.poses.shape[0] - 1)

        coords0 = pops.coords_grid(h, w)
        coords1, _ = pops.projective_transform(
            st.poses, st.disps, st.intrinsics, ii, jj
        )
        motn = jnp.clip(
            jnp.concatenate([coords1 - coords0, st.target - coords1], -1),
            -64.0, 64.0,
        )

        fmap1 = st.fmaps[ii, 0]
        if stereo:
            fmap2 = st.fmaps[jj, (ii == jj).astype(jnp.int32)]
        else:
            fmap2 = st.fmaps[jj, 0]
        corr = corr_ops.corr_lookup_fused(fmap1, fmap2, coords1)

        net, delta, wgt, eta_win, upmask = update_op.apply(
            update_params,
            st.enet,
            jnp.take(st.inps, ii, axis=0),
            corr,
            motn,
            jnp.clip(ii - kf0, 0, Ka - 1),
            Ka,
            valid,
        )
        target = coords1 + delta
        st = st._replace(enet=net.astype(st.enet.dtype), target=target, weight=wgt)

        # persist damping at frames touched by active edges
        touched = (
            jax.ops.segment_sum(
                valid.astype(jnp.int32), jnp.clip(ii - kf0, 0, Ka - 1),
                num_segments=Ka,
            )
            > 0
        )
        st = st._replace(damping=persist_window(st.damping, eta_win, touched, kf0))

        # BA over active + inactive edges (use_inactive=True)
        inac_ok = st.inac_valid & (st.inac_ii >= t0 - 3) & (st.inac_jj >= t0 - 3)
        ba_ii = jnp.concatenate([st.inac_ii, ii])
        ba_jj = jnp.concatenate([st.inac_jj, jj])
        ba_ok = jnp.concatenate([inac_ok, valid])
        ba_tgt = jnp.concatenate([st.inac_target, target])
        ba_wgt = jnp.concatenate([st.inac_weight, wgt])

        kf0_ba = jnp.clip(
            jnp.min(jnp.where(ba_ok, ba_ii, big)), 0, st.poses.shape[0] - 1
        )
        eta_full = 0.2 * st.damping + 1e-7

        def gn(i, pd):
            p, d = pd
            return ba_ops.ba_iteration_dense_window(
                p, d, st.intrinsics[0], st.disps_sens,
                ba_tgt, ba_wgt, eta_full, ba_ii, ba_jj, ba_ok,
                t0, t1, kf0_ba, Pw, Ka,
                schur_dtype=str(cdt),
            )

        poses, disps = jax.lax.fori_loop(0, 2, gn, (st.poses, st.disps))
        disps = jnp.clip(disps, 0.001, None)
        st = st._replace(
            poses=poses, disps=disps, age=st.age + valid.astype(jnp.int32)
        )

        if config.upsample:
            # full-res disparity maintenance (depth_video.py:126-130) over the
            # aggregation window, masked to frames touched by active edges
            win = read_window(disps, kf0, Ka)
            up_win = upsample_disp(win, upmask.astype(jnp.float32))
            st = st._replace(
                disps_up=persist_window(st.disps_up, up_win, touched, kf0)
            )

        return st

    # ------------------------------ track step -----------------------------

    @functools.partial(jax.jit, donate_argnums=(0,))
    def track_step(
        st: SLAMState,
        tstamp: Array,
        image: Array,  # [rig, H, W, 3] uint8
        intrinsics: Array,  # [4] full-res
        disp_sens: Array,  # [h, w] inverse-depth prior (zeros if none)
    ) -> SLAMState:
        # ---- motion filter (motion_filter.py:45-93) ----
        fmap32 = fnet32(image.astype(jnp.float32))  # [rig, h, w, 128] f32
        fmap = fmap32.astype(cdt)

        def probe(_):
            coords0 = pops.coords_grid(h, w)[None]
            corr = corr_ops.corr_lookup_fused(
                st.pfmap[0][None], fmap32[0][None], coords0
            )
            _, delta, _ = update_op32.apply(
                update_params,
                st.pnet[None],
                st.pinp[None],
                corr,
                jnp.zeros((1, h, w, 4), jnp.float32),
            )
            return jnp.mean(jnp.linalg.norm(delta, axis=-1))

        delta = jax.lax.cond(
            st.counter > 0, probe, lambda _: jnp.float32(1e9), None
        )
        # capacity gate: at counter == buffer an OOB .at[ix].set would be
        # silently dropped under jit while counter kept advancing — tracking
        # would continue against clamped stale buffers. Stop keyframing
        # instead (graceful saturation; the host reference raises here —
        # Droid.sync()/terminate warn when the buffer saturated).
        has_room = st.counter < st.poses.shape[0]
        is_kf = ((st.counter == 0) | (delta > config.filter_thresh)) & has_room

        def do_append(st):
            net32, inp32 = cnet32(image[0].astype(jnp.float32))
            net, inp = net32.astype(cdt), inp32.astype(cdt)
            ix = st.counter
            first = ix == 0
            return st._replace(
                tstamp=st.tstamp.at[ix].set(tstamp),
                images=st.images.at[ix].set(image[0].astype(jnp.uint8)),
                poses=jax.lax.cond(
                    first,
                    lambda p: p.at[ix].set(lie.identity(())),
                    lambda p: p,
                    st.poses,
                ),
                disps=jax.lax.cond(
                    first,
                    lambda d: d.at[ix].set(1.0),
                    lambda d: d,
                    st.disps,
                ),
                disps_sens=st.disps_sens.at[ix].set(disp_sens),
                intrinsics=st.intrinsics.at[ix].set(intrinsics / 8.0),
                fmaps=st.fmaps.at[ix].set(fmap),
                nets=st.nets.at[ix].set(net),
                inps=st.inps.at[ix].set(inp),
                pfmap=fmap32,
                pnet=net32,
                pinp=inp32,
                counter=ix + 1,
            )

        st = jax.lax.cond(is_kf, do_append, lambda s: s, st)

        run_init = (~st.is_init) & (st.counter == warmup)
        run_upd = st.is_init & (st.t1 < st.counter)

        # ================= initialization (droid_frontend.py:78-113) =======
        def init_branch(st):
            t1 = st.counter
            # neighborhood edges |i−j| ≤ 3 over [0, warmup)
            cand_i, cand_j, cand_ok = [], [], []
            c = 1 if stereo else 0
            for a in range(warmup):
                for b in range(warmup):
                    if abs(a - b) > c and abs(a - b) <= 3:
                        cand_i.append(a)
                        cand_j.append(b)
                        cand_ok.append(True)
            st = _add_edges(
                st,
                jnp.asarray(cand_i, jnp.int32),
                jnp.asarray(cand_j, jnp.int32),
                jnp.asarray(cand_ok),
                evict=jnp.bool_(False),
            )
            st = jax.lax.fori_loop(
                0, 8, lambda i, s: update_iteration(s, jnp.int32(1)), st
            )

            ci, cj, cok = _proximity_candidates(
                st, jnp.int32(0), jnp.int32(0), warmup, warmup,
                rad=2, nms=2, thresh=config.frontend_thresh, beta=beta,
                stereo=stereo, max_factors=Nmax,
            )
            st = _add_edges(st, ci, cj, cok, evict=jnp.bool_(False))
            st = jax.lax.fori_loop(
                0, 8, lambda i, s: update_iteration(s, jnp.int32(1)), st
            )

            # motion model + init finalisation
            mean4 = jnp.mean(
                jax.lax.dynamic_slice(st.disps, (t1 - 4, 0, 0), (4, h, w))
            )
            st = st._replace(
                poses=st.poses.at[t1].set(st.poses[t1 - 1]),
                disps=st.disps.at[t1].set(jnp.full((h, w), mean4)),
            )
            drop_old = st.valid & (st.ii < warmup - 4)
            st = _rm_factors(st, drop_old, store=True)
            return st._replace(is_init=jnp.bool_(True), t1=t1)

        # ================= per-keyframe update (droid_frontend.py:35-76) ===
        def update_branch(st):
            t1 = st.t1 + 1
            st = st._replace(t1=t1)

            st = _rm_factors(
                st, st.valid & (st.age > config.max_age), store=True
            )

            ci, cj, cok = _proximity_candidates(
                st,
                t1 - 5,
                jnp.maximum(t1 - config.frontend_window, 0),
                5,
                config.frontend_window,
                rad=config.frontend_radius,
                nms=config.frontend_nms,
                thresh=config.frontend_thresh,
                beta=beta,
                stereo=stereo,
                max_factors=Nmax,
            )
            st = _add_edges(st, ci, cj, cok, evict=jnp.bool_(True),
                            budget=Nmax)

            # RGB-D prior seeds the new keyframe disparity
            sens = st.disps_sens[t1 - 1]
            st = st._replace(
                disps=st.disps.at[t1 - 1].set(
                    jnp.where(sens > 0, sens, st.disps[t1 - 1])
                )
            )

            st = jax.lax.fori_loop(
                0,
                config.frontend_iters1,
                lambda i, s: update_iteration(s, jnp.int32(0)),
                st,
            )

            # keyframe keep/cull test
            d = _bidir_distance(
                st, jnp.stack([t1 - 3]), jnp.stack([t1 - 2]), beta
            )[0]

            def cull(st):
                st = _rm_keyframe(st, t1 - 2)
                return st._replace(counter=st.counter - 1, t1=st.t1 - 1)

            def keep(st):
                return jax.lax.fori_loop(
                    0,
                    config.frontend_iters2,
                    lambda i, s: update_iteration(s, jnp.int32(0)),
                    st,
                )

            st = jax.lax.cond(d < config.keyframe_thresh, cull, keep, st)

            # motion model
            t1n = st.t1
            st = st._replace(
                poses=st.poses.at[t1n].set(st.poses[t1n - 1]),
                disps=st.disps.at[t1n].set(
                    jnp.full((h, w), jnp.mean(st.disps[t1n - 1]))
                ),
            )
            return st

        st = jax.lax.cond(
            run_init,
            init_branch,
            lambda s: jax.lax.cond(run_upd, update_branch, lambda x: x, s),
            st,
        )
        return st

    return track_step
