"""Backend: global bundle adjustment over the whole keyframe history.

TPU-native equivalent of /root/reference/droid_slam/droid_backend.py (with the
fork's missing-`device` arg bug fixed to the intended upstream behaviour —
SURVEY §2.6). Builds a fresh low-memory factor graph capped at 16·t edges,
adds proximity edges over all keyframes, and runs `update_lowmem`.
"""

from __future__ import annotations

import numpy as np

from .factor_graph import FactorGraph


def _pow2ceil(n: int, floor: int = 64) -> int:
    return max(int(2 ** np.ceil(np.log2(max(n, 1)))), floor)


def _chunk_ceil(n: int, chunk: int = 256, floor: int = 64) -> int:
    """Round up to a multiple of the update-op chunk instead of a power of
    two: at reference scale the pow2 pad nearly DOUBLES the edge store
    (16·300 = 4800 → 8192 slots), and the store's per-edge hidden is the
    dominant backend allocation. Compile buckets move per 16 keyframes of
    growth, which a once-per-session terminate (plus warm_terminate at the
    same t) amortizes; the step already slices compute to the occupied
    chunk prefix, so this changes memory, not math."""
    return max(-(-max(n, 1) // chunk) * chunk, floor)


class DroidBackend:
    """``mesh`` (optional jax.sharding.Mesh with a 'ba' axis) routes every
    global-BA solve through the edge-sharded distributed path
    (parallel/sharded_ba.py) — keyframe linearisation and the Schur reduction
    scale across devices with one psum of the pose system per GN iteration."""

    def __init__(self, params, video, config, mesh=None):
        self.params = params
        self.video = video
        self.config = config
        self.mesh = mesh

    def __call__(self, steps: int = 12):
        cfg = self.config
        v = self.video
        t = v.counter

        import jax.numpy as jnp

        if not cfg.stereo and float(jnp.sum(v.disps_sens[:t])) == 0.0:
            v.normalize()

        import jax.numpy as jnp_

        chunk = getattr(cfg, "backend_chunk", 256)
        graph = FactorGraph(
            v,
            self.params,
            max_factors=_chunk_ceil(16 * t, chunk),
            # proximity with remove=False appends at most budget+2 edges
            # (the es counter breaks past max_factors); a tight pad — the
            # 2x default would double the dominant edge-buffer memory
            edge_pad=_chunk_ceil(16 * t, chunk) + 32,
            inactive_pad=cfg.inactive_pad,
            window_pad=cfg.window_pad,
            schur_pair_floor=cfg.schur_pair_floor,
            upsample=cfg.upsample,
            # the hidden store in compute dtype: halves the dominant
            # backend allocation in bf16 production mode (see _empty_edges)
            net_dtype=(jnp_.bfloat16
                       if getattr(cfg, "compute_dtype", "float32") == "bfloat16"
                       else jnp_.float32),
        )

        graph.add_proximity_factors(
            rad=cfg.backend_radius,
            nms=cfg.backend_nms,
            thresh=cfg.backend_thresh,
            beta=cfg.beta,
        )

        graph.update_lowmem(steps=steps, mesh=self.mesh)
        graph.clear_edges()
        v.dirty[:t] = True
