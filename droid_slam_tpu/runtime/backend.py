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

        graph = FactorGraph(
            v,
            self.params,
            max_factors=_pow2ceil(16 * t),
            # proximity with remove=False appends at most budget+2 edges
            # (the es counter breaks past max_factors); a tight pad — the
            # 2x default would double the dominant edge-buffer memory
            edge_pad=_pow2ceil(16 * t) + 32,
            inactive_pad=cfg.inactive_pad,
            window_pad=cfg.window_pad,
            schur_pair_floor=cfg.schur_pair_floor,
            upsample=cfg.upsample,
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
