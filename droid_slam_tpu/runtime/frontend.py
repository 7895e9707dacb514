"""Frontend: local sliding-window tracking.

TPU-native equivalent of /root/reference/droid_slam/droid_frontend.py.
Initialisation after `warmup` keyframes (neighborhood edges + 8 iters,
proximity edges + 8 iters, droid_frontend.py:78-113); per-keyframe update
(cull aged edges, add proximity edges, 4+2 operator iterations, keyframe
keep/cull distance test, motion-model extrapolation, droid_frontend.py:35-76).
"""

from __future__ import annotations

import jax.numpy as jnp

from .factor_graph import FactorGraph


class DroidFrontend:
    def __init__(self, params, video, config):
        self.video = video
        self.config = config
        self.graph = FactorGraph(
            video,
            params,
            max_factors=config.max_factors,
            # headroom for the initialization neighborhood, which appends
            # past max_factors with remove=False exactly like the reference
            # (6*warmup - 12 edges, plus stereo self-edges); matches the
            # fused engine's _edge_slots so the engines stay equivalent
            edge_pad=-(-max(config.max_factors,
                            6 * config.warmup - 12
                            + (config.warmup if config.stereo else 0)) // 8)
                     * 8,
            inactive_pad=config.inactive_pad,
            window_pad=config.window_pad,
            schur_pair_floor=config.schur_pair_floor,
            upsample=config.upsample,
        )

        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

        self.max_age = config.max_age
        self.iters1 = config.frontend_iters1
        self.iters2 = config.frontend_iters2

        self.warmup = config.warmup
        self.beta = config.beta
        self.frontend_nms = config.frontend_nms
        self.keyframe_thresh = config.keyframe_thresh
        self.frontend_window = config.frontend_window
        self.frontend_thresh = config.frontend_thresh
        self.frontend_radius = config.frontend_radius

    def _update(self):
        """Per-keyframe tracking update (droid_frontend.py:35-76)."""
        self.count += 1
        self.t1 += 1

        if self.graph.num_active > 0:
            self.graph.rm_factors(self.graph.age > self.max_age, store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5,
            max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius,
            nms=self.frontend_nms,
            thresh=self.frontend_thresh,
            beta=self.beta,
            remove=True,
        )

        # RGB-D prior seeds the new keyframe's disparity (droid_frontend.py:48-49)
        v = self.video
        sens = v.disps_sens[self.t1 - 1]
        v.set_disp(
            self.t1 - 1,
            jnp.where(sens > 0, sens, v.disps[self.t1 - 1]),
        )

        for _ in range(self.iters1):
            self.graph.update(None, None, use_inactive=True)

        # keyframe keep/cull test: distance between the last two tracked frames
        d = float(
            v.distance([self.t1 - 3], [self.t1 - 2], beta=self.beta, bidirectional=True)[0]
        )
        if d < self.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            v.counter -= 1
            self.t1 -= 1
        else:
            for _ in range(self.iters2):
                self.graph.update(None, None, use_inactive=True)

        # motion model: next pose = last pose, next disp = mean disp
        v.set_pose(self.t1, v.poses[self.t1 - 1])
        v.set_disp(
            self.t1, jnp.full_like(v.disps[self.t1], jnp.mean(v.disps[self.t1 - 1]))
        )

        active_ii = self.graph.ii[self.graph.valid]
        if len(active_ii):
            v.dirty[int(active_ii.min()) : self.t1] = True

    def _initialize(self):
        """System bootstrap once `warmup` keyframes exist (droid_frontend.py:78-113)."""
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        for _ in range(8):
            self.graph.update(1, use_inactive=True)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.frontend_thresh, remove=False
        )
        for _ in range(8):
            self.graph.update(1, use_inactive=True)

        v = self.video
        v.set_pose(self.t1, v.poses[self.t1 - 1])
        v.set_disp(
            self.t1,
            jnp.full_like(
                v.disps[self.t1], jnp.mean(v.disps[self.t1 - 4 : self.t1])
            ),
        )

        self.is_initialized = True
        v.dirty[: self.t1] = True

        self.graph.rm_factors(
            (self.graph.ii < self.warmup - 4) & self.graph.valid, store=True
        )

    def __call__(self):
        if not self.is_initialized and self.video.counter == self.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()
