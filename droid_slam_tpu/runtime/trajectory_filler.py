"""Pose trajectory filler: recover poses of non-keyframe frames.

TPU-native equivalent of /root/reference/droid_slam/trajectory_filler.py:
per 16-frame batch, linearly interpolate SE3 poses in log space between the
bracketing keyframes (trajectory_filler.py:50-58), extract matching features,
temporarily append the frames to the video, attach each to its two bracketing
keyframes, and run 6 motion-only BA iterations (trajectory_filler.py:67-72).
"""

from __future__ import annotations

from typing import Iterable, List

import jax.numpy as jnp
import numpy as np

from ..ops import lie
from .factor_graph import FactorGraph
from .motion_filter import _encode_frame
from .video import _set_range

Array = jnp.ndarray


class PoseTrajectoryFiller:
    def __init__(self, params, video, config):
        self.params = params
        self.video = video
        self.config = config

    def _fill(self, tstamps: List[float], images: List, intrinsics: List,
              ts: np.ndarray) -> Array:
        v = self.video
        N = v.counter
        M = len(tstamps)
        # __call__ sizes batches to the buffer headroom; this guards direct
        # callers (_set_range would silently truncate past capacity and the
        # clamped slice below would return fewer than M poses)
        assert N + M <= v.poses.shape[0], (N, M, v.poses.shape[0])

        tt = np.asarray(tstamps, np.float32)

        # bracketing keyframe indices
        t0 = np.asarray([np.sum(ts <= t) - 1 for t in tt], np.int64)
        t0 = np.clip(t0, 0, N - 1)
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        # linear SE3 interpolation in log space
        Ps = v.poses[:N]
        dt = jnp.asarray(ts[t1] - ts[t0] + 1e-3)
        dP = lie.mul(Ps[t1], lie.inv(Ps[t0]))
        w = lie.log(dP) / dt[:, None] * jnp.asarray(tt - ts[t0])[:, None]
        Gs = lie.mul(lie.exp(w), Ps[t0])  # [M, 7]

        # matching features + temporary appends, fully batched: per-slot
        # writes cost one dispatch each (expensive over a remote-device
        # tunnel); one fnet call + one ranged write per buffer instead
        imgs = jnp.stack(
            [img[0] if img.ndim == 4 else img for img in images]
        )  # [M, H, W, 3] (mono path of the filler, trajectory_filler.py:60-66)
        fmaps = _encode_frame(self.params, imgs)[:, None]
        h, w = self.config.feat_size
        v.tstamp = _set_range(v.tstamp, N, jnp.asarray(tt))
        v.poses = _set_range(v.poses, N, Gs)
        v.disps = _set_range(v.disps, N, jnp.ones((M, h, w), jnp.float32))
        v.intrinsics = _set_range(
            v.intrinsics, N, jnp.asarray(np.stack(intrinsics), jnp.float32) / 8.0
        )
        v.fmaps = _set_range(v.fmaps, N, fmaps)
        v.counter = N + M

        graph = FactorGraph(
            v,
            {"params": self.params["params"]["update"]},
            max_factors=max(2 * M, 32),
            edge_pad=max(2 * M, 32),  # exactly 2M edges are added
            inactive_pad=8,
            window_pad=max(32, M),
            schur_pair_floor=self.config.schur_pair_floor,
        )
        graph.add_factors(t0.astype(np.int32), np.arange(N, N + M, dtype=np.int32))
        graph.add_factors(t1.astype(np.int32), np.arange(N, N + M, dtype=np.int32))

        for _ in range(6):
            graph.update(N, N + M, motion_only=True)

        out = v.poses[N : N + M]
        v.counter = N  # pop the temporary frames
        return out

    def __call__(self, image_stream: Iterable) -> np.ndarray:
        """image_stream yields (tstamp, image, intrinsics). Returns the full
        camera-to-world trajectory [T, 7] (the reference returns
        trajectory.inv(), droid.py:89)."""
        pose_list = []
        tstamps, images, intrinsics = [], [], []
        ts = np.asarray(self.video.tstamp[: self.video.counter])
        # temporary frames append past the live keyframes; shrink the batch
        # to the buffer headroom (a full buffer leaves nothing to borrow)
        batch = min(16, self.video.poses.shape[0] - self.video.counter)
        if batch < 1:
            raise ValueError(
                f"trajectory filler needs >=1 free keyframe slot but the "
                f"buffer is full ({self.video.counter}); increase "
                "DroidConfig.buffer (the reference keeps 512-1024 plus "
                "headroom, demo.py:93)"
            )
        for (tstamp, image, intrinsic) in image_stream:
            tstamps.append(tstamp)
            images.append(image)
            intrinsics.append(intrinsic)
            if len(tstamps) == batch:
                pose_list.append(self._fill(tstamps, images, intrinsics, ts))
                tstamps, images, intrinsics = [], [], []
        if tstamps:
            # pad the trailing partial batch to the full batch size by
            # repeating its last frame, then drop the padded rows: a
            # remainder-sized batch would compile a SECOND program family
            # (encoder + factor graph + 6 update steps at M=len(tstamps)) —
            # several seconds each over the axon tunnel, and the dominant
            # cold-terminate stage after warm_terminate warms the M=batch
            # family (BENCH_r04 cold 28.5 s was mostly this)
            n_tail = len(tstamps)
            while len(tstamps) < batch:
                tstamps.append(tstamps[-1])
                images.append(images[-1])
                intrinsics.append(intrinsics[-1])
            pose_list.append(
                self._fill(tstamps, images, intrinsics, ts)[:n_tail]
            )

        traj = jnp.concatenate(pose_list, axis=0)
        return np.asarray(lie.inv(traj))
