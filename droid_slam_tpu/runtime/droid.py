"""Droid: the SLAM system facade.

TPU-native equivalent of /root/reference/droid_slam/droid.py: owns the
network parameters, the keyframe video buffer, and the pipeline stages;
`track()` runs the motion filter + frontend per input frame;
`terminate()` runs the global backend twice (7 then 12 steps) and fills
non-keyframe poses.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..models.droid_net import DroidNet
from .backend import DroidBackend
from .config import DroidConfig
from .frontend import DroidFrontend
from .motion_filter import MotionFilter
from .trajectory_filler import PoseTrajectoryFiller
from .video import VideoState


class Droid:
    def __init__(self, config: DroidConfig, params=None, weights: Optional[str] = None):
        self.config = config
        if params is None:
            if weights is not None:
                if weights.endswith(".pth"):
                    from ..models.weights import load_reference_checkpoint

                    params = load_reference_checkpoint(weights)
                else:
                    from ..train.checkpoints import load_params

                    params = load_params(weights)
            else:
                # random init (useful for smoke tests; real runs need weights)
                from ..models.droid_net import init_params

                params = init_params(jax.random.PRNGKey(0))
        self.params = params
        update_params = {"params": params["params"]["update"]}

        self.video = VideoState(config)
        self.filterx = MotionFilter(params, self.video, thresh=config.filter_thresh)
        self.frontend = DroidFrontend(update_params, self.video, config)
        self.backend = DroidBackend(update_params, self.video, config)
        self.traj_filler = PoseTrajectoryFiller(params, self.video, config)

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """Per-frame tracking: motion filter + frontend (droid.py:62-73)."""
        self.filterx.track(tstamp, image, depth, intrinsics)
        self.frontend()

    def terminate(self, stream=None) -> np.ndarray:
        """Global BA + trajectory fill; returns camera-to-world poses [T, 7]
        (droid.py:75-89)."""
        del self.frontend

        self.backend(7)
        self.backend(12)

        if stream is not None:
            return self.traj_filler(stream)

        from ..ops import lie

        t = self.video.counter
        return np.asarray(lie.inv(self.video.poses[:t]))
