"""SLAM runtime: keyframe video state, motion filter, factor graph,
frontend/backend, trajectory filler, and the `Droid` system facade."""

from .config import DroidConfig
from .video import VideoState
from .droid import Droid

__all__ = ["DroidConfig", "VideoState", "Droid"]
