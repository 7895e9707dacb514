"""Neural network components of the TPU-native DROID-SLAM framework.

All modules operate in NHWC layout (TPU-native convolution layout; XLA lowers
NHWC convs directly onto the MXU without layout transposes) — the reference
uses NCHW throughout (/root/reference/droid_slam/droid_net.py).
"""

from .extractor import BasicEncoder
from .update import ConvGRU, GraphAgg, UpdateModule, cvx_upsample, upsample_disp
from .droid_net import DroidNet, extract_features

__all__ = [
    "BasicEncoder",
    "ConvGRU",
    "GraphAgg",
    "UpdateModule",
    "cvx_upsample",
    "upsample_disp",
    "DroidNet",
    "extract_features",
]
