"""droid_slam_tpu — a TPU-native deep visual SLAM framework.

A from-scratch JAX/XLA/Pallas implementation of the DROID-SLAM capability set
(reference: elliotenglish/DROID-SLAM): monocular / stereo / RGB-D deep SLAM
with a recurrent optical-flow update operator and a dense bundle-adjustment
(DBA) layer solved with a depth-block Schur complement on SE(3).

Layers (bottom to top):
  ops/      pure-JAX Lie/projective geometry, DBA system build + Schur solve,
            correlation volumes (XLA reference impls + Pallas kernels)
  models/   Flax feature/context encoders, ConvGRU update operator
  runtime/  keyframe video state, motion filter, factor graph, frontend,
            backend (global BA), trajectory filler
  parallel/ device-mesh sharding for the global BA + data-parallel training
  data/     dataset streams (TUM/EuRoC/ETH3D/TartanAir), calibration
  train/    differentiable-BA trainer, losses
  eval/     trajectory alignment + ATE scoring
"""

__version__ = "0.1.0"
