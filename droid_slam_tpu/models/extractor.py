"""Feature / context encoders (Flax, NHWC).

TPU-native re-design of the reference residual encoder
(/root/reference/droid_slam/modules/extractor.py:116-198): a 7×7 stride-2 stem
followed by three stages of two residual blocks (strides 1/2/2, widths
32/64/128) and a 1×1 projection head — total stride 8 so the SLAM state lives
on the 1/8-resolution grid.

Differences from the reference are layout/idiom only:
  * NHWC instead of NCHW (MXU-friendly; no transposes under XLA),
  * instance norm is a stateless GroupNorm(group_size=1) without affine
    parameters (matching torch ``nn.InstanceNorm2d(affine=False)``),
  * the unused ``BottleneckBlock`` / ``multidim`` variants of the reference
    are intentionally omitted.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

DIM = 32

Dtype = Any


def _norm(norm_fn: str, channels: int, dtype: Dtype = None):
    """Normalization factory mirroring the reference's choices
    (extractor.py:15-40). BatchNorm is intentionally folded to instance-style
    statistics: the SLAM runtime always runs in eval mode and the published
    checkpoints use 'instance'/'none' (droid_net.py:150-151)."""
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=channels // 8, epsilon=1e-5, dtype=dtype)
    if norm_fn == "instance":
        # per-sample, per-channel over H, W; no affine (torch default);
        # flax computes the statistics in float32 even under bfloat16 dtype
        # epsilon matches torch nn.InstanceNorm2d (1e-5, NOT flax's 1e-6
        # default): converted reference checkpoints normalize flat low-
        # variance channels by sqrt(var + eps), and the mismatch compounds
        # through 8 norm layers
        return nn.GroupNorm(
            num_groups=channels, use_bias=False, use_scale=False,
            epsilon=1e-5, dtype=dtype,
        )
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unsupported norm_fn: {norm_fn}")


class ResidualBlock(nn.Module):
    """Two 3×3 convs + skip (extractor.py:6-55)."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # explicit symmetric padding: for stride-2 convs XLA's SAME pads
        # (lo, hi) = (k//2 - 1, k//2) which is NOT the reference's symmetric
        # torch padding — outputs would diverge
        p1 = ((1, 1), (1, 1))
        dt = self.dtype
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=p1, dtype=dt, name="conv1")(x)
        y = nn.relu(_norm(self.norm_fn, self.planes, dt)(y))
        y = nn.Conv(self.planes, (3, 3), padding=p1, dtype=dt, name="conv2")(y)
        y = nn.relu(_norm(self.norm_fn, self.planes, dt)(y))

        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(
                self.planes, (1, 1), strides=self.stride, padding="VALID",
                dtype=dt, name="downsample",
            )(x)
            x = _norm(self.norm_fn, self.planes, dt)(x)

        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-8 residual encoder. Input [B, H, W, 3] → [B, H/8, W/8, out]."""

    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: Dtype = None  # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        x = nn.Conv(DIM, (7, 7), strides=2, padding=((3, 3), (3, 3)), dtype=dt, name="conv1")(x)
        x = nn.relu(_norm(self.norm_fn, DIM, dt)(x))

        for i, (dim, stride) in enumerate([(DIM, 1), (2 * DIM, 2), (4 * DIM, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride, dt, name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, dt, name=f"layer{i + 1}_1")(x)

        return nn.Conv(self.output_dim, (1, 1), dtype=dt, name="conv2")(x)
