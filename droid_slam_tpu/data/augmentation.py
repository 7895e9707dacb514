"""RGB-D training augmentation: color jitter + random scale + center crop.

TPU-native equivalent of /root/reference/droid_slam/data_readers/
augmentation.py, implemented with numpy/cv2 on the host (it runs in the data
pipeline, not on device). Color jitter follows torchvision ColorJitter
semantics (brightness/contrast/saturation 0.25, hue 0.4/π, random grayscale
p=0.1), applied identically to all frames of a clip."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _rgb_to_gray(images: np.ndarray) -> np.ndarray:
    w = np.array([0.299, 0.587, 0.114], np.float32)
    return (images @ w)[..., None]


class RGBDAugmentor:
    def __init__(self, crop_size: Tuple[int, int] = (384, 512), seed: int = 0):
        self.crop_size = tuple(crop_size)
        self.max_scale = 0.25
        self.rng = np.random.default_rng(seed)

    # ---------------------------------------------------------------- color

    def color_transform(self, images: np.ndarray) -> np.ndarray:
        """images: [N, H, W, 3] RGB float32 0-255; one jitter per clip."""
        r = self.rng
        x = images / 255.0

        # brightness / contrast / saturation factors in [1−c, 1+c]; hue shift
        b = r.uniform(0.75, 1.25)
        c = r.uniform(0.75, 1.25)
        s = r.uniform(0.75, 1.25)
        h = r.uniform(-0.4 / np.pi, 0.4 / np.pi)  # fraction of the hue circle

        x = np.clip(x * b, 0, 1)
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        x = np.clip((x - mean) * c + mean, 0, 1)
        gray = _rgb_to_gray(x)
        x = np.clip((x - gray) * s + gray, 0, 1)

        if abs(h) > 1e-6:
            import cv2

            out = []
            for frame in x:
                hsv = cv2.cvtColor(frame.astype(np.float32), cv2.COLOR_RGB2HSV)
                hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
                out.append(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB))
            x = np.stack(out)

        if r.random() < 0.1:
            x = np.repeat(_rgb_to_gray(x), 3, axis=-1)

        return (255.0 * x).astype(np.float32)

    # -------------------------------------------------------------- spatial

    def spatial_transform(self, images, depths, poses, intrinsics):
        """Random log-uniform rescale + center crop (augmentation.py:20-47)."""
        import cv2

        n, ht, wd = images.shape[:3]
        ch, cw = self.crop_size
        min_scale = np.log2(max((ch + 1) / ht, (cw + 1) / wd))
        scale = 2.0 ** self.rng.uniform(min_scale, self.max_scale)

        h1, w1 = int(round(ht * scale)), int(round(wd * scale))
        images = np.stack(
            [cv2.resize(im, (w1, h1), interpolation=cv2.INTER_LINEAR) for im in images]
        )
        depths = np.stack(
            [cv2.resize(d, (w1, h1), interpolation=cv2.INTER_NEAREST) for d in depths]
        )
        intrinsics = intrinsics * scale

        y0 = (h1 - ch) // 2
        x0 = (w1 - cw) // 2
        intrinsics = intrinsics - np.array([0.0, 0.0, x0, y0], np.float32)
        images = images[:, y0 : y0 + ch, x0 : x0 + cw]
        depths = depths[:, y0 : y0 + ch, x0 : x0 + cw]
        return images, poses, depths, intrinsics

    def __call__(self, images, poses, depths, intrinsics):
        """images [N,H,W,3] RGB, depths = inverse depths [N,H,W]."""
        images = self.color_transform(images)
        return self.spatial_transform(images, depths, poses, intrinsics)
