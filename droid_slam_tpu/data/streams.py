"""Image streams for the demo and the four evaluation datasets.

TPU-native equivalents of the reference stream generators:
  * generic calibrated stream — /root/reference/demo.py:25-60
  * TUM-RGBD monocular — evaluation_scripts/test_tum.py:23-51
  * EuRoC mono/stereo with rectification — test_euroc.py:26-86
  * ETH3D RGB-D (depth/5000) — test_eth3d.py:25-57
  * TartanAir mono/stereo — validate_tartanair.py:18-39

All streams yield (tstamp, image, intrinsics) or
(tstamp, image, depth, intrinsics) with images as **RGB** uint8 arrays of
shape [H, W, 3] (mono) or [2, H, W, 3] (stereo) — the reference carries BGR
and swaps channels inside the net (droid_net.py:158); here the data layer
owns color order. Requires cv2 for IO/undistortion (import is deferred).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional

import numpy as np


def _cv2():
    import cv2

    return cv2


def _resize_to_area(image: np.ndarray, target_area: int = 384 * 512):
    """Resize so H·W ≈ target_area and crop to multiples of 8 (demo.py:46-52)."""
    cv2 = _cv2()
    h0, w0 = image.shape[:2]
    s = np.sqrt(target_area / (h0 * w0))
    h1, w1 = int(h0 * s), int(w0 * s)
    image = cv2.resize(image, (w1, h1))
    image = image[: h1 - h1 % 8, : w1 - w1 % 8]
    return image, (w1 / w0, h1 / h0)


def _bgr2rgb(image: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(image[..., ::-1])


def image_stream(imagedir: str, calib: str, stride: int = 1) -> Iterator:
    """Generic calibrated monocular stream (demo.py:25-60). `calib` is a text
    file `fx fy cx cy [dist…]` (README.md:93-97)."""
    cv2 = _cv2()
    calib_arr = np.loadtxt(calib, delimiter=" ")
    fx, fy, cx, cy = calib_arr[:4]
    K = np.eye(3)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = fx, cx, fy, cy

    image_list = sorted(os.listdir(imagedir))[::stride]
    for t, imfile in enumerate(image_list):
        image = cv2.imread(os.path.join(imagedir, imfile))
        if len(calib_arr) > 4:
            image = cv2.undistort(image, K, calib_arr[4:])
        image, (sx, sy) = _resize_to_area(image)
        intrinsics = np.array([fx * sx, fy * sy, cx * sx, cy * sy], np.float32)
        yield t, _bgr2rgb(image), intrinsics


def tum_stream(datapath: str, stride: int = 2) -> Iterator:
    """TUM-RGBD fr1 monocular protocol (test_tum.py:23-51): fixed fr1
    intrinsics, undistort, resize to 352×256, crop 16/8 margins."""
    cv2 = _cv2()
    fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3
    K = np.array([fx, 0, cx, 0, fy, cy, 0, 0, 1]).reshape(3, 3)
    d = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])

    images_list = sorted(glob.glob(os.path.join(datapath, "rgb", "*.png")))[::stride]
    for t, imfile in enumerate(images_list):
        image = cv2.imread(imfile)
        image = cv2.undistort(image, K, d)
        image = cv2.resize(image, (320 + 32, 240 + 16))
        intr = np.array(
            [
                fx * image.shape[1] / 640.0,
                fy * image.shape[0] / 480.0,
                cx * image.shape[1] / 640.0 - 16,
                cy * image.shape[0] / 480.0 - 8,
            ],
            np.float32,
        )
        image = image[8:-8, 16:-16]
        tstamp = float(os.path.basename(imfile)[:-4])
        yield tstamp, _bgr2rgb(image), intr


# EuRoC factory rectification (test_euroc.py:28-51)
_EUROC_K_L = np.array([458.654, 0, 367.215, 0, 457.296, 248.375, 0, 0, 1]).reshape(3, 3)
_EUROC_D_L = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
_EUROC_R_L = np.array(
    [0.999966347530033, -0.001422739138722922, 0.008079580483432283,
     0.001365741834644127, 0.9999741760894847, 0.007055629199258132,
     -0.008089410156878961, -0.007044357138835809, 0.9999424675829176]
).reshape(3, 3)
_EUROC_P_L = np.array(
    [435.2046959714599, 0, 367.4517211914062, 0,
     0, 435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
).reshape(3, 4)
_EUROC_K_R = np.array([457.587, 0, 379.999, 0, 456.134, 255.238, 0, 0, 1]).reshape(3, 3)
_EUROC_D_R = np.array([-0.28368365, 0.07451284, -0.00010473, -3.555907e-05, 0.0])
_EUROC_R_R = np.array(
    [0.9999633526194376, -0.003625811871560086, 0.007755443660172947,
     0.003680398547259526, 0.9999684752771629, -0.007035845251224894,
     -0.007729688520722713, 0.007064130529506649, 0.999945173484644]
).reshape(3, 3)
_EUROC_P_R = np.array(
    [435.2046959714599, 0, 367.4517211914062, -47.90639384423901,
     0, 435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
).reshape(3, 4)


def euroc_stream(
    datapath: str, image_size=(320, 512), stereo: bool = False, stride: int = 1
) -> Iterator:
    """EuRoC MAV stream with stereo rectification (test_euroc.py:26-86)."""
    cv2 = _cv2()
    map_l = cv2.initUndistortRectifyMap(
        _EUROC_K_L, _EUROC_D_L, _EUROC_R_L, _EUROC_P_L[:3, :3], (752, 480), cv2.CV_32F
    )
    map_r = cv2.initUndistortRectifyMap(
        _EUROC_K_R, _EUROC_D_R, _EUROC_R_R, _EUROC_P_R[:3, :3], (752, 480), cv2.CV_32F
    )
    intr_vec = np.array(
        [435.2046959714599, 435.2046959714599, 367.4517211914062, 252.2008514404297]
    )
    ht0, wd0 = 480, 752
    H, W = image_size

    images_left = sorted(glob.glob(os.path.join(datapath, "mav0/cam0/data/*.png")))[::stride]
    images_right = [x.replace("cam0", "cam1") for x in images_left]

    for t, (imgL, imgR) in enumerate(zip(images_left, images_right)):
        if stereo and not os.path.isfile(imgR):
            continue
        tstamp = float(os.path.basename(imgL)[:-4])
        frames = [cv2.remap(cv2.imread(imgL), map_l[0], map_l[1], cv2.INTER_LINEAR)]
        if stereo:
            frames.append(
                cv2.remap(cv2.imread(imgR), map_r[0], map_r[1], cv2.INTER_LINEAR)
            )
        frames = [cv2.resize(f, (W, H)) for f in frames]
        image = np.stack([_bgr2rgb(f) for f in frames], 0)
        if not stereo:
            image = image[0]
        intr = intr_vec * np.array([W / wd0, H / ht0, W / wd0, H / ht0])
        yield tstamp, image, intr.astype(np.float32)


def eth3d_stream(datapath: str, use_depth: bool = False, stride: int = 1) -> Iterator:
    """ETH3D SLAM RGB-D stream, depth scale 1/5000 (test_eth3d.py:25-57)."""
    cv2 = _cv2()
    fx, fy, cx, cy = np.loadtxt(os.path.join(datapath, "calibration.txt")).tolist()
    image_list = sorted(glob.glob(os.path.join(datapath, "rgb", "*.png")))[::stride]
    depth_list = sorted(glob.glob(os.path.join(datapath, "depth", "*.png")))[::stride]

    for t, (image_file, depth_file) in enumerate(zip(image_list, depth_list)):
        image = cv2.imread(image_file)
        depth = cv2.imread(depth_file, cv2.IMREAD_ANYDEPTH) / 5000.0

        h0, w0 = image.shape[:2]
        image, (sx, sy) = _resize_to_area(image)
        h1, w1 = int(h0 * np.sqrt((384 * 512) / (h0 * w0))), int(
            w0 * np.sqrt((384 * 512) / (h0 * w0))
        )
        depth = cv2.resize(depth, (w1, h1), interpolation=cv2.INTER_NEAREST)
        depth = depth[: h1 - h1 % 8, : w1 - w1 % 8]

        intr = np.array([fx * sx, fy * sy, cx * sx, cy * sy], np.float32)
        tstamp = float(os.path.basename(image_file)[:-4])
        if use_depth:
            yield tstamp, _bgr2rgb(image), depth.astype(np.float32), intr
        else:
            yield tstamp, _bgr2rgb(image), intr


def tartanair_stream(
    datapath: str,
    image_size=(384, 512),
    intrinsics_vec=(320.0, 320.0, 320.0, 240.0),
    stereo: bool = False,
) -> List:
    """TartanAir validation stream (validate_tartanair.py:18-39)."""
    cv2 = _cv2()
    H, W = image_size
    images_left = sorted(glob.glob(os.path.join(datapath, "image_left/*.png")))
    images_right = sorted(glob.glob(os.path.join(datapath, "image_right/*.png")))

    data = []
    for t in range(len(images_left)):
        frames = [cv2.resize(cv2.imread(images_left[t]), (W, H))]
        if stereo:
            frames.append(cv2.resize(cv2.imread(images_right[t]), (W, H)))
        image = np.stack([_bgr2rgb(f) for f in frames], 0)
        if not stereo:
            image = image[0]
        intr = 0.8 * np.asarray(intrinsics_vec, np.float32)
        data.append((t, image, intr))
    return data
