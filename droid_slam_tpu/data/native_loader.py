"""ctypes bindings for the native host data pipeline (native/droid_native.cc).

The C++ library owns image decode (libjpeg/libpng), bilinear remap
(undistortion / stereo rectification from precomputed float maps), resize,
and a multithreaded ordered prefetch pipeline — the native analogue of the
reference's cv2 calls + torch DataLoader worker pool. Everything degrades
gracefully: if the shared library is absent it is built on demand with the
system toolchain, and if that fails callers fall back to cv2.

Map computation (undistort / rectify grids) stays in numpy — it runs once
per stream and is pure math (`build_undistort_rectify_map`, the
cv2.initUndistortRectifyMap formula).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdroid_native.so"))

_lib = None
_lib_tried = False


class _DNImage(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("h", ctypes.c_int32),
        ("w", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bytes_per_channel", ctypes.c_int32),
    ]


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "droid_native.cc")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.dn_decode.argtypes = [ctypes.c_char_p, ctypes.POINTER(_DNImage)]
    lib.dn_decode.restype = ctypes.c_int
    lib.dn_free.argtypes = [ctypes.c_void_p]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.dn_remap_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, u8p, ctypes.c_int, ctypes.c_int]
    lib.dn_resize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int]
    lib.dn_resize_nearest_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
    lib.dn_pipeline_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, f32p, f32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.dn_pipeline_create.restype = ctypes.c_void_p
    lib.dn_pipeline_peek.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.dn_pipeline_peek.restype = ctypes.c_int
    lib.dn_pipeline_pop.argtypes = [ctypes.c_void_p, u8p]
    lib.dn_pipeline_pop.restype = ctypes.c_int
    lib.dn_pipeline_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _require() -> ctypes.CDLL:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native loader unavailable (libdroid_native.so failed to build/load); "
            "use the cv2 fallback or check `make -C native`"
        )
    return lib


def imread(path: str) -> Optional[np.ndarray]:
    """Decode an image natively. Returns u8 RGB [H, W, 3], u16 [H, W] for
    16-bit depth PNGs, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    img = _DNImage()
    if lib.dn_decode(path.encode(), ctypes.byref(img)) != 0:
        return None
    n = img.h * img.w * img.channels * img.bytes_per_channel
    # copy straight into a WRITABLE numpy buffer (frombuffer over bytes is
    # read-only, unlike the cv2 fallback's arrays — a backend-dependent
    # contract split); one memmove either way
    out = np.empty(n, np.uint8)
    ctypes.memmove(out.ctypes.data, img.data, n)
    lib.dn_free(img.data)
    if img.bytes_per_channel == 2:
        return out.view(np.uint16).reshape(img.h, img.w)
    return out.reshape(img.h, img.w, img.channels)


def remap(image: np.ndarray, mapx: np.ndarray, mapy: np.ndarray) -> np.ndarray:
    """Bilinear remap of u8 RGB by float32 coordinate maps (zero border)."""
    lib = _require()
    image = np.ascontiguousarray(image, np.uint8)
    mapx = np.ascontiguousarray(mapx, np.float32)
    mapy = np.ascontiguousarray(mapy, np.float32)
    dh, dw = mapx.shape
    out = np.empty((dh, dw, 3), np.uint8)
    lib.dn_remap_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image.shape[0], image.shape[1],
        mapx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mapy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
    )
    return out


def resize(image: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize of u8 RGB to (H, W)."""
    lib = _require()
    image = np.ascontiguousarray(image, np.uint8)
    dh, dw = size_hw
    out = np.empty((dh, dw, 3), np.uint8)
    lib.dn_resize_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image.shape[0], image.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
    )
    return out


def resize_nearest(depth: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize of a float32 depth map."""
    lib = _require()
    depth = np.ascontiguousarray(depth, np.float32)
    dh, dw = size_hw
    out = np.empty((dh, dw), np.float32)
    lib.dn_resize_nearest_f32(
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        depth.shape[0], depth.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
    )
    return out


def build_undistort_rectify_map(
    K: np.ndarray,
    dist: Sequence[float],
    size_wh: Tuple[int, int],
    R: Optional[np.ndarray] = None,
    P: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """cv2.initUndistortRectifyMap in numpy: for each rectified output pixel,
    unproject with P, rotate by R⁻¹, apply radial-tangential distortion
    (k1 k2 p1 p2 k3), reproject with K → float32 source-coordinate maps."""
    w, h = size_wh
    K = np.asarray(K, np.float64).reshape(3, 3)
    d = np.zeros(5)
    d[: len(dist)] = dist
    k1, k2, p1, p2, k3 = d
    Pm = K if P is None else np.asarray(P, np.float64).reshape(3, 3)
    Rm = np.eye(3) if R is None else np.asarray(R, np.float64).reshape(3, 3)

    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    x = (xs - Pm[0, 2]) / Pm[0, 0]
    y = (ys - Pm[1, 2]) / Pm[1, 1]
    pts = np.stack([x, y, np.ones_like(x)], axis=-1) @ np.linalg.inv(Rm).T
    x = pts[..., 0] / pts[..., 2]
    y = pts[..., 1] / pts[..., 2]

    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y

    mapx = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    mapy = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return mapx, mapy


def undistort(image: np.ndarray, K: np.ndarray, dist: Sequence[float]) -> np.ndarray:
    """cv2.undistort equivalent: remap with identity rectification."""
    h, w = image.shape[:2]
    mapx, mapy = build_undistort_rectify_map(K, dist, (w, h))
    return remap(image, mapx, mapy)


class Pipeline:
    """Multithreaded ordered prefetch: decode → [remap] → [resize] → [crop].

    Iterates u8 RGB frames in submission order while C++ workers run ahead
    (bounded window). Used by the streams to overlap host preprocessing with
    device tracking — the role the torch DataLoader worker pool plays for the
    reference's trainer.
    """

    def __init__(
        self,
        paths: List[str],
        maps: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        resize_hw: Optional[Tuple[int, int]] = None,
        crop: Tuple[int, int, int, int] = (0, 0, 0, 0),
        n_threads: int = 4,
        window: int = 32,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        joined = "\n".join(paths).encode()
        f32p = ctypes.POINTER(ctypes.c_float)
        if maps is not None:
            self._mapx = np.ascontiguousarray(maps[0], np.float32)
            self._mapy = np.ascontiguousarray(maps[1], np.float32)
            mx = self._mapx.ctypes.data_as(f32p)
            my = self._mapy.ctypes.data_as(f32p)
            rh, rw = self._mapx.shape
        else:
            mx = my = ctypes.cast(None, f32p)
            rh = rw = 0
        oh, ow = resize_hw if resize_hw else (0, 0)
        self._n = len(paths)
        self._handle = lib.dn_pipeline_create(
            joined, self._n, mx, my, rh, rw, oh, ow,
            crop[0], crop[1], crop[2], crop[3], n_threads, window,
        )

    def __iter__(self) -> Iterator[np.ndarray]:
        h = ctypes.c_int()
        w = ctypes.c_int()
        for _ in range(self._n):
            status = self._lib.dn_pipeline_peek(self._handle, ctypes.byref(h), ctypes.byref(w))
            if status == -2:
                return
            if status == -1:
                # decode failure: skip the frame but keep order
                self._lib.dn_pipeline_pop(self._handle, ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)))
                continue
            out = np.empty((h.value, w.value, 3), np.uint8)
            self._lib.dn_pipeline_pop(self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            yield out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.dn_pipeline_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
