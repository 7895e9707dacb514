"""Stream contract tests on synthetic on-disk fixtures.

The streams must yield the ORIGINAL integer frame index as t (reference
parity: test_euroc.py:76 yields stride*t) — the SLAM runtime stores t in a
float32 buffer and the trajectory filler brackets/interpolates on it, so a
strided track stream and a stride-1 fill stream must share one small,
consistent axis. Raw epoch timestamps (ulp(1.3e9 s) = 128 s in float32)
are exposed separately by the *_times helpers for GT association.
"""

import os

import numpy as np
import pytest

from droid_slam_tpu.data import streams


def _write_png(path, h=64, w=80, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    cv2.imwrite(path, rng.integers(0, 255, (h, w, 3), np.uint8))


@pytest.fixture
def tum_dir(tmp_path):
    d = tmp_path / "seq"
    (d / "rgb").mkdir(parents=True)
    # TUM-style epoch-second filenames ~1.3e9 with sub-second spacing —
    # adjacent stamps are NOT representable apart in float32
    base = 1305031102.175304
    for k in range(6):
        _write_png(str(d / "rgb" / f"{base + 0.033 * k:.6f}.png"), 480, 640, k)
    return str(d)


def test_tum_stream_yields_frame_indices(tum_dir):
    items = list(streams.tum_stream(tum_dir, stride=2))
    assert [it[0] for it in items] == [0, 2, 4]
    img = items[0][1]
    assert img.dtype == np.uint8 and img.shape == (240, 320, 3)

    times = streams.tum_times(tum_dir, stride=2)
    assert times.dtype == np.float64 and len(times) == 3
    # sub-second spacing survives in float64 (it would collapse in float32)
    dt = np.diff(times)
    assert np.all(dt > 0.05) and np.all(dt < 0.08)
    assert abs(times[0] - 1305031102.175304) < 1e-6


def test_times_match_stream_length(tum_dir):
    for stride in (1, 2, 3):
        n_stream = len(list(streams.tum_stream(tum_dir, stride=stride)))
        assert len(streams.tum_times(tum_dir, stride=stride)) == n_stream


def test_eth3d_stream_indices_and_lazy_depth(tmp_path, monkeypatch):
    import cv2

    d = tmp_path / "e"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    np.savetxt(str(d / "calibration.txt"), [500.0, 500.0, 320.0, 240.0])
    for k in range(3):
        _write_png(str(d / "rgb" / f"{1000.0 + 0.1 * k:.4f}.png"), 480, 640, k)
        cv2.imwrite(
            str(d / "depth" / f"{1000.0 + 0.1 * k:.4f}.png"),
            np.full((480, 640), 5000, np.uint16),
        )

    mono = list(streams.eth3d_stream(str(d), use_depth=False))
    assert [it[0] for it in mono] == [0, 1, 2]
    assert all(len(it) == 3 for it in mono)

    rgbd = list(streams.eth3d_stream(str(d), use_depth=True))
    assert all(len(it) == 4 for it in rgbd)
    t, img, depth, intr = rgbd[0]
    # depth grid must match the RGB grid exactly (same resize + 8-crop)
    assert depth.shape == img.shape[:2]
    assert np.allclose(depth, 1.0)  # 5000/5000 metres

    times = streams.eth3d_times(str(d))
    assert times.dtype == np.float64 and abs(times[1] - 1000.1) < 1e-9


def test_associate_frames_matches_scalar_oracle():
    """Vectorised nearest-stamp association == the per-frame argmin loop
    (reference rgbd_utils.py:16-33), with and without a pose table."""
    from droid_slam_tpu.data.rgbd_utils import associate_frames

    rng = np.random.default_rng(3)
    ti = np.sort(rng.random(40)) * 10
    td = np.sort(rng.random(37)) * 10
    tp = np.sort(rng.random(55)) * 10
    max_dt = 0.08

    def oracle(tpose):
        out = []
        for i, t in enumerate(ti):
            j = int(np.argmin(np.abs(td - t)))
            if tpose is None:
                if abs(td[j] - t) < max_dt:
                    out.append((i, j))
            else:
                k = int(np.argmin(np.abs(tpose - t)))
                if abs(td[j] - t) < max_dt and abs(tpose[k] - t) < max_dt:
                    out.append((i, j, k))
        return out

    assert associate_frames(ti, td, tp, max_dt=max_dt) == oracle(tp)
    assert associate_frames(ti, td, max_dt=max_dt) == oracle(None)
