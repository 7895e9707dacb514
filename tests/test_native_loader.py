"""Native host data pipeline vs cv2 oracle.

Mirrors the reference's CPU-as-oracle test pattern
(/root/reference/tests/test_droid_backends.py:8): cv2 (the implementation the
reference streams use, demo.py:25-60) is the oracle for the C++ library —
decode, resize, undistort/remap, 16-bit depth PNGs, and the ordered prefetch
pipeline.
"""

import os
import tempfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from droid_slam_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(), reason="native lib unavailable")

rng = np.random.default_rng(5432)


def _smooth_image(h, w):
    """Low-frequency random image (keeps JPEG loss + bilinear tolerances tight)."""
    small = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)


def test_png_decode_matches_cv2():
    img = _smooth_image(48, 64)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.png")
        cv2.imwrite(p, img[..., ::-1])  # cv2 writes BGR
        got = nl.imread(p)
    assert got is not None and got.shape == img.shape
    assert np.array_equal(got, img)  # PNG is lossless → exact


def test_jpeg_decode_close_to_cv2():
    img = _smooth_image(48, 64)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.jpg")
        cv2.imwrite(p, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        got = nl.imread(p)
        want = cv2.imread(p)[..., ::-1]
    assert got.shape == want.shape
    # both decode the same bitstream; IDCT rounding may differ by ±1
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_depth16_png_exact():
    depth = rng.integers(0, 60000, (40, 52), np.uint16)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "d.png")
        cv2.imwrite(p, depth)
        got = nl.imread(p)
    assert got.dtype == np.uint16
    assert np.array_equal(got, depth)


def test_resize_matches_cv2():
    img = _smooth_image(48, 64)
    got = nl.resize(img, (30, 40))
    want = cv2.resize(img, (40, 30), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_undistort_matches_cv2():
    img = _smooth_image(60, 80)
    K = np.array([[70.0, 0, 40], [0, 70.0, 30], [0, 0, 1]])
    dist = [0.1, -0.05, 0.001, -0.002, 0.01]
    got = nl.undistort(img, K, dist)
    want = cv2.undistort(img, K, np.asarray(dist))
    # interiors must agree; borders differ (cv2.undistort clamps, we zero-fill)
    gi = got[4:-4, 4:-4].astype(int)
    wi = want[4:-4, 4:-4].astype(int)
    assert np.abs(gi - wi).max() <= 2


def test_rectify_map_matches_cv2():
    K = np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1]])
    d = np.array([-0.28, 0.07, 0.0002, 0.00002, 0.0])
    R = cv2.Rodrigues(np.array([0.01, -0.02, 0.005]))[0]
    P = np.array([[435.0, 0, 367.0], [0, 435.0, 252.0], [0, 0, 1]])
    mx_cv, my_cv = cv2.initUndistortRectifyMap(K, d, R, P, (128, 96), cv2.CV_32FC1)
    mx, my = nl.build_undistort_rectify_map(K, d, (128, 96), R=R, P=P)
    assert np.abs(mx - mx_cv).max() < 1e-2
    assert np.abs(my - my_cv).max() < 1e-2


def test_pipeline_ordered_prefetch():
    with tempfile.TemporaryDirectory() as d:
        paths, imgs = [], []
        for i in range(12):
            img = _smooth_image(40, 48)
            p = os.path.join(d, f"{i:03d}.png")
            cv2.imwrite(p, img[..., ::-1])
            paths.append(p)
            imgs.append(img)
        pipe = nl.Pipeline(paths, resize_hw=(24, 32), n_threads=3, window=4)
        outs = list(pipe)
        pipe.close()
    assert len(outs) == 12
    for img, out in zip(imgs, outs):
        want = cv2.resize(img, (32, 24), interpolation=cv2.INTER_LINEAR)
        assert out.shape == want.shape
        assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


if __name__ == "__main__":
    import pytest as _pytest

    _pytest.main(["-x", __file__, "-q"])


def test_tum_stream_native_matches_cv2_path(monkeypatch, tmp_path):
    """The TUM stream must yield identical-shape RGB frames and intrinsics
    whichever IO backend is active (color-order regression guard)."""
    from droid_slam_tpu.data import streams

    rgbdir = tmp_path / "rgb"
    rgbdir.mkdir()
    for i in range(3):
        img = _smooth_image(480, 640)
        cv2.imwrite(str(rgbdir / f"13053621{i}.5.png"), img[..., ::-1])

    native = [f for f in streams.tum_stream(str(tmp_path), stride=1)]
    monkeypatch.setattr(streams._nl, "available", lambda: False)
    fallback = [f for f in streams.tum_stream(str(tmp_path), stride=1)]

    assert len(native) == len(fallback) == 3
    for (t0, im0, k0), (t1, im1, k1) in zip(native, fallback):
        assert t0 == t1 and im0.shape == im1.shape == (240, 320, 3)
        assert np.allclose(k0, k1)
        # undistort borders differ (zero-fill vs clamp); compare interiors
        d = np.abs(im0[20:-20, 20:-20].astype(int) - im1[20:-20, 20:-20].astype(int))
        assert d.max() <= 3 and d.mean() < 0.3


def test_corrupt_images_fail_gracefully(tmp_path):
    """Truncated/corrupt files must return None — NOT exit() the process
    (libjpeg's default error_exit) or free an uninitialized pointer."""
    from droid_slam_tpu.data import native_loader as nl

    if not nl.available():
        import pytest

        pytest.skip("native loader unavailable")

    bad_jpg = tmp_path / "bad.jpg"
    bad_jpg.write_bytes(b"\xff\xd8\xff\xe0garbage-not-a-jpeg")
    assert nl.imread(str(bad_jpg)) is None

    bad_png = tmp_path / "bad.png"
    bad_png.write_bytes(b"\x89PNG\r\n\x1a\ngarbage")
    assert nl.imread(str(bad_png)) is None

    # truncated but valid-header JPEG: encode a real image, cut it short
    img = _smooth_image(64, 64)
    ok_path = tmp_path / "ok.jpg"
    cv2.imwrite(str(ok_path), img[..., ::-1])
    data = ok_path.read_bytes()
    trunc = tmp_path / "trunc.jpg"
    trunc.write_bytes(data[: len(data) // 2])
    # libjpeg may recover a partial image or fail; either way: no crash,
    # and a returned image has the full declared shape
    out = nl.imread(str(trunc))
    if out is not None:
        assert out.shape == (64, 64, 3)

    missing = nl.imread(str(tmp_path / "nope.png"))
    assert missing is None


def test_pipeline_skips_corrupt_frames(tmp_path):
    """The prefetch pipeline must deliver the good frames in order and skip
    undecodable ones (status -1 path)."""
    from droid_slam_tpu.data import native_loader as nl

    if not nl.available():
        import pytest

        pytest.skip("native loader unavailable")

    paths = []
    for i in range(4):
        p = tmp_path / f"f{i}.png"
        if i == 2:
            p.write_bytes(b"\x89PNG\r\n\x1a\ngarbage")
        else:
            cv2.imwrite(str(p), _smooth_image(32, 48)[..., ::-1])
        paths.append(str(p))

    frames = list(nl.Pipeline(paths, n_threads=2, window=4))
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (32, 48, 3)
