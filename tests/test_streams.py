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


@pytest.fixture
def euroc_dir(tmp_path):
    """EuRoC MAV layout: mav0/cam{0,1}/data/<ns>.png at the native 480x752."""
    d = tmp_path / "MH_01"
    for cam in ("cam0", "cam1"):
        (d / "mav0" / cam / "data").mkdir(parents=True)
    base_ns = 1403636579763555584
    for k in range(4):
        name = f"{base_ns + k * 50_000_000}.png"
        _write_png(str(d / "mav0" / "cam0" / "data" / name), 480, 752, k)
        _write_png(str(d / "mav0" / "cam1" / "data" / name), 480, 752, 100 + k)
    return str(d)


def test_euroc_stream_mono_indices_and_intrinsics(euroc_dir):
    items = list(streams.euroc_stream(euroc_dir, stride=2))
    assert [it[0] for it in items] == [0, 2]
    t, img, intr = items[0]
    assert img.dtype == np.uint8 and img.shape == (320, 512, 3)
    # rectified pinhole intrinsics scaled from 480x752 to 320x512
    # (test_euroc.py:31-40): fx,cx by 512/752; fy,cy by 320/480
    np.testing.assert_allclose(
        intr,
        np.array([435.2046959714599 * 512 / 752, 435.2046959714599 * 320 / 480,
                  367.4517211914062 * 512 / 752, 252.2008514404297 * 320 / 480]),
        rtol=1e-6,
    )

    times = streams.euroc_times(euroc_dir, stride=2)
    assert times.dtype == np.float64 and len(times) == 2
    assert abs(times[0] - 1403636579.763555584) < 1e-6
    assert abs(times[1] - times[0] - 0.1) < 1e-6  # ulp(1.4e9) ~ 2.4e-7


def test_euroc_stream_stereo_rectification_matches_cv2(euroc_dir, monkeypatch):
    """The stereo stream must yield [2, H, W, 3] rectified pairs identical
    (to bilinear rounding) whether the remap runs in the native C++ pool or
    through cv2 — and skip frames whose right image is missing."""
    stereo = list(streams.euroc_stream(euroc_dir, stride=1, stereo=True))
    assert [it[0] for it in stereo] == [0, 1, 2, 3]
    assert stereo[0][1].shape == (2, 320, 512, 3)

    # cv2-oracle pass: force the non-native path and compare pixels
    from droid_slam_tpu.data import native_loader as _nl

    monkeypatch.setattr(_nl, "available", lambda: False)
    stereo_cv2 = list(streams.euroc_stream(euroc_dir, stride=1, stereo=True))
    for (ta, ia, _), (tb, ib, _) in zip(stereo, stereo_cv2):
        assert ta == tb
        diff = np.abs(ia.astype(np.int16) - ib.astype(np.int16))
        assert diff.max() <= 2, diff.max()  # bilinear rounding only

    # left and right are DIFFERENT rectification maps: a cam0/cam1 mixup
    # would make the pair identical up to noise statistics
    a = stereo[0][1][0].astype(np.float32)
    b = stereo[0][1][1].astype(np.float32)
    assert np.abs(a - b).mean() > 1.0

    # missing right image -> frame skipped in stereo mode (test_euroc.py:55)
    victim = sorted(
        os.listdir(os.path.join(euroc_dir, "mav0", "cam1", "data"))
    )[1]
    os.remove(os.path.join(euroc_dir, "mav0", "cam1", "data", victim))
    stereo_gap = list(streams.euroc_stream(euroc_dir, stride=1, stereo=True))
    assert [it[0] for it in stereo_gap] == [0, 2, 3]


def test_tartanair_stream_and_ned_dataset(tmp_path):
    """TartanAir: stream shapes/indices/0.8-intrinsics + the training
    reader's NED->camera pose permutation and DEPTH_SCALE handling
    (tartan.py:18-66; validate_tartanair.py:18-39)."""
    import cv2

    scene = tmp_path / "env" / "env" / "Easy" / "P001"
    (scene / "image_left").mkdir(parents=True)
    (scene / "image_right").mkdir()
    (scene / "depth_left").mkdir()

    rng = np.random.default_rng(0)
    F = 8
    raw_poses = np.zeros((F, 7))
    raw_poses[:, 0] = 0.3 * np.arange(F)          # NED x = forward
    raw_poses[:, 1] = 0.05 * np.arange(F)         # NED y = right
    raw_poses[:, 2] = -0.02 * np.arange(F)        # NED z = down
    raw_poses[:, 6] = 1.0                          # identity quat
    np.savetxt(str(scene / "pose_left.txt"), raw_poses, delimiter=" ")
    for k in range(F):
        _write_png(str(scene / "image_left" / f"{k:06d}_left.png"), 64, 80, k)
        _write_png(str(scene / "image_right" / f"{k:06d}_right.png"), 64, 80, 50 + k)
        np.save(str(scene / "depth_left" / f"{k:06d}_left_depth.npy"),
                np.full((64, 80), 10.0, np.float32))

    # ---- validation stream ----
    items = streams.tartanair_stream(str(scene), image_size=(48, 64))
    assert [it[0] for it in items] == list(range(F))
    assert items[0][1].shape == (48, 64, 3)
    np.testing.assert_allclose(
        items[0][2], 0.8 * np.array([320.0, 320.0, 320.0, 240.0]), rtol=1e-6
    )
    st = streams.tartanair_stream(str(scene), image_size=(48, 64), stereo=True)
    assert st[0][1].shape == (2, 48, 64, 3)

    # ---- training reader: NED permutation + depth scale ----
    from droid_slam_tpu.data.dataset import TartanAir

    ds = TartanAir(datapath=str(tmp_path), n_frames=3, do_aug=False,
                   cache_dir=str(tmp_path / "cache"))
    info = ds.scene_info[str(scene)]
    # poses: columns permuted NED [x,y,z,qx,qy,qz,qw] -> camera
    # [y,z,x, qy,qz,qx, qw], translations / DEPTH_SCALE=5
    expect = raw_poses[:, [1, 2, 0, 4, 5, 3, 6]].copy()
    expect[:, :3] /= 5.0
    np.testing.assert_allclose(info["poses"], expect, atol=1e-7)
    # depth_read divides by DEPTH_SCALE
    assert np.allclose(TartanAir.depth_read(info["depths"][0]), 2.0)

    # ---- clip sampling end-to-end (what the trainer consumes) ----
    images, poses, disps, intrinsics = ds[0]
    assert images.shape == (3, 64, 80, 3) and disps.shape == (3, 64, 80)
    # scene rescaled to unit mean disparity (base.py:144-148)
    assert abs(disps[disps > 0.01].mean() - 1.0) < 1e-5
    assert intrinsics.shape == (3, 4)

    # the pickled covisibility cache must be honoured on re-open
    ds2 = TartanAir(datapath=str(tmp_path), n_frames=3, do_aug=False,
                    cache_dir=str(tmp_path / "cache"))
    assert str(scene) in ds2.scene_info
