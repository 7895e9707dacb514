"""End-to-end runtime smoke tests on a tiny synthetic sequence.

With randomly-initialised weights the SLAM estimates are meaningless, but the
full pipeline — motion filter → frontend init/update (graph edits, keyframe
culling, sliding-window DBA) → backend global BA → trajectory filler — must
run, keep static shapes, and produce finite state. This exercises the entire
host/device protocol that the reference only tests implicitly by running
demos (SURVEY §4).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from droid_slam_tpu.runtime import Droid, DroidConfig

rng = np.random.default_rng(5432)


def make_config():
    return DroidConfig(
        image_size=(64, 64),
        buffer=32,
        warmup=4,
        max_factors=16,
        inactive_pad=16,
        window_pad=16,
        schur_pair_floor=512,
        filter_thresh=-1.0,  # random weights: force every frame to keyframe
        keyframe_thresh=0.0,  # and never cull (distance is arbitrary)
        frontend_window=8,
        frontend_thresh=1e9,  # accept any proximity edge the NMS allows
        backend_thresh=1e9,
    )


def frame_stream(n=8, hw=64):
    for t in range(n):
        img = rng.integers(0, 255, (hw, hw, 3), np.uint8)
        intr = np.array([hw, hw, hw / 2, hw / 2], np.float32)
        yield t, jnp.asarray(img), jnp.asarray(intr)


@pytest.fixture(scope="module", params=[False, True], ids=["hostloop", "fused"])
def droid(request):
    return Droid(make_config(), fused=request.param)


def test_track_and_terminate(droid):
    stream = list(frame_stream(8))
    for (t, img, intr) in stream:
        droid.track(t, img, intrinsics=intr)

    if droid.fused:
        droid._sync_fused_state()
        assert bool(droid._fused_state.is_init)
    else:
        assert droid.frontend.is_initialized
    v = droid.video
    assert v.counter >= droid.config.warmup
    poses = np.asarray(v.poses[: v.counter])
    disps = np.asarray(v.disps[: v.counter])
    assert np.all(np.isfinite(poses))
    assert np.all(np.isfinite(disps))
    # quaternions stay normalised through the retractions
    qn = np.linalg.norm(poses[:, 3:], axis=-1)
    assert np.abs(qn - 1).max() < 1e-3

    t = v.counter
    traj = droid.terminate(iter(stream))
    assert traj.shape == (8, 7)
    assert np.all(np.isfinite(traj))
    # terminate must restore the keyframe counter after the temporary appends
    assert v.counter == t


def test_stereo_tracking_smoke():
    """Stereo rig: frames [2, H, W, 3]; self-edges carry the fixed baseline
    (projective_ops.py:106) and both fmaps land in the rig axis."""
    import dataclasses

    config = dataclasses.replace(make_config(), stereo=True, buffer=16)
    d = Droid(config, fused=True)
    for t in range(5):
        img = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), np.uint8))
        intr = jnp.asarray([64.0, 64.0, 32.0, 32.0], jnp.float32)
        d.track(t, img, intrinsics=intr)
    d._sync_fused_state()
    v = d.video
    assert v.counter >= config.warmup
    assert np.all(np.isfinite(np.asarray(v.poses[: v.counter])))
    assert np.all(np.isfinite(np.asarray(v.disps[: v.counter])))


def test_live_visualizer_runs_during_tracking():
    """The visualizer thread (reference droid.py:37-40 process analogue) must
    produce filtered point clouds concurrently with tracking, headlessly."""
    import time

    d = Droid(make_config(), fused=True, visualize=False)
    from droid_slam_tpu.utils.visualization import VisualizerThread

    clouds = []
    vis = VisualizerThread(
        d, refresh_hz=20.0, sink=lambda p, c: clouds.append((p, c)),
        open_window=False,
    )
    try:
        for (t, img, intr) in frame_stream(8):
            d.track(t, img, intrinsics=intr)
        deadline = time.time() + 30.0
        while vis.updates == 0 and time.time() < deadline:
            time.sleep(0.1)
    finally:
        vis.close()
    assert vis.updates > 0
    points, colors = vis.latest
    assert points.ndim == 2 and points.shape[1] == 3
    assert colors.shape == points.shape
    assert len(clouds) == vis.updates

    # terminate must stop the poller BEFORE global BA (a poll's fused-state
    # sync would overwrite the backend-optimized poses) and then push one
    # final refresh of the optimized map to the sink
    d.visualizer = vis
    n_before = vis.updates
    d.terminate()
    assert not vis._thread.is_alive()
    assert vis.updates == n_before + 1
    assert len(clouds) == vis.updates


def test_camera_frusta_and_filter_keys():
    """Camera frusta geometry (reference visualization.py:14-45) and the
    S/A filter-threshold keys (visualization.py:68-76, 151-152)."""
    from droid_slam_tpu.utils.visualization import (
        VisualizerThread,
        camera_frusta,
    )

    # identity pose: apex at the origin, image-plane corners at z=1.5*scale
    pts, lines = camera_frusta(
        np.array([[0, 0, 0, 0, 0, 0, 1]], np.float32), scale=0.1
    )
    assert pts.shape == (8, 3) and lines.shape == (10, 2)
    assert np.allclose(pts[0], 0.0, atol=1e-6)
    assert np.allclose(pts[1:, 2], 0.15, atol=1e-6)

    # w2c translation +1z => camera center (c2w) at -1z; lines offset per cam
    pts2, lines2 = camera_frusta(
        np.array([[0, 0, 0, 0, 0, 0, 1], [0, 0, 1, 0, 0, 0, 1]], np.float32),
        scale=0.1,
    )
    assert np.allclose(pts2[8], [0, 0, -1], atol=1e-5)
    assert (lines2[10:] == lines + 8).all()

    # S/A keys scale the threshold and force a redraw via the dirty flags
    d = Droid(make_config(), fused=True, visualize=False)
    for (t, img, intr) in frame_stream(5):
        d.track(t, img, intrinsics=intr)
    vis = VisualizerThread(d, refresh_hz=20.0, open_window=False)
    try:
        import time

        deadline = time.time() + 30.0
        while vis.updates == 0 and time.time() < deadline:
            time.sleep(0.1)
        assert vis.updates > 0
        assert vis.latest_frusta[0].shape[0] == 8 * d.video.counter
        t0 = vis.filter_thresh
        vis.scale_filter(2.0)
        assert vis.filter_thresh == 2 * t0
        assert d.video.dirty[: d.video.counter].all()
        vis.scale_filter(0.5)
        assert vis.filter_thresh == t0
    finally:
        vis.close()


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "hostloop"])
def test_rgbd_depth_prior_seeds_disparity(fused):
    """RGB-D end-to-end: the sensor depth prior must be stored inverted
    (depth_video.py:67-69), activate the alpha term in BA (droid.cpp:766-770)
    so tracked disparities are pulled toward the prior, and survive
    terminate — in BOTH engines."""
    config = make_config()
    d = Droid(config, fused=fused)
    depth_val = 2.0
    stream = []
    for t in range(6):
        img = jnp.asarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
        depth = jnp.full((64, 64), depth_val, jnp.float32)
        intr = jnp.asarray([64.0, 64.0, 32.0, 32.0], jnp.float32)
        stream.append((t, img, intr))
        d.track(t, img, depth=depth, intrinsics=intr)
    if fused:
        d._sync_fused_state()
    v = d.video
    sens = np.asarray(v.disps_sens[: v.counter])
    assert np.allclose(sens, 1.0 / depth_val, atol=1e-5)
    disps = np.asarray(v.disps[: v.counter])
    assert np.all(np.isfinite(disps))
    # the alpha prior term dominates when flow confidence is uninformative
    # (random weights): tracked disparities must sit near the prior, not at
    # the 1.0 init value
    assert np.abs(np.median(disps) - 1.0 / depth_val) < 0.2, np.median(disps)

    traj = d.terminate(iter(stream))
    assert traj.shape == (6, 7) and np.all(np.isfinite(traj))
    disps = np.asarray(v.disps[: v.counter])
    assert np.abs(np.median(disps) - 1.0 / depth_val) < 0.2, np.median(disps)


def test_filter_edges_drops_weak_long_range():
    """filter_edges removes |i-j|>2 edges whose mean confidence fell below
    1e-3 and blacklists the pair (reference factor_graph.py:71-78). The
    shipped pipeline never calls it (same as the reference); this pins the
    public API for direct FactorGraph users."""
    import jax.numpy as jnp

    from droid_slam_tpu.runtime.factor_graph import FactorGraph
    from droid_slam_tpu.runtime.video import VideoState

    config = make_config()
    v = VideoState(config)
    v.counter = 8
    graph = FactorGraph(
        v, None, max_factors=16, inactive_pad=16, window_pad=16,
        schur_pair_floor=512, edge_pad=16,
    )
    ii = np.asarray([0, 1, 0, 1], np.int32)
    jj = np.asarray([1, 3, 5, 7], np.int32)  # ranges 1, 2, 5, 6
    graph.add_factors(ii, jj)
    # give ONE long-range edge confident weights; leave the rest at zero
    w = np.zeros(graph.edges.weight.shape, np.float32)
    w[3] = 0.9  # the (1, 7) edge survives
    graph.edges = graph.edges._replace(weight=jnp.asarray(w))

    graph.filter_edges()

    kept = {(int(a), int(b))
            for a, b in zip(graph.ii[graph.valid], graph.jj[graph.valid])}
    # short-range edges are exempt regardless of confidence; weak long-range
    # edges drop and are blacklisted
    assert kept == {(0, 1), (1, 3), (1, 7)}, kept
    assert graph.bad_edges == {(0, 5)}, graph.bad_edges


def test_init_graph_exceeds_max_factors():
    """max_factors is the reference's eviction THRESHOLD, not a capacity:
    remove=False appends past it (factor_graph.py:102-107), and the tum/euroc
    initialization neighborhood (6*warmup - 12 edges) is larger than 48.
    A store capped at max_factors silently dropped half the init graph."""
    import dataclasses

    from droid_slam_tpu.runtime.factor_graph import FactorGraph
    from droid_slam_tpu.runtime.video import VideoState

    config = dataclasses.replace(make_config(), warmup=12, max_factors=16)
    v = VideoState(config)
    v.counter = 12
    graph = FactorGraph(
        v, None, max_factors=config.max_factors, inactive_pad=16,
        window_pad=16, schur_pair_floor=512,
        edge_pad=6 * config.warmup - 12,
    )
    # tum-style init neighborhood: |i-j| <= 3 over 12 keyframes = 60 edges
    ii, jj = [], []
    for a in range(12):
        for b in range(12):
            if a != b and abs(a - b) <= 3:
                ii.append(a)
                jj.append(b)
    assert len(ii) == 60
    graph.add_factors(np.asarray(ii, np.int32), np.asarray(jj, np.int32))
    assert graph.num_active == 60  # NOT truncated at max_factors=16

    # remove=True evicts back down to the max_factors steady-state count
    graph.add_factors(
        np.asarray([0, 1], np.int32), np.asarray([5, 6], np.int32), remove=True
    )
    assert graph.num_active == graph.max_factors


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])
