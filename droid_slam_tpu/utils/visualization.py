"""Point-cloud visualization and export.

TPU-native equivalent of /root/reference/droid_slam/visualization.py: filter
map points by multi-view consistency (`depth_filter` count ≥ 2 and disparity
above 0.5× the mean, visualization.py:106-111), back-project with `iproj`,
and either export (PLY / npz — always available) or feed a live Open3D viewer
(optional dependency, gated import; the reference hard-requires open3d and a
display)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import lie
from ..ops.vis_ops import depth_filter, iproj_points


def filtered_point_cloud(
    video, filter_thresh: float = 0.005, min_count: float = 2.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (points [M, 3], colors [M, 3] uint8) of the consistent map.

    Mirrors the visualizer's droid_backends.iproj + depth_filter protocol
    (visualization.py:96-111): keep pixels seen consistently by ≥2 neighbor
    keyframes with disparity above half the per-frame mean.
    """
    t = video.counter
    if t == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.uint8)

    # pad the frame count to a multiple of 32: depth_filter/iproj_points are
    # jitted, and slicing to the raw growing t would recompile them on every
    # new keyframe inside the live visualizer thread (each compile dispatched
    # over the device tunnel, stalling tracking)
    B = video.poses.shape[0]
    tp = min(B, -(-t // 32) * 32)
    poses = video.poses[:tp]
    disps = video.disps[:tp]
    intr = video.intrinsics[0]

    inds = jnp.arange(tp)
    # CONSTANT threshold, exactly like the reference (visualization.py:102
    # — its ones_like is shape-only); the mean-disparity scaling belongs to
    # the disparity mask below, not here
    thresh = filter_thresh * jnp.ones((tp,))
    counts = np.asarray(depth_filter(poses, disps, intr, inds, thresh))[:t]
    points = np.asarray(iproj_points(poses, disps, intr))[:t]

    disps_np = np.asarray(disps[:t])
    masks = (counts >= min_count) & (
        disps_np > 0.5 * disps_np.mean(axis=(1, 2), keepdims=True)
    )

    # colors from the stored images, subsampled to the 1/8 grid
    h, w = disps_np.shape[1:]
    images = np.asarray(video.images[:t])[:, 3::8, 3::8][:, :h, :w]

    return points[masks], images[masks]


# wireframe camera model: apex + image plane + an "up" tick
# (reference visualization.py:14-25 CAM_POINTS/CAM_LINES)
_CAM_POINTS = np.array(
    [
        [0, 0, 0],
        [-1, -1, 1.5],
        [1, -1, 1.5],
        [1, 1, 1.5],
        [-1, 1, 1.5],
        [-0.5, 1, 1.5],
        [0.5, 1, 1.5],
        [0, 1.2, 1.5],
    ],
    np.float64,
)
_CAM_LINES = np.array(
    [[1, 2], [2, 3], [3, 4], [4, 1], [1, 0], [0, 2], [3, 0], [0, 4], [5, 7], [7, 6]],
    np.int32,
)


def camera_frusta(poses_w2c: np.ndarray, scale: float = 0.05):
    """Wireframe frusta for all keyframe cameras (reference
    visualization.py:38-45 create_camera_actor, one LineSet per camera;
    here one batched (points, lines) pair for a single merged LineSet).

    poses_w2c: [T, 7] world→camera (t, q_xyzw) as stored in the video.
    Returns (points [T*8, 3] float64, lines [T*10, 2] int32).
    """
    T = len(poses_w2c)
    mats = np.asarray(lie.to_matrix(lie.inv(jnp.asarray(poses_w2c, jnp.float32))))
    local = scale * _CAM_POINTS  # [8, 3]
    pts = mats[:, :3, :3] @ local.T + mats[:, :3, 3:4]  # [T, 3, 8]
    pts = pts.transpose(0, 2, 1).reshape(T * 8, 3)
    lines = (_CAM_LINES[None] + 8 * np.arange(T)[:, None, None]).reshape(-1, 2)
    return pts, lines.astype(np.int32)


def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None):
    """Minimal ASCII PLY writer (no external deps)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i,0]:.6f} {points[i,1]:.6f} {points[i,2]:.6f}"
            if colors is not None:
                row += f" {int(colors[i,0])} {int(colors[i,1])} {int(colors[i,2])}"
            f.write(row + "\n")


def export_map(video, path: str, filter_thresh: float = 0.005):
    """Export the filtered map + camera trajectory."""
    points, colors = filtered_point_cloud(video, filter_thresh)
    save_ply(os.path.join(path, "map.ply"), points, colors)
    t = video.counter
    np.save(os.path.join(path, "poses_c2w.npy"), np.asarray(lie.inv(video.poses[:t])))
    return len(points)


class VisualizerThread:
    """Live map visualization running concurrently with tracking.

    TPU-native analogue of the reference's visualizer *process*
    (/root/reference/droid_slam/droid.py:37-40, visualization.py:60-159): the
    reference shares CUDA tensors across processes and polls a `dirty` flag;
    here the keyframe buffers are host-owned JAX arrays, so a daemon thread
    polling the same `dirty` protocol is the right isolation (device work
    releases the GIL; no shared-memory protocol is needed).

    The thread recomputes the multi-view-consistent point cloud whenever
    keyframes are marked dirty and hands it to ``sink(points, colors)`` —
    an Open3D window when ``open_window`` (and open3d is importable), else
    headless consumers (tests, web streamers). The latest cloud is always
    available as ``.latest``.

    In fused mode tracking state lives on device; polling calls
    ``droid._sync_fused_state()``, which fences the dispatch queue — keep
    ``refresh_hz`` low (default 2) to bound the throughput cost.
    """

    def __init__(
        self,
        droid,
        refresh_hz: float = 2.0,
        sink=None,
        open_window: bool = False,
        filter_thresh: float = 0.005,
    ):
        import threading

        self.droid = droid
        self.refresh_hz = refresh_hz
        self.sink = sink
        self.open_window = open_window
        self.filter_thresh = filter_thresh
        self.latest: Tuple[np.ndarray, np.ndarray] = (
            np.zeros((0, 3)),
            np.zeros((0, 3), np.uint8),
        )
        self.latest_frusta: Tuple[np.ndarray, np.ndarray] = (
            np.zeros((0, 3)),
            np.zeros((0, 2), np.int32),
        )
        self.updates = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="droid-visualizer", daemon=True
        )
        self._thread.start()

    def _poll_once(self) -> bool:
        droid = self.droid
        video = droid.video
        if getattr(droid, "fused", False):
            # view-only: the point cloud needs poses/disps/images only, not
            # the hundreds of MB of fmaps/nets/inps a full sync copies
            droid._sync_fused_state(view_only=True)
        if video.counter == 0 or not video.dirty[: video.counter].any():
            return False
        video.dirty[: video.counter] = False
        self.latest = filtered_point_cloud(video, self.filter_thresh)
        self.latest_frusta = camera_frusta(np.asarray(video.poses[: video.counter]))
        self.updates += 1
        if self.sink is not None:
            self.sink(*self.latest)
        return True

    def scale_filter(self, factor: float):
        """Scale the consistency-filter threshold and force a redraw — the
        reference's S (×2) / A (×0.5) interactive keys
        (visualization.py:68-76, 151-152)."""
        self.filter_thresh *= factor
        video = self.droid.video
        video.dirty[: video.counter] = True

    def _run(self):
        vis = geom = cams = None
        added = False
        if self.open_window:
            try:
                import open3d as o3d

                vis = o3d.visualization.VisualizerWithKeyCallback()
                vis.register_key_callback(ord("S"), lambda v: self.scale_filter(2.0))
                vis.register_key_callback(ord("A"), lambda v: self.scale_filter(0.5))
                vis.create_window(height=540, width=960)
                geom = o3d.geometry.PointCloud()
                cams = o3d.geometry.LineSet()
            except Exception:
                vis = None  # headless fallback: keep .latest/sink working

        fail_streak = 0
        while not self._stop.is_set():
            try:
                updated = self._poll_once()
                fail_streak = 0
            except Exception:
                # tracking may be mid-edit; retry next tick — but a
                # DETERMINISTIC failure must not leave the visualizer
                # silently dead forever
                updated = False
                fail_streak += 1
                if fail_streak == 5:
                    import traceback

                    print("visualizer: poll failing repeatedly:")
                    traceback.print_exc()
            if vis is not None:
                if updated:
                    import open3d as o3d

                    points, colors = self.latest
                    geom.points = o3d.utility.Vector3dVector(points)
                    geom.colors = o3d.utility.Vector3dVector(colors / 255.0)
                    fpts, flines = self.latest_frusta
                    cams.points = o3d.utility.Vector3dVector(fpts)
                    cams.lines = o3d.utility.Vector2iVector(flines)
                    cams.paint_uniform_color((1.0, 0.0, 0.0))
                    if not added:
                        vis.add_geometry(geom)
                        vis.add_geometry(cams)
                        added = True
                    else:
                        vis.update_geometry(geom)
                        vis.update_geometry(cams)
                if not vis.poll_events():
                    break
                vis.update_renderer()
            self._stop.wait(1.0 / self.refresh_hz)
        if vis is not None:
            vis.destroy_window()

    def close(self, timeout: float = 5.0):
        self._stop.set()
        self._thread.join(timeout=timeout)

    def final_update(self):
        """One synchronous refresh from the CURRENT video state — called by
        Droid.terminate after global BA, when the polling thread is already
        closed. Unlike _poll_once this must NOT sync the fused state: the
        video holds the backend-optimized poses/disps, and re-syncing would
        overwrite them with the stale pre-terminate tracking state."""
        video = self.droid.video
        if video.counter == 0:
            return
        video.dirty[: video.counter] = False
        self.latest = filtered_point_cloud(video, self.filter_thresh)
        self.latest_frusta = camera_frusta(np.asarray(video.poses[: video.counter]))
        self.updates += 1
        if self.sink is not None:
            self.sink(*self.latest)


def droid_visualization(video, refresh_hz: float = 10.0):
    """Live Open3D viewer loop polling the video's dirty flags
    (visualization.py:60-159). Optional: requires open3d + a display."""
    try:
        import open3d as o3d
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "open3d is not installed; use export_map() for offline export"
        ) from e

    import time

    vis = o3d.visualization.Visualizer()
    vis.create_window(height=540, width=960)
    geom = o3d.geometry.PointCloud()
    added = False
    while True:
        if video.dirty[: video.counter].any():
            video.dirty[: video.counter] = False
            points, colors = filtered_point_cloud(video)
            geom.points = o3d.utility.Vector3dVector(points)
            geom.colors = o3d.utility.Vector3dVector(colors / 255.0)
            if not added:
                vis.add_geometry(geom)
                added = True
            else:
                vis.update_geometry(geom)
        if not vis.poll_events():
            break
        vis.update_renderer()
        time.sleep(1.0 / refresh_hz)
