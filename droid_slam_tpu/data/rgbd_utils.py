"""RGB-D dataset utilities: frame association, covisibility distance
matrices, TUM-format loading.

TPU-native equivalent of /root/reference/droid_slam/data_readers/rgbd_utils.py
(the flow-distance computation is a jitted JAX kernel instead of chunked
torch+lietorch calls)."""

from __future__ import annotations

import functools
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..ops import projective as pops


def parse_list(filepath: str, skiprows: int = 0) -> np.ndarray:
    return np.loadtxt(filepath, delimiter=" ", dtype=np.str_, skiprows=skiprows)


def _nearest(ts: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Index into ``table`` of the nearest timestamp for every entry of
    ``ts`` — one [len(ts), len(table)] broadcast instead of a per-frame
    scan (TUM sequences are a few thousand stamps; the matrix is tiny)."""
    return np.argmin(np.abs(ts[:, None] - table[None, :]), axis=1)


def associate_frames(tstamp_image, tstamp_depth, tstamp_pose=None,
                     max_dt: float = 1.0):
    """Match every image stamp to its nearest depth (and pose) stamp,
    keeping frames where all matches land within ``max_dt`` seconds.
    TUM-association semantics (format spec; reference rgbd_utils.py:16-33),
    expressed as vectorised nearest-neighbor queries. Returns an (i, j[, k])
    tuple list over (image, depth[, pose]) row indices."""
    t = np.asarray(tstamp_image, np.float64)
    td = np.asarray(tstamp_depth, np.float64)
    j = _nearest(t, td)
    ok = np.abs(td[j] - t) < max_dt
    cols = [np.arange(len(t)), j]
    if tstamp_pose is not None:
        tp = np.asarray(tstamp_pose, np.float64)
        k = _nearest(t, tp)
        ok &= np.abs(tp[k] - t) < max_dt
        cols.append(k)
    keep = np.flatnonzero(ok)
    return [tuple(int(c[i]) for c in cols) for i in keep]


def loadtum(datapath: str, frame_rate: int = -1):
    """Read a TUM-RGBD-format sequence (format per reference
    rgbd_utils.py:36-91), associated by timestamp and subsampled ×5.

    Returns (image_paths, depth_paths, poses[t,q], intrinsics, tstamps)."""
    pose_file = next(
        (p for p in ("groundtruth.txt", "pose.txt")
         if osp.isfile(osp.join(datapath, p))),
        None,
    )
    if pose_file is None:
        return None, None, None, None, None

    image_data = parse_list(osp.join(datapath, "rgb.txt"))
    depth_data = parse_list(osp.join(datapath, "depth.txt"))
    pose_data = parse_list(osp.join(datapath, pose_file), skiprows=1)

    pairs = associate_frames(
        image_data[:, 0].astype(np.float64),
        depth_data[:, 0].astype(np.float64),
        pose_data[:, 0].astype(np.float64),
    )
    sel = np.asarray(pairs[::5], np.int64).reshape(-1, 3)
    i, j, k = sel.T

    calib_path = osp.join(datapath, "calibration.txt")
    intrinsic = (
        np.loadtxt(calib_path, delimiter=" ").astype(np.float64)
        if osp.isfile(calib_path)
        else None
    )

    images = [osp.join(datapath, p) for p in image_data[i, 1]]
    depths = [osp.join(datapath, p) for p in depth_data[j, 1]]
    poses = list(pose_data[k, 1:].astype(np.float64))
    tstamps = list(image_data[i, 0].astype(np.float64))
    intrinsics = [] if intrinsic is None else [intrinsic] * len(images)
    return images, depths, poses, intrinsics, tstamps


def pose_matrix_to_quaternion(pose: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(pose[:3, :3]).as_quat()
    return np.concatenate([pose[:3, 3], q], axis=0)


@functools.partial(jax.jit, static_argnames=())
def _flow_chunk(poses_w2c, disps, intrinsics, ii, jj):
    """Bidirectional mean induced-flow magnitude for a chunk of frame pairs
    (rgbd_utils.py:105-142): clamped at 100 px, ∞ (encoded 1e9) if <70% of
    pixels stay valid both ways."""
    MAX_FLOW = 100.0

    def one_way(a, b):
        flow, val = pops.induced_flow(poses_w2c, disps, intrinsics, a, b)
        mag = jnp.minimum(jnp.linalg.norm(flow, axis=-1), MAX_FLOW)
        return mag, val[..., 0]

    m1, v1 = one_way(ii, jj)
    m2, v2 = one_way(jj, ii)
    mag = jnp.concatenate([m1.reshape(m1.shape[0], -1), m2.reshape(m2.shape[0], -1)], -1)
    val = jnp.concatenate([v1.reshape(v1.shape[0], -1), v2.reshape(v2.shape[0], -1)], -1)
    mean_val = jnp.mean(val, axis=-1)
    mean_mag = jnp.sum(mag * val, axis=-1) / jnp.maximum(jnp.sum(val, axis=-1), 1e-6)
    return jnp.where(mean_val < 0.7, 1e9, mean_mag)


def compute_distance_matrix_flow(
    poses_c2w: np.ndarray, disps: np.ndarray, intrinsics: np.ndarray, chunk: int = 2048
) -> np.ndarray:
    """All-pairs covisibility (flow) distance matrix. poses_c2w: [N, 7]
    camera-to-world (the reference inverts on entry, rgbd_utils.py:108-110)."""
    N = len(poses_c2w)
    poses_w2c = lie.inv(jnp.asarray(poses_c2w, jnp.float32))
    disps_j = jnp.asarray(disps, jnp.float32)
    intr_j = jnp.asarray(intrinsics, jnp.float32)
    return _all_pairs_chunked(
        N, chunk, lambda a, b: _flow_chunk(poses_w2c, disps_j, intr_j, a, b)
    )


def _all_pairs_chunked(N: int, chunk: int, chunk_fn) -> np.ndarray:
    """Run a jitted per-pair distance kernel over all N*N frame pairs in
    fixed-size chunks (the last one padded so every call compiles to the
    same shape); 1e9 sentinel -> inf."""
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)

    matrix = np.zeros(N * N, np.float32)
    for s in range(0, N * N, chunk):
        a = ii[s : s + chunk]
        b = jj[s : s + chunk]
        pad = chunk - len(a)
        ap = np.pad(a, (0, pad)).astype(np.int32)
        bp = np.pad(b, (0, pad)).astype(np.int32)
        d = np.asarray(chunk_fn(jnp.asarray(ap), jnp.asarray(bp)))
        matrix[s : s + len(a)] = d[: len(a)]

    matrix = matrix.reshape(N, N)
    matrix[matrix >= 1e9] = np.inf
    return matrix


@jax.jit
def _flow2_chunk(poses_w2c, disps, intrinsics, ii, jj, beta):
    """Blended translation-only + beta·full-SE3 flow magnitude per pair, both
    directions (rgbd_utils.py:145-190 compute_distance_matrix_flow2; the
    fork's flow2b/val indexing typo — it reuses (ii, jj) for the reverse
    direction — is corrected to the symmetric intent)."""
    MAX_FLOW = 128.0
    ht, wd = disps.shape[-2:]
    grid = pops.coords_grid(ht, wd)

    def tonly_flow(a, b):
        Gij = pops.relative_poses(poses_w2c, a, b)
        X0 = pops.iproj(jnp.take(disps, a, axis=0), jnp.take(intrinsics, a, axis=0))
        X1 = X0.at[..., :3].add(X0[..., 3:4] * lie.translation(Gij)[:, None, None, :])
        intr_b = jnp.take(intrinsics, b, axis=0)
        fx, fy, cx, cy = (intr_b[:, k, None, None] for k in range(4))
        Z = X1[..., 2]
        zi = 1.0 / jnp.where(Z < 0.1, jnp.ones_like(Z), Z)
        u = fx * X1[..., 0] * zi + cx
        v = fy * X1[..., 1] * zi + cy
        flow = jnp.stack([u, v], -1) - grid
        val = (Z > 0.2).astype(disps.dtype)
        return flow, val

    def full_flow(a, b):
        f, val = pops.induced_flow(poses_w2c, disps, intrinsics, a, b)
        return f, val[..., 0]

    def one_way(a, b):
        fa, va = tonly_flow(a, b)
        fb, vb = full_flow(a, b)
        mag = jnp.minimum(
            jnp.linalg.norm(fa + beta * fb, axis=-1), MAX_FLOW
        )
        return mag, va * vb

    m1, v1 = one_way(ii, jj)
    m2, v2 = one_way(jj, ii)
    mag = jnp.concatenate(
        [m1.reshape(m1.shape[0], -1), m2.reshape(m2.shape[0], -1)], -1
    )
    val = jnp.concatenate(
        [v1.reshape(v1.shape[0], -1), v2.reshape(v2.shape[0], -1)], -1
    )
    mean_val = jnp.mean(val, axis=-1)
    mean_mag = jnp.sum(mag * val, axis=-1) / jnp.maximum(jnp.sum(val, axis=-1), 1e-6)
    return jnp.where(mean_val < 0.8, 1e9, mean_mag)


def compute_distance_matrix_flow2(
    poses_c2w: np.ndarray,
    disps: np.ndarray,
    intrinsics: np.ndarray,
    beta: float = 0.4,
    chunk: int = 2048,
) -> np.ndarray:
    """All-pairs blended-flow distance (rgbd_utils.py:145-190), feeding the
    NMS graph builder `build_frame_graph_v2`."""
    N = len(poses_c2w)
    poses_w2c = lie.inv(jnp.asarray(poses_c2w, jnp.float32))
    disps_j = jnp.asarray(disps, jnp.float32)
    intr_j = jnp.asarray(np.broadcast_to(intrinsics, (N, 4)), jnp.float32)
    return _all_pairs_chunked(
        N, chunk,
        lambda a, b: _flow2_chunk(poses_w2c, disps_j, intr_j, a, b,
                                  jnp.float32(beta)),
    )
