"""Keyframe video buffer: fixed-capacity device-resident SLAM state.

TPU-native equivalent of /root/reference/droid_slam/depth_video.py. The
reference preallocates a ring of shared-memory CUDA tensors guarded by a
multiprocessing lock; here the same layout is a set of HBM arrays owned by a
single host object — static capacity is exactly what XLA's static-shape world
wants, and the single-writer runtime needs no lock. Updates go through small
jitted kernels with donated buffers so XLA performs them in place.

Conventions (identical to the reference, depth_video.py:24-45):
  * poses [B, 7] world→camera SE3 (t, q_xyzw), identity-initialised
  * disps [B, h, w] inverse depth at 1/8 resolution, init 1.0
  * disps_sens: RGB-D prior — input depth subsampled at pixel (3::8, 3::8)
    and inverted where valid (depth_video.py:67-69)
  * intrinsics [B, 4] = (fx, fy, cx, cy) at 1/8 resolution
  * fmaps/nets/inps: matching features, GRU hidden init, context features
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..ops import projective as pops

Array = jax.Array


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_range(buf: Array, start, values):
    """Write `values` into buf[start : start + len(values)] (one dispatch —
    the trajectory filler appends 16 frames per batch; per-slot writes cost
    a dispatch each over a remote-device tunnel)."""
    values = jnp.asarray(values).astype(buf.dtype)
    pad = [(0, values.shape[0])] + [(0, 0)] * (buf.ndim - 1)
    grown = jnp.pad(buf, pad)
    out = jax.lax.dynamic_update_slice(grown, values, (start,) + (0,) * (buf.ndim - 1))
    return out[: buf.shape[0]]


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_slot(buf: Array, idx, value):
    # explicit cast: the fused runtime hands back bf16 fmaps while this
    # host-driven buffer may be f32 (and vice versa after _sync_fused_state)
    return buf.at[idx].set(jnp.asarray(value).astype(buf.dtype))


@functools.partial(jax.jit, static_argnames=("ht", "wd"))
def _depth_to_disp_sens(depth: Array, ht: int, wd: int) -> Array:
    """Input depth [H, W] → inverse-depth prior at 1/8 res (3::8 sampling)."""
    d = depth[3::8, 3::8][:ht, :wd]
    return jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)


@jax.jit
def _frame_distance(
    poses: Array, disps: Array, intrinsics0: Array, ii: Array, jj: Array, beta: Array
) -> Array:
    """Mean induced-flow magnitude per frame pair, blending full-SE3 flow with
    translation-only flow by beta; 1000.0 where <75% of pixels land in front
    of the camera (src/droid_kernels_cpu.cc:389-472)."""
    ht, wd = disps.shape[-2:]
    grid = pops.coords_grid(ht, wd)

    Gij = pops.relative_poses(poses, ii, jj)
    X0 = pops.iproj(jnp.take(disps, ii, axis=0), jnp.broadcast_to(intrinsics0, ii.shape + (4,)))

    fx, fy, cx, cy = intrinsics0

    def flow_mag(X1):
        Z = X1[..., 2]
        # guard the division like the reference kernel, which only
        # accumulates d inside its Z > MIN_DEPTH branch
        # (src/droid_kernels_cpu.cc:440-465): an unguarded Z == 0 gives
        # u = inf, d = inf, and d * ok = inf * 0 = NaN — one such pixel
        # NaNs the whole pair distance and then defeats every jnp.where /
        # argmin in the proximity scan (NaN comparisons are False)
        Zs = jnp.where(Z < 0.5 * pops.MIN_DEPTH_NATIVE, 1.0, Z)
        u = fx * X1[..., 0] / Zs + cx
        v = fy * X1[..., 1] / Zs + cy
        d = jnp.sqrt((u - grid[..., 0]) ** 2 + (v - grid[..., 1]) ** 2)
        ok = (Z > pops.MIN_DEPTH_NATIVE).astype(d.dtype)
        return d, ok

    # full SE3 flow
    X1 = lie.act(Gij[:, None, None, :], X0)
    d1, ok1 = flow_mag(X1)
    # translation-only flow
    X1t = X0.at[..., :3].add(X0[..., 3:4] * lie.translation(Gij)[:, None, None, :])
    d2, ok2 = flow_mag(X1t)

    accum = beta * jnp.sum(d1 * ok1, axis=(1, 2)) + (1 - beta) * jnp.sum(d2 * ok2, axis=(1, 2))
    valid = beta * jnp.sum(ok1, axis=(1, 2)) + (1 - beta) * jnp.sum(ok2, axis=(1, 2))
    total = float(ht * wd)
    frac = valid / (total + 1e-8)
    return jnp.where(frac < 0.75, 1000.0, accum / jnp.maximum(valid, 1e-8))


def read_window(buf: Array, kf0: Array, K: int) -> Array:
    """Dynamic-slice buf[kf0 : kf0+K] with zero padding past the end
    (K is static; kf0 is traced). Shared by both tracking engines."""
    zeros = ((0, 0),) * (buf.ndim - 1)
    pad = jnp.pad(buf, ((0, K),) + zeros)
    start = (kf0,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_slice(pad, start, (K,) + buf.shape[1:])


def persist_window(buf: Array, new_win: Array, touched: Array, kf0: Array) -> Array:
    """Write new_win into buf[kf0 : kf0+K] at frames where `touched`, keeping
    untouched frames — the padded dynamic-slice/update dance both engines use
    to maintain per-keyframe damping and upsampled disparities."""
    K = new_win.shape[0]
    zeros = ((0, 0),) * (buf.ndim - 1)
    start = (kf0,) + (0,) * (buf.ndim - 1)
    pad = jnp.pad(buf, ((0, K),) + zeros)
    cur = jax.lax.dynamic_slice(pad, start, new_win.shape)
    new = jnp.where(touched.reshape((K,) + (1,) * (buf.ndim - 1)), new_win, cur)
    return jax.lax.dynamic_update_slice(pad, new, start)[: buf.shape[0]]


@jax.jit
def _reproject(poses, disps, intrinsics, ii, jj):
    return pops.projective_transform(poses, disps, intrinsics, ii, jj)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _normalize(poses: Array, disps: Array, count: Array):
    """Fix the monocular gauge: unit mean inverse depth (depth_video.py:132-139)."""
    live = (jnp.arange(disps.shape[0]) < count).astype(disps.dtype)
    s = jnp.sum(disps * live[:, None, None]) / (
        jnp.maximum(count, 1) * disps.shape[1] * disps.shape[2]
    )
    disps = jnp.where(live[:, None, None] > 0, disps / s, disps)
    t = jnp.where(live[:, None] > 0, poses[:, :3] * s, poses[:, :3])
    poses = jnp.concatenate([t, poses[:, 3:]], axis=-1)
    return poses, disps


class VideoState:
    """Host-owned handle to the device-resident keyframe buffers."""

    def __init__(self, config):
        B = config.buffer
        H, W = config.image_size
        h, w = config.feat_size
        self.config = config
        self.counter = 0  # host-side keyframe count (single-writer runtime)

        self.tstamp = jnp.zeros((B,), jnp.float32)
        self.images = jnp.zeros((B, H, W, 3), jnp.uint8)
        self.dirty = np.zeros((B,), bool)  # host flag for the visualizer
        self.poses = jnp.tile(lie.identity((1,)), (B, 1))
        self.disps = jnp.ones((B, h, w), jnp.float32)
        self.disps_sens = jnp.zeros((B, h, w), jnp.float32)
        self.disps_up = jnp.zeros((B, H, W), jnp.float32)
        self.intrinsics = jnp.zeros((B, 4), jnp.float32)

        rig = 2 if config.stereo else 1
        self.fmaps = jnp.zeros((B, rig, h, w, 128), jnp.float32)
        self.nets = jnp.zeros((B, h, w, 128), jnp.float32)
        self.inps = jnp.zeros((B, h, w, 128), jnp.float32)

    # ------------------------------------------------------------------ state

    def append(
        self,
        tstamp: float,
        image: Array,  # [H, W, 3] uint8 RGB (or [rig, H, W, 3] stereo)
        pose: Optional[Array],
        disp: Optional[float],
        depth: Optional[Array],
        intrinsics: Array,  # [4] at 1/8 resolution
        fmap: Array,  # [rig, h, w, 128]
        net: Array,
        inp: Array,
    ) -> int:
        """Write a new keyframe at the current counter (depth_video.py:109-112)."""
        ix = self.counter
        h, w = self.config.feat_size
        self.tstamp = _set_slot(self.tstamp, ix, jnp.float32(tstamp))
        img = image[0] if image.ndim == 4 else image
        self.images = _set_slot(self.images, ix, img.astype(jnp.uint8))
        if pose is not None:
            self.poses = _set_slot(self.poses, ix, pose)
        if disp is not None:
            self.disps = _set_slot(
                self.disps, ix, jnp.full((h, w), disp, jnp.float32)
            )
        if depth is not None:
            self.disps_sens = _set_slot(
                self.disps_sens, ix, _depth_to_disp_sens(depth, h, w)
            )
        self.intrinsics = _set_slot(self.intrinsics, ix, intrinsics)
        self.fmaps = _set_slot(self.fmaps, ix, fmap)
        self.nets = _set_slot(self.nets, ix, net)
        self.inps = _set_slot(self.inps, ix, inp)
        self.counter = ix + 1
        self.dirty[ix] = True
        return ix

    def set_pose(self, ix: int, pose: Array):
        self.poses = _set_slot(self.poses, ix, pose)

    def set_disp(self, ix: int, disp: Array):
        self.disps = _set_slot(self.disps, ix, disp)

    # -------------------------------------------------------------- geometry

    def reproject(self, ii, jj) -> Tuple[Array, Array]:
        """Map pixels of keyframes ii into keyframes jj (depth_video.py:142-150)."""
        return _reproject(
            self.poses, self.disps, self.intrinsics,
            jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
        )

    def distance(self, ii, jj, beta: float = 0.3, bidirectional: bool = True) -> np.ndarray:
        """Flow-magnitude distance between keyframe pairs (depth_video.py:152-188).

        Pair lists are padded to the next power of two so the growing
        proximity queries reuse a handful of compiled programs instead of
        recompiling every keyframe."""
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        n = len(ii)
        # cap the per-program pair count: the kernel materialises
        # [pairs, ht, wd, 4] reprojection intermediates, and the backend's
        # all-pairs proximity query grows as t² — at t≈300 keyframes
        # (48×64 grid) one unchunked program wanted 19.5 GB of HBM, and a
        # 16k chunk still OOM'd next to ~7 GB of resident session state
        # (measured, r5 long-loop). Chunks reuse ONE compiled program.
        CHUNK = 4096
        if n > CHUNK:
            return np.concatenate([
                self.distance(ii[s:s + CHUNK], jj[s:s + CHUNK], beta=beta,
                              bidirectional=bidirectional)
                for s in range(0, n, CHUNK)
            ])
        pad = max(int(2 ** np.ceil(np.log2(max(n, 16)))), 16)
        ii_p = jnp.asarray(np.pad(ii, (0, pad - n)))
        jj_p = jnp.asarray(np.pad(jj, (0, pad - n)))
        b = jnp.float32(beta)
        d1 = _frame_distance(self.poses, self.disps, self.intrinsics[0], ii_p, jj_p, b)
        if bidirectional:
            d2 = _frame_distance(self.poses, self.disps, self.intrinsics[0], jj_p, ii_p, b)
            d1 = 0.5 * (d1 + d2)
        return np.asarray(d1)[:n]

    def distance_matrix(self, t: int, beta: float = 0.3) -> np.ndarray:
        ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
        d = self.distance(ii.reshape(-1), jj.reshape(-1), beta=beta, bidirectional=True)
        return d.reshape(t, t)

    def normalize(self):
        self.poses, self.disps = _normalize(
            self.poses, self.disps, jnp.int32(self.counter)
        )
        self.dirty[: self.counter] = True
