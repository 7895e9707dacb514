"""Motion filter: keyframe selection by predicted flow magnitude.

TPU-native equivalent of /root/reference/droid_slam/motion_filter.py. Runs on
*every* input frame: the matching encoder always runs; one ConvGRU update
against the last keyframe with zero-flow initialisation estimates the flow
magnitude; if the mean exceeds the threshold the frame becomes a keyframe (the
context encoder runs only then, motion_filter.py:74-93).

The probe (fnet + corr + one GRU step) is one jitted program; only a scalar
(the flow magnitude) crosses back to the host for the keyframe decision.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.droid_net import DroidNet, normalize_images
from ..models.update import UpdateModule
from ..ops import corr as corr_ops
from ..ops import lie
from ..ops import projective as pops

Array = jax.Array


@jax.jit
def _encode_frame(params, image: Array):
    """fnet over the frame (every rig camera). image: [rig, H, W, 3]."""
    model = DroidNet()

    def fnet(x):
        return model.apply(
            params, normalize_images(x), method=lambda m, y: m.fnet(y)
        )

    fmaps = fnet(image.astype(jnp.float32))
    return fmaps  # [rig, h, w, 128]


@jax.jit
def _encode_context(params, image: Array):
    """cnet → (net tanh, inp relu). image: [H, W, 3]."""
    model = DroidNet()

    def cnet(x):
        return model.apply(
            params, normalize_images(x)[None], method=lambda m, y: m.cnet(y)
        )[0]

    ctx = cnet(image.astype(jnp.float32))
    net, inp = jnp.split(ctx, 2, axis=-1)
    return jnp.tanh(net), jax.nn.relu(inp)


@jax.jit
def _motion_probe(params, fmap_prev: Array, net_prev: Array, inp_prev: Array, fmap_new: Array):
    """One zero-flow GRU iteration against the last keyframe; returns the
    mean predicted flow magnitude (motion_filter.py:74-83)."""
    h, w = fmap_prev.shape[0:2]
    coords0 = pops.coords_grid(h, w)[None]
    corr = corr_ops.CorrPyramid.build(fmap_prev[None], fmap_new[None])(coords0)
    update_op = UpdateModule()
    _, delta, _ = update_op.apply(
        {"params": params["params"]["update"]},
        net_prev[None],
        inp_prev[None],
        corr,
        jnp.zeros((1, h, w, 4), jnp.float32),
    )
    return jnp.mean(jnp.linalg.norm(delta, axis=-1))


class MotionFilter:
    def __init__(self, params, video, thresh: float = 2.4):
        self.params = params
        self.video = video
        self.thresh = thresh
        self.count = 0
        # features of the last keyframe (device)
        self._net = None
        self._inp = None
        self._fmap = None

    def track(
        self,
        tstamp: float,
        image: Array,  # [H, W, 3] uint8 RGB or [2, H, W, 3] stereo
        depth: Optional[Array] = None,
        intrinsics: Optional[Array] = None,
    ):
        if image.ndim == 3:
            image = image[None]
        fmap = _encode_frame(self.params, image)

        if self.video.counter == 0:
            net, inp = _encode_context(self.params, image[0])
            self._net, self._inp, self._fmap = net, inp, fmap
            self.video.append(
                tstamp, image, lie.identity(()), 1.0, depth,
                intrinsics / 8.0, fmap, net, inp,
            )
            return

        delta = float(
            _motion_probe(self.params, self._fmap[0], self._net, self._inp, fmap[0])
        )
        if delta > self.thresh:
            self.count = 0
            net, inp = _encode_context(self.params, image[0])
            self._net, self._inp, self._fmap = net, inp, fmap
            self.video.append(
                tstamp, image, None, None, depth, intrinsics / 8.0, fmap, net, inp
            )
        else:
            self.count += 1
