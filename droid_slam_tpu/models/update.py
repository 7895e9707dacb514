"""RAFT-SLAM update operator: ConvGRU + flow/confidence heads + graph
aggregation (Flax, NHWC).

TPU-native re-design of /root/reference/droid_slam/droid_net.py:45-144 and
modules/gru.py. Channel orderings (GRU input concat [ctx, corr, flow];
upsample-mask channel layout (k, i, j)) are kept identical to the reference so
that torch checkpoints convert weight-for-weight.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

GRAD_CLIP = 0.01


@jax.custom_vjp
def grad_clip(x: Array) -> Array:
    """Identity forward; backward zeroes gradient entries with |g| > 0.01 or
    NaN (reference modules/clipping.py:7-17) — the stabiliser that lets
    gradients flow through the unrolled BA iterations."""
    return x


def _grad_clip_fwd(x):
    return x, None


def _grad_clip_bwd(_, g):
    bad = (jnp.abs(g) > GRAD_CLIP) | jnp.isnan(g)
    return (jnp.where(bad, 0.0, g),)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


class ConvGRU(nn.Module):
    """3×3 gated conv update with a global-context path (modules/gru.py:24-29):
    a sigmoid-gated spatial mean of the hidden state feeds 1×1 convs added to
    every gate pre-activation."""

    h_planes: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, net: Array, inp: Array) -> Array:
        h, dt = self.h_planes, self.dtype
        glo = jax.nn.sigmoid(nn.Conv(h, (1, 1), dtype=dt, name="w")(net)) * net
        glo = jnp.mean(glo, axis=(1, 2), keepdims=True)

        net_inp = jnp.concatenate([net, inp], axis=-1)
        z = jax.nn.sigmoid(
            nn.Conv(h, (3, 3), dtype=dt, name="convz")(net_inp)
            + nn.Conv(h, (1, 1), dtype=dt, name="convz_glo")(glo)
        )
        r = jax.nn.sigmoid(
            nn.Conv(h, (3, 3), dtype=dt, name="convr")(net_inp)
            + nn.Conv(h, (1, 1), dtype=dt, name="convr_glo")(glo)
        )
        q = jnp.tanh(
            nn.Conv(h, (3, 3), dtype=dt, name="convq")(jnp.concatenate([r * net, inp], axis=-1))
            + nn.Conv(h, (1, 1), dtype=dt, name="convq_glo")(glo)
        )
        return (1.0 - z) * net + z * q


def cvx_upsample(data: Array, mask: Array) -> Array:
    """Convex 8× upsampling of 1/8-resolution fields (droid_net.py:22-36).

    data: [B, ht, wd, dim]; mask: [B, ht, wd, 9*8*8] with channel index
    k*64 + i*8 + j (k = 3×3 neighbor, (i, j) = sub-pixel). Output pixel
    (8y+i, 8x+j) is a softmax(9)-weighted combination of data's 3×3
    neighborhood at (y, x).
    """
    b, ht, wd, dim = data.shape
    mask = mask.reshape(b, ht, wd, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 9 shifted copies of data = the 3×3 neighborhoods (torch F.unfold order:
    # k = (dy+1)*3 + (dx+1), row-major over the kernel window)
    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbrs = jnp.stack(
        [pad[:, dy : dy + ht, dx : dx + wd, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # [B, ht, wd, 9, dim]

    up = jnp.einsum("bhwkij,bhwkd->bhwijd", mask, nbrs)  # [B, ht, wd, 8, 8, dim]
    up = up.transpose(0, 1, 3, 2, 4, 5)  # [B, ht, 8, wd, 8, dim]
    return up.reshape(b, 8 * ht, 8 * wd, dim)


def upsample_disp(disp: Array, mask: Array) -> Array:
    """disp: [B, ht, wd] → [B, 8ht, 8wd] (droid_net.py:38-42)."""
    return cvx_upsample(disp[..., None], mask)[..., 0]


class GraphAgg(nn.Module):
    """Per-source-keyframe aggregation of GRU hidden states (droid_net.py:45-76):
    scatter-mean the per-edge hidden states onto their source frame ii, then
    emit per-frame BA damping ``eta`` (softplus × 0.01) and the 8× convex
    upsampling mask.

    Static-shape variant: instead of compacting to unique(ii) (a dynamic
    shape), we scatter into all ``num_frames`` rows and gather back per edge —
    identical math, jit-stable shapes.
    """

    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        net: Array,
        ii: Array,
        num_frames: int,
        edge_valid: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        # net: [N, H, W, 128] per-edge hidden states; ii: [N] source frame ids
        # edge_valid: [N] bool — padded slots are routed to a dump segment
        n, ht, wd, ch = net.shape
        dt = self.dtype
        net = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="conv1")(net))

        if edge_valid is None:
            seg = ii
        else:
            seg = jnp.where(edge_valid, ii, num_frames)
        # scatter-mean as a one-hot matmul: XLA lowers segment_sum to a
        # sequential chain of dynamic-update-slices (~1.7 ms/frame at demo
        # scale); a [F, N] one-hot against [N, H·W·C] rides the MXU instead
        onehot = (
            seg[None, :] == jnp.arange(num_frames)[:, None]
        ).astype(net.dtype)
        counts = jnp.sum(onehot, axis=1)
        sums = jnp.matmul(
            onehot, net.reshape(n, -1), preferred_element_type=net.dtype
        )
        mean = sums / jnp.maximum(counts, 1.0)[:, None]
        net = mean.reshape(num_frames, ht, wd, ch)

        net = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="conv2")(net))

        eta = nn.Conv(1, (3, 3), dtype=dt, name="eta")(net).astype(jnp.float32)
        eta = 0.01 * jax.nn.softplus(grad_clip(eta))[..., 0]  # [F, H, W]
        upmask = nn.Conv(8 * 8 * 9, (1, 1), dtype=dt, name="upmask")(net)  # [F, H, W, 576]
        return eta, upmask


class UpdateModule(nn.Module):
    """One operator iteration (droid_net.py:79-144): encode correlation
    features and motion features, run the ConvGRU, and decode a flow revision
    ``delta`` plus confidence ``weight``; optionally aggregate per-frame
    damping/upmask over the factor graph.

    The reference's published checkpoints have 4-channel delta/weight heads
    truncated to 2 at load time (droid.py:54-57); here the heads are natively
    2-channel and the weight converter does the truncation.

    ``dtype`` sets the computation dtype of every conv (params stay float32);
    the numeric outputs the DBA consumes (delta, weight, eta) are cast back to
    float32 at the heads.
    """

    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        net: Array,   # [N, H, W, 128] hidden state per edge
        inp: Array,   # [N, H, W, 128] context features per edge
        corr: Array,  # [N, H, W, 196] correlation features
        flow: Array,  # [N, H, W, 4] motion features
        ii: Optional[Array] = None,
        num_frames: Optional[int] = None,
        edge_valid: Optional[Array] = None,
    ):
        dt = self.dtype
        corr = nn.relu(nn.Conv(128, (1, 1), dtype=dt, name="corr_enc1")(corr))
        corr = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="corr_enc2")(corr))

        flow = nn.relu(nn.Conv(128, (7, 7), dtype=dt, name="flow_enc1")(flow))
        flow = nn.relu(nn.Conv(64, (3, 3), dtype=dt, name="flow_enc2")(flow))

        # concat order [inp, corr, flow] matches the reference GRU input
        net = ConvGRU(dtype=dt, name="gru")(
            net, jnp.concatenate([inp.astype(net.dtype), corr, flow], axis=-1)
        )

        delta = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="delta1")(net))
        delta = grad_clip(nn.Conv(2, (3, 3), dtype=dt, name="delta2")(delta).astype(jnp.float32))

        weight = nn.relu(nn.Conv(128, (3, 3), dtype=dt, name="weight1")(net))
        weight = jax.nn.sigmoid(
            grad_clip(nn.Conv(2, (3, 3), dtype=dt, name="weight2")(weight).astype(jnp.float32))
        )

        if ii is None:
            return net, delta, weight

        eta, upmask = GraphAgg(dtype=dt, name="agg")(net, ii, num_frames, edge_valid)
        return net, delta, weight, eta, upmask
