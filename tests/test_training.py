"""Trainer convergence on a tiny rendered synthetic scene.

The round-1 suite only proved one train step runs and is finite; this proves
the training loop LEARNS (/root/reference/train.py:102-136 intent): on a
photometrically consistent scene (textured plane rendered through known
poses/depths) a few dozen overfitting steps must cut the total loss ≥2× and
reduce the pose error, while exercising random restarts and randomized-graph
padding under jit — the two mechanisms apps/train.py uses per batch.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import chex
import jax
import jax.numpy as jnp
import optax

from droid_slam_tpu.models.droid_net import init_params
from droid_slam_tpu.train.trainer import TrainConfig, init_state, make_train_step

rng = np.random.default_rng(33)


def render_scene(F=4, H=48, W=64, seed=3):
    """Render F views of a textured plane z = Z0 in the world frame.

    Returns (images [F,H,W,3] u8, poses_w2c [F,7], depths [F,H,W] f32,
    intrinsics [4]). Cameras translate sideways with tiny rotations, so the
    views have genuine parallax and the photometric correspondences are
    exactly consistent with the GT geometry.
    """
    r = np.random.default_rng(seed)
    fx = fy = 40.0
    cx, cy = W / 2, H / 2
    Z0 = 2.0

    # smooth random Fourier texture per channel
    coeffs = [
        (r.uniform(0.5, 2.5, 8), r.uniform(0.5, 2.5, 8), r.uniform(0, 2 * np.pi, 8))
        for _ in range(3)
    ]

    def texture(x, y):
        chans = []
        for a, b, p in coeffs:
            v = sum(np.sin(a[k] * x + b[k] * y + p[k]) for k in range(8))
            chans.append(v)
        t = np.stack(chans, axis=-1)  # [..., 3]
        t = (t - t.min()) / (np.ptp(t) + 1e-9)
        return (255 * t).astype(np.uint8)

    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    d_cam = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)

    images, poses, depths = [], [], []
    for k in range(F):
        o = np.array([0.08 * k, 0.02 * ((-1) ** k), 0.0])  # camera center
        R_c2w = Rotation.from_rotvec(0.01 * r.standard_normal(3)).as_matrix()
        d_world = d_cam @ R_c2w.T
        t_hit = (Z0 - o[2]) / d_world[..., 2]
        p_world = o + t_hit[..., None] * d_world
        images.append(texture(p_world[..., 0], p_world[..., 1]))
        depths.append(t_hit.astype(np.float32))  # camera-frame depth = t_hit

        R_w2c = R_c2w.T
        t_w2c = -R_w2c @ o
        q = Rotation.from_matrix(R_w2c).as_quat()  # xyzw
        poses.append(np.concatenate([t_w2c, q]).astype(np.float32))

    return (
        np.stack(images),
        np.stack(poses),
        np.stack(depths),
        np.array([fx, fy, cx, cy], np.float32),
    )


@pytest.mark.slow
def test_trainer_learns_synthetic_scene():
    F, H, W = 4, 48, 64
    images, poses_w2c, depths, intr = render_scene(F, H, W)
    h, w = H // 8, W // 8

    cfg = TrainConfig(
        lr=1e-3, steps=60, n_frames=F, num_iters=4, fixedp=2,
        restart_prob=0.2, pct_start=0.2,
    )

    # static edge pad exercises randomized-graph padding: a full |i−j|≤2
    # graph and a sparser subgraph alternate per step under one compile
    full_ii, full_jj = [], []
    for a in range(F):
        for b in range(F):
            if a != b and abs(a - b) <= 2:
                full_ii.append(a)
                full_jj.append(b)
    n_edges = len(full_ii) + 4

    def padded(gi, gj):
        ii = np.zeros(n_edges, np.int32)
        jj = np.zeros(n_edges, np.int32)
        ok = np.zeros(n_edges, bool)
        ii[: len(gi)] = gi
        jj[: len(gj)] = gj
        ok[: len(gi)] = True
        return jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(ok)

    graphs = [
        padded(full_ii, full_jj),
        padded(full_ii[::2], full_jj[::2]),  # sparse variant, padding live
    ]

    B = 2
    Ps = np.tile(poses_w2c, (B, 1, 1))
    Gs0 = Ps.copy()
    Gs0[:, 1:] = Ps[:, 1:2]  # trainer init convention (train.py:95-101)

    batch = {
        "images": jnp.asarray(np.tile(images, (B, 1, 1, 1, 1))),
        "poses": jnp.asarray(Ps),
        "disps": jnp.asarray(np.tile(1.0 / depths, (B, 1, 1, 1))),
        "intrinsics": jnp.asarray(np.tile(intr, (B, F, 1))),
        "poses_init": jnp.asarray(Gs0),
        "disps_init": jnp.ones((B, F, h, w), jnp.float32),
    }

    params = init_params(jax.random.PRNGKey(0), image_size=(H, W))
    state = init_state(params, cfg)
    step = make_train_step(cfg, np.asarray(full_ii), np.asarray(full_jj))

    # canonical steps (full graph, standard init) measure learning; sparse-
    # graph and restart-initialised steps exercise the mechanisms but start
    # from different problems, so their losses are not comparable
    canon_losses, canon_rots = [], []
    restart_exercised = False
    cur = dict(batch)
    canonical = True
    for k in range(60):
        sparse = k % 4 == 1
        gi, gj, gok = graphs[1 if sparse else 0]
        cur["ii"], cur["jj"], cur["edge_valid"] = gi, gj, gok
        state, metrics, out = step(state, cur)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), (k, loss)
        if canonical and not sparse:
            canon_losses.append(loss)
            canon_rots.append(float(metrics["rot_error"]))
        if k % 5 == 4:
            # random-restart mechanism: re-init from the last estimate
            cur["poses_init"] = out.poses[-1]
            cur["disps_init"] = out.disps_up[-1][:, :, 3::8, 3::8]
            restart_exercised = True
            canonical = False
        else:
            cur["poses_init"] = batch["poses_init"]
            cur["disps_init"] = batch["disps_init"]
            canonical = True

    assert restart_exercised
    assert len(canon_losses) >= 10
    start = float(np.mean(canon_losses[:3]))
    end = float(np.mean(canon_losses[-3:]))
    assert end < 0.5 * start, (start, end, canon_losses)
    assert np.mean(canon_rots[-3:]) < np.mean(canon_rots[:3]), canon_rots



def test_train_state_resume_roundtrip(tmp_path):
    """Full train-state checkpointing (params + optimizer + step), a
    capability the reference lacks (it restores params only, train.py:57-58).
    The constant-lr fine-tune schedule must restore a state saved under
    onecycle — make_optimizer keeps the opt_state tree identical."""
    from droid_slam_tpu.train import checkpoints
    from droid_slam_tpu.train.trainer import make_optimizer

    params = {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}}
    cfg = TrainConfig(steps=10, schedule="onecycle")
    state = init_state(params, cfg)
    # advance the optimizer once so the saved state is non-trivial
    tx = make_optimizer(cfg)
    grads = jax.tree.map(jnp.ones_like, params["params"])
    upd, opt_state = tx.update(grads, state["opt_state"], params["params"])
    state = {
        "params": {"params": optax.apply_updates(params["params"], upd)},
        "opt_state": opt_state,
        "step": jnp.int32(3),
    }

    path = str(tmp_path / "state")
    checkpoints.save_train_state(path, jax.device_get(state))

    for schedule in ("onecycle", "constant"):
        tgt = init_state(params, TrainConfig(steps=10, schedule=schedule))
        restored = checkpoints.restore_train_state(path, tgt)
        assert int(restored["step"]) == 3
        chex.assert_trees_all_close(
            restored["params"], state["params"], atol=0, rtol=0
        )
        chex.assert_trees_all_close(
            jax.device_get(restored["opt_state"]),
            jax.device_get(state["opt_state"]),
            atol=0, rtol=0,
        )


def test_build_frame_graph_v2_nms():
    """v2-NMS builder (reference graph_utils.py:72-112): neighborhood edges
    always present; accepted long-range edges suppress their 3x3 ball."""
    from droid_slam_tpu.train.graph_utils import (
        build_frame_graph_v2,
        graph_to_edge_list,
    )
    from droid_slam_tpu.ops import lie

    F, H, W = 6, 32, 32
    r2 = np.random.default_rng(4)
    # forward-moving camera over a textured plane -> genuine covisibility
    poses_w2c = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))
    poses_w2c[:, 2] = 0.05 * np.arange(F)
    poses_c2w = np.asarray(lie.inv(jnp.asarray(poses_w2c)))
    disps = (0.4 + 0.05 * r2.random((F, H, W))).astype(np.float32)
    intr = np.tile(np.array([32.0, 32.0, 16.0, 16.0], np.float32), (F, 1))

    graph = build_frame_graph_v2(poses_c2w, disps, intr, thresh=100.0, r=1)
    ii, jj, _ = graph_to_edge_list(graph)
    edges = set(zip(ii.tolist(), jj.tolist()))
    # radius-1 neighborhood must be present
    for i in range(F - 1):
        assert (i, i + 1) in edges
        assert (i + 1, i) in edges
    # NMS: no two accepted long-range edges within Chebyshev distance 1
    long_range = [(i, j) for (i, j) in edges if abs(i - j) > 1]
    for a in long_range:
        for b in long_range:
            if a != b:
                assert max(abs(a[0] - b[0]), abs(a[1] - b[1])) > 1, (a, b)

def test_build_frame_graph_matches_greedy_oracle():
    """The v1 builder's one-shot argsort selection must equal the reference's
    greedy repeated-argmin loop (graph_utils.py:37-68) on a random distance
    matrix — both graph keys and per-source adjacency order."""
    from collections import OrderedDict
    from unittest import mock

    from droid_slam_tpu.train import graph_utils

    rng = np.random.default_rng(11)
    N, num, thresh, r = 9, 22, 60.0, 2
    dmat = (rng.random((N, N)) * 100).astype(np.float32)

    def oracle(d):
        d = d.copy()
        count = 0
        graph = OrderedDict()
        for i in range(N):
            graph[i] = []
            d[i, i] = np.inf
            for j in range(i - r, i + r + 1):
                if 0 <= j < N and i != j:
                    graph[i].append(j)
                    d[i, j] = np.inf
                    count += 1
        while count < num:
            ix = int(np.argmin(d))
            i, j = ix // N, ix % N
            if d[i, j] >= thresh:
                break
            graph[i].append(j)
            d[i, j] = np.inf
            count += 1
        return graph

    with mock.patch.object(
        graph_utils, "compute_distance_matrix_flow",
        lambda *a, **k: dmat.copy(),
    ):
        got = graph_utils.build_frame_graph(
            np.zeros((N, 7)), np.ones((N, 24, 24)), np.ones((N, 4)),
            num=num, thresh=thresh, r=r,
        )
    want = oracle(dmat)
    assert {k: sorted(v) for k, v in got.items()} == \
        {k: sorted(v) for k, v in want.items()}
    # pick ORDER within a source matters for edge list layout parity too
    assert got == want


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q", "-m", "slow"])
