"""Tests for the dense bundle-adjustment layer.

Oracle strategy (mirrors the reference's CPU-as-oracle pattern,
/root/reference/tests/test_droid_backends.py, but with NumPy float64 math as
the ground truth):
  * edge blocks are checked against a NumPy contraction of the (separately
    validated) analytic Jacobians;
  * the block-sparse Schur path of `ba_iteration` is checked against a dense
    float64 Schur solve built from the same edge blocks;
  * end-to-end convergence: perturbed poses/depths recover a synthetic scene.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from droid_slam_tpu.ops import ba, lie, projective as pops

rng = np.random.default_rng(5432)


def make_scene(F=5, ht=6, wd=8, seed=3):
    r = np.random.default_rng(seed)
    rot = Rotation.from_rotvec(0.05 * r.standard_normal((F, 3)))
    q = rot.as_quat().astype(np.float32)
    t = 0.1 * r.standard_normal((F, 3)).astype(np.float32)
    poses = np.concatenate([t, q], axis=-1)
    disps = (0.5 + r.random((F, ht, wd))).astype(np.float32)
    intr = np.array([8.0, 8.0, wd / 2 - 0.5, ht / 2 - 0.5], np.float32)
    return poses, disps, intr


def edges_all_pairs(F, radius=2):
    ii, jj = [], []
    for i in range(F):
        for j in range(F):
            if i != j and abs(i - j) <= radius:
                ii.append(i)
                jj.append(j)
    return np.array(ii, np.int32), np.array(jj, np.int32)


def test_edge_blocks_against_numpy():
    poses, disps, intr = make_scene()
    F, ht, wd = disps.shape
    hw = ht * wd
    ii = np.array([0, 1, 2, 2], np.int32)
    jj = np.array([1, 0, 3, 2], np.int32)  # includes a stereo self-edge
    target = (np.asarray(pops.coords_grid(ht, wd))[None] + 0.1).astype(np.float32)
    target = np.broadcast_to(target, (4, ht, wd, 2)).copy()
    weight = (0.5 + 0.5 * rng.random((4, ht, wd, 2))).astype(np.float32)

    intr_all = np.broadcast_to(intr, (F, 4))
    blocks = ba.build_edge_blocks(
        jnp.asarray(target), jnp.asarray(weight), jnp.asarray(poses),
        jnp.asarray(disps), jnp.asarray(intr_all),
        jnp.asarray(ii), jnp.asarray(jj),
    )

    coords, valid, jac = pops.projective_transform(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr_all),
        jnp.asarray(ii), jnp.asarray(jj), jacobian=True,
        min_depth=pops.MIN_DEPTH_NATIVE,
    )
    Ji = np.asarray(jac.Ji, np.float64).reshape(4, hw, 2, 6)
    Jj = np.asarray(jac.Jj, np.float64).reshape(4, hw, 2, 6)
    Jz = np.asarray(jac.Jz, np.float64).reshape(4, hw, 2)
    r = (target - np.asarray(coords)).reshape(4, hw, 2)
    w = 0.001 * np.asarray(valid).reshape(4, hw, 1) * weight.reshape(4, hw, 2)

    for n in range(4):
        wp = w[n] * (0.0 if ii[n] == jj[n] else 1.0)
        Hii = np.einsum("kc,kca,kcb->ab", wp, Ji[n], Ji[n])
        vi = np.einsum("kc,kca,kc->a", wp, Ji[n], r[n])
        Ei = np.einsum("kc,kca,kc->ak", wp, Ji[n], Jz[n])
        Ck = np.einsum("kc,kc->k", w[n], Jz[n] ** 2)
        wk = np.einsum("kc,kc->k", w[n], r[n] * Jz[n])
        def close(got, want, tol=5e-3):
            got = np.asarray(got, np.float64)
            return (np.abs(got - want) / (1.0 + np.abs(want))).max() < tol

        assert close(blocks.Hii[n], Hii)
        assert close(blocks.vi[n], vi)
        assert close(blocks.Ei[n], Ei)
        assert close(blocks.Ck[n], Ck)
        assert close(blocks.wk[n], wk)
    # self-edge: pose blocks zero, depth blocks non-zero
    assert np.abs(np.asarray(blocks.Hii[3])).max() == 0.0
    assert np.abs(np.asarray(blocks.Ck[3])).max() > 0.0


def dense_oracle_iteration(poses, disps, intr, disps_sens, target, weight, eta,
                           ii, jj, t0, t1, lm=1e-4, ep=0.1, alpha=0.05):
    """Float64 dense-Schur reference for one GN iteration of the SLAM BA,
    built from the same (validated) edge blocks."""
    F, ht, wd = disps.shape
    hw = ht * wd
    intr_all = np.broadcast_to(intr, (F, 4))
    blocks = jax.tree.map(
        lambda x: np.asarray(x, np.float64),
        ba.build_edge_blocks(
            jnp.asarray(target), jnp.asarray(weight), jnp.asarray(poses),
            jnp.asarray(disps), jnp.asarray(intr_all),
            jnp.asarray(ii), jnp.asarray(jj),
        ),
    )
    P = t1 - t0
    H = np.zeros((P, P, 6, 6))
    v = np.zeros((P, 6))
    for n in range(len(ii)):
        i, j = ii[n] - t0, jj[n] - t0
        if 0 <= i < P:
            H[i, i] += blocks.Hii[n]
            v[i] += blocks.vi[n]
        if 0 <= i < P and 0 <= j < P:
            H[i, j] += blocks.Hij[n]
            H[j, i] += blocks.Hji[n]
        if 0 <= j < P:
            H[j, j] += blocks.Hjj[n]
            v[j] += blocks.vj[n]

    # depth system over touched frames ∪ window
    kx = sorted(set(range(t0, t1)) | set(int(x) for x in ii))
    kidx = {k: n for n, k in enumerate(kx)}
    M = len(kx)
    C = np.zeros((M, hw))
    w = np.zeros((M, hw))
    E = np.zeros((P, M, 6, hw))
    for n in range(len(ii)):
        k = kidx[int(ii[n])]
        C[k] += blocks.Ck[n]
        w[k] += blocks.wk[n]
        if 0 <= ii[n] - t0 < P:
            E[ii[n] - t0, k] += blocks.Ei[n]
        if 0 <= jj[n] - t0 < P:
            E[jj[n] - t0, k] += blocks.Ej[n]
    for k in kx:
        m = (np.asarray(disps_sens[k]).reshape(hw) > 0).astype(np.float64)
        C[kidx[k]] += m * alpha + (1 - m) * np.asarray(eta[k], np.float64).reshape(hw)
        w[kidx[k]] -= m * alpha * (disps[k] - disps_sens[k]).reshape(hw)
    Q = 1.0 / C

    Hm = H.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    Em = E.transpose(0, 2, 1, 3).reshape(P * 6, M * hw)
    S = Hm - Em @ (Q.reshape(-1, 1) * Em.T)
    rhs = v.reshape(-1, 1) - Em @ (Q.reshape(-1, 1) * w.reshape(-1, 1))
    S = S + (ep + lm * S) * np.eye(P * 6)
    dx = np.linalg.solve(S, rhs)
    dz = Q.reshape(-1, 1) * (w.reshape(-1, 1) - Em.T @ dx)

    dposes = np.zeros((F, 6))
    dposes[t0:t1] = dx.reshape(P, 6)
    new_poses = np.asarray(lie.retr(jnp.asarray(poses), jnp.asarray(dposes, np.float32)))
    new_disps = disps.copy()
    for k in kx:
        new_disps[k] += dz.reshape(M, ht, wd)[kidx[k]].astype(np.float32)
    return new_poses, new_disps


@pytest.mark.parametrize("with_sens", [False, True])
def test_ba_iteration_matches_dense_oracle(with_sens):
    poses, disps, intr = make_scene(F=6)
    F, ht, wd = disps.shape
    ii, jj = edges_all_pairs(F)
    N = len(ii)
    t0, t1 = 2, 6

    # targets: true reprojection of a perturbed scene + noise → non-trivial system
    target = np.asarray(
        pops.projective_transform(
            jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(np.broadcast_to(intr, (F, 4))),
            jnp.asarray(ii), jnp.asarray(jj))[0]
    ) + 0.1 * rng.standard_normal((N, ht, wd, 2)).astype(np.float32)
    weight = (0.3 + 0.7 * rng.random((N, ht, wd, 2))).astype(np.float32)
    eta = 0.01 * (1 + rng.random((F, ht, wd))).astype(np.float32)
    disps_sens = np.zeros_like(disps)
    if with_sens:
        disps_sens[3] = 0.8

    pairs = ba.SchurPairs.build(ii, jj, np.ones(N, bool), t0, t1, window=t1 - t0)
    prob = ba.BAProblem(
        target=jnp.asarray(target), weight=jnp.asarray(weight), eta=jnp.asarray(eta),
        ii=jnp.asarray(ii), jj=jnp.asarray(jj), edge_valid=jnp.ones(N, bool),
        t0=jnp.asarray(t0, jnp.int32), t1=jnp.asarray(t1, jnp.int32), pairs=pairs,
    )
    got_poses, got_disps = ba.ba_solve(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
        jnp.asarray(disps_sens), prob, window=t1 - t0, iterations=1,
    )
    want_poses, want_disps = dense_oracle_iteration(
        poses, disps, intr, disps_sens, target, weight, eta, ii, jj, t0, t1
    )
    want_disps = np.clip(want_disps, 0.001, None)
    assert np.abs(np.asarray(got_poses) - want_poses).max() < 1e-3
    assert np.abs(np.asarray(got_disps) - want_disps).max() < 1e-3


def test_ba_padded_window_and_edges_match_exact():
    """Padding the window and edge lists must not change the solution."""
    poses, disps, intr = make_scene(F=6)
    F, ht, wd = disps.shape
    ii, jj = edges_all_pairs(F)
    N = len(ii)
    t0, t1 = 1, 6
    target = np.asarray(
        pops.projective_transform(
            jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(np.broadcast_to(intr, (F, 4))),
            jnp.asarray(ii), jnp.asarray(jj))[0]
    ) + 0.05 * rng.standard_normal((N, ht, wd, 2)).astype(np.float32)
    weight = (0.3 + 0.7 * rng.random((N, ht, wd, 2))).astype(np.float32)
    eta = np.full((F, ht, wd), 0.02, np.float32)
    sens = np.zeros_like(disps)

    def run(pad_edges, window):
        Np = N + pad_edges
        iip = np.concatenate([ii, np.zeros(pad_edges, np.int32)])
        jjp = np.concatenate([jj, np.zeros(pad_edges, np.int32)])
        ev = np.concatenate([np.ones(N, bool), np.zeros(pad_edges, bool)])
        tp = np.concatenate([target, np.zeros((pad_edges, ht, wd, 2), np.float32)])
        wp = np.concatenate([weight, np.zeros((pad_edges, ht, wd, 2), np.float32)])
        pairs = ba.SchurPairs.build(iip, jjp, ev, t0, t1, window=window, pad_to=4096)
        prob = ba.BAProblem(
            target=jnp.asarray(tp), weight=jnp.asarray(wp), eta=jnp.asarray(eta),
            ii=jnp.asarray(iip), jj=jnp.asarray(jjp), edge_valid=jnp.asarray(ev),
            t0=jnp.asarray(t0, jnp.int32), t1=jnp.asarray(t1, jnp.int32), pairs=pairs,
        )
        return ba.ba_solve(
            jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
            jnp.asarray(sens), prob, window=window, iterations=2,
        )

    p0, d0 = run(0, t1 - t0)
    p1, d1 = run(7, t1 - t0 + 3)
    assert np.abs(np.asarray(p0) - np.asarray(p1)).max() < 1e-5
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() < 1e-5


def test_ba_bf16_schur_tracks_f32():
    """schur_dtype=bfloat16 (the backend's throughput mode) must stay a
    small perturbation of the exact f32 solve — same contract the dense
    window path documents (~0.4% on the Schur complement, absorbed by the
    damped GN)."""
    poses, disps, intr = make_scene(F=6)
    F, ht, wd = disps.shape
    ii, jj = edges_all_pairs(F)
    N = len(ii)
    t0, t1 = 1, 6
    target = np.asarray(
        pops.projective_transform(
            jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(np.broadcast_to(intr, (F, 4))),
            jnp.asarray(ii), jnp.asarray(jj))[0]
    ) + 0.05 * rng.standard_normal((N, ht, wd, 2)).astype(np.float32)
    weight = (0.3 + 0.7 * rng.random((N, ht, wd, 2))).astype(np.float32)
    eta = np.full((F, ht, wd), 0.02, np.float32)
    sens = np.zeros_like(disps)

    pairs = ba.SchurPairs.build(ii, jj, np.ones(N, bool), t0, t1, window=t1 - t0)
    prob = ba.BAProblem(
        target=jnp.asarray(target), weight=jnp.asarray(weight), eta=jnp.asarray(eta),
        ii=jnp.asarray(ii), jj=jnp.asarray(jj), edge_valid=jnp.ones(N, bool),
        t0=jnp.asarray(t0, jnp.int32), t1=jnp.asarray(t1, jnp.int32), pairs=pairs,
    )

    def run(sd):
        return ba.ba_solve(
            jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
            jnp.asarray(sens), prob, window=t1 - t0, iterations=2,
            schur_dtype=sd,
        )

    p32, d32 = run("float32")
    p16, d16 = run("bfloat16")
    # pose updates are O(1e-2); bf16 Schur perturbs them at the % level
    assert np.abs(np.asarray(p32) - np.asarray(p16)).max() < 5e-3
    assert np.abs(np.asarray(d32) - np.asarray(d16)).max() < 2e-2
    # and the bf16 run must still be a real update (not zeros)
    assert np.abs(np.asarray(p16) - poses).max() > 1e-4


def test_ba_convergence_recovers_scene():
    """Start from perturbed poses; BA on true-reprojection targets must
    drive the induced flow residual down by >10x."""
    poses, disps, intr = make_scene(F=6, seed=11)
    F, ht, wd = disps.shape
    ii, jj = edges_all_pairs(F, radius=3)
    N = len(ii)
    intr_all = np.broadcast_to(intr, (F, 4))

    target = np.asarray(pops.projective_transform(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr_all),
        jnp.asarray(ii), jnp.asarray(jj))[0])
    weight = np.ones((N, ht, wd, 2), np.float32)
    eta = np.full((F, ht, wd), 1e-4, np.float32)

    pert = poses.copy()
    r = np.random.default_rng(0)
    twists = np.zeros((F, 6), np.float32)
    twists[1:] = 0.02 * r.standard_normal((F - 1, 6))
    pert = np.asarray(lie.retr(jnp.asarray(poses), jnp.asarray(twists)))
    disps0 = disps * (1 + 0.1 * r.standard_normal(disps.shape)).astype(np.float32)

    def residual(p, d):
        c = np.asarray(pops.projective_transform(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(intr_all),
            jnp.asarray(ii), jnp.asarray(jj))[0])
        return np.abs(c - target).mean()

    t0, t1 = 1, F
    pairs = ba.SchurPairs.build(ii, jj, np.ones(N, bool), t0, t1, window=t1 - t0)
    prob = ba.BAProblem(
        target=jnp.asarray(target), weight=jnp.asarray(weight), eta=jnp.asarray(eta),
        ii=jnp.asarray(ii), jj=jnp.asarray(jj), edge_valid=jnp.ones(N, bool),
        t0=jnp.asarray(t0, jnp.int32), t1=jnp.asarray(t1, jnp.int32), pairs=pairs,
    )
    r0 = residual(pert, disps0)
    p, d = jnp.asarray(pert), jnp.asarray(disps0)
    p, d = ba.ba_solve(p, d, jnp.asarray(intr), jnp.asarray(np.zeros_like(disps)),
                       prob, window=t1 - t0, iterations=8)
    r1 = residual(np.asarray(p), np.asarray(d))
    assert r1 < 0.1 * r0, (r0, r1)


def test_motion_only_ba_converges():
    poses, disps, intr = make_scene(F=5, seed=21)
    F, ht, wd = disps.shape
    ii, jj = edges_all_pairs(F, radius=4)
    N = len(ii)
    intr_all = np.broadcast_to(intr, (F, 4))
    target = np.asarray(pops.projective_transform(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr_all),
        jnp.asarray(ii), jnp.asarray(jj))[0])
    weight = np.ones((N, ht, wd, 2), np.float32)
    eta = np.full((F, ht, wd), 1e-4, np.float32)

    twists = np.zeros((F, 6), np.float32)
    twists[1:] = 0.02 * np.random.default_rng(1).standard_normal((F - 1, 6))
    pert = np.asarray(lie.retr(jnp.asarray(poses), jnp.asarray(twists)))

    t0, t1 = 1, F
    pairs = ba.SchurPairs.build(ii, jj, np.ones(N, bool), t0, t1, window=t1 - t0)
    prob = ba.BAProblem(
        target=jnp.asarray(target), weight=jnp.asarray(weight), eta=jnp.asarray(eta),
        ii=jnp.asarray(ii), jj=jnp.asarray(jj), edge_valid=jnp.ones(N, bool),
        t0=jnp.asarray(t0, jnp.int32), t1=jnp.asarray(t1, jnp.int32), pairs=pairs,
    )
    p, d = ba.ba_solve(
        jnp.asarray(pert), jnp.asarray(disps), jnp.asarray(intr),
        jnp.asarray(np.zeros_like(disps)), prob, window=t1 - t0,
        iterations=8, motion_only=True,
    )
    assert np.abs(np.asarray(d) - disps).max() == 0.0  # depths untouched
    # relative pose error must shrink
    err0 = np.abs(pert[1:] - poses[1:]).max()
    err1 = np.abs(np.asarray(p)[1:] - poses[1:]).max()
    assert err1 < 0.2 * err0


def test_training_ba_differentiable():
    poses, disps, intr = make_scene(F=5, seed=31)
    F, ht, wd = disps.shape
    ii, jj = edges_all_pairs(F)
    N = len(ii)
    intr_all = np.broadcast_to(intr, (F, 4)).copy()
    # offset targets: with zero residuals the update (and thus the gradient
    # w.r.t. the weights) is identically zero
    target = jnp.asarray(np.asarray(pops.projective_transform(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr_all),
        jnp.asarray(ii), jnp.asarray(jj))[0])
        + 0.3 * rng.standard_normal((N, ht, wd, 2)).astype(np.float32))
    eta = jnp.full((F, ht, wd), 0.01)

    def loss_fn(weight):
        p, d = ba.bundle_adjust(
            target, weight, eta, jnp.asarray(poses), jnp.asarray(disps),
            jnp.asarray(intr_all), jnp.asarray(ii), jnp.asarray(jj), fixedp=1,
        )
        return jnp.sum(p[1:, :3] ** 2) + jnp.sum(d**2)

    w0 = jnp.ones((N, ht, wd, 2))
    g = jax.grad(loss_fn)(w0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])
