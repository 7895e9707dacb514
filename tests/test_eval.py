"""Tests for the ATE scorer, visualization geometry ops, and losses."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from droid_slam_tpu.eval.ate import Trajectory, align_umeyama, associate, ate_rmse
from droid_slam_tpu.ops import lie, vis_ops
from droid_slam_tpu.train import losses as L

rng = np.random.default_rng(5432)


def test_umeyama_recovers_similarity():
    pts = rng.standard_normal((50, 3))
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s, t = 1.7, np.array([1.0, -2.0, 0.5])
    target = s * pts @ R.T + t
    s2, R2, t2 = align_umeyama(pts, target, correct_scale=True)
    assert abs(s2 - s) < 1e-6
    assert np.abs(R2 - R).max() < 1e-6
    assert np.abs(t2 - t).max() < 1e-6


def test_ate_zero_for_similarity_transformed_trajectory():
    T = 40
    ts = np.arange(T, dtype=np.float64)
    pos = np.cumsum(0.1 * rng.standard_normal((T, 3)), axis=0)
    q = np.tile([0, 0, 0, 1.0], (T, 1))
    gt = Trajectory(ts, pos, q)

    R = Rotation.from_rotvec([0.1, 0.2, -0.1]).as_matrix()
    est_pos = 2.0 * pos @ R.T + np.array([5, 6, 7.0])
    est = Trajectory(ts, est_pos, q)

    r = ate_rmse(gt, est, correct_scale=True)
    assert r["ate_rmse"] < 1e-9
    # without scale correction the error must be large
    r2 = ate_rmse(gt, est, correct_scale=False)
    assert r2["ate_rmse"] > 0.1


def test_ate_recovers_injected_noise_level():
    """Known-error oracle (VERDICT r1 #8): perturb a GT trajectory with iid
    Gaussian noise, map it through a random Sim(3)/SE(3), and require the
    recovered ATE RMSE to match the injected noise RMS (alignment absorbs
    only 7 of 3T DoF, so the match is tight for long trajectories). This is
    the protocol evo APE implements for the reference's published numbers
    (test_euroc.py:118-140)."""
    T = 800
    ts = np.arange(T, dtype=np.float64) * 0.05
    pos = np.cumsum(0.05 * rng.standard_normal((T, 3)), axis=0)
    q = np.tile([0, 0, 0, 1.0], (T, 1))
    gt = Trajectory(ts, pos, q)

    noise = 0.03 * rng.standard_normal((T, 3))
    injected_rms = float(np.sqrt(np.mean(np.sum(noise**2, axis=1))))

    R = Rotation.from_rotvec([0.4, -0.3, 0.9]).as_matrix()
    t_off = np.array([10.0, -4.0, 2.0])

    # Sim(3) frame change (scale 2.3) → needs correct_scale=True
    est_pos = 2.3 * (pos + noise) @ R.T + t_off
    r = ate_rmse(gt, Trajectory(ts, est_pos, q), correct_scale=True)
    assert abs(r["ate_rmse"] - injected_rms) < 0.05 * injected_rms, (
        r["ate_rmse"], injected_rms)
    assert abs(r["scale"] - 1.0 / 2.3) < 0.01  # recovered model→data scale

    # SE(3) frame change (unit scale) → correct_scale=False must suffice
    est_pos_se3 = (pos + noise) @ R.T + t_off
    r2 = ate_rmse(gt, Trajectory(ts, est_pos_se3, q), correct_scale=False)
    assert abs(r2["ate_rmse"] - injected_rms) < 0.05 * injected_rms
    # and scale correction on a unit-scale problem must not change the verdict
    r3 = ate_rmse(gt, Trajectory(ts, est_pos_se3, q), correct_scale=True)
    assert abs(r3["ate_rmse"] - injected_rms) < 0.05 * injected_rms


def test_ate_association_stride_protocol():
    """EuRoC protocol shape: estimate at stride 2 with timestamp jitter below
    max_dt must associate every estimated pose to its GT row
    (test_euroc.py:111-138)."""
    T = 100
    ts = np.arange(T, dtype=np.float64) * 0.05
    pos = np.cumsum(0.05 * rng.standard_normal((T, 3)), axis=0)
    q = np.tile([0, 0, 0, 1.0], (T, 1))
    gt = Trajectory(ts, pos, q)

    sel = np.arange(0, T, 2)
    jitter = 0.004 * (rng.random(len(sel)) - 0.5)
    est = Trajectory(ts[sel] + jitter, pos[sel], q[sel])

    r = ate_rmse(gt, est, correct_scale=False, max_dt=0.02)
    assert r["n_pairs"] == len(sel)
    assert r["ate_rmse"] < 1e-9


def test_load_euroc_csv(tmp_path):
    """EuRoC native GT CSV (ns timestamps, wxyz quats) loads into the TUM
    convention (seconds, xyzw) and scores against a seconds-stamped estimate."""
    T = 20
    ts_ns = 1403636580863555584 + np.arange(T) * 5_000_000  # 200 Hz
    pos = np.cumsum(0.02 * rng.standard_normal((T, 3)), axis=0)
    quat_wxyz = np.tile([1.0, 0, 0, 0], (T, 1))
    rows = np.concatenate(
        [ts_ns[:, None].astype(np.float64), pos, quat_wxyz,
         np.zeros((T, 9))], axis=1,  # velocity/bias columns present in data.csv
    )
    csv = tmp_path / "data.csv"
    header = "#timestamp, p_RS_R_x [m], ..."
    np.savetxt(csv, rows, delimiter=",", header=header, fmt="%.9f")

    gt = Trajectory.load_euroc_csv(str(csv))
    assert np.allclose(gt.tstamps, ts_ns / 1e9)
    assert np.allclose(gt.quats, np.tile([0, 0, 0, 1.0], (T, 1)))

    est = Trajectory(ts_ns / 1e9, pos, gt.quats)
    r = ate_rmse(gt, est, correct_scale=False, max_dt=0.02)
    assert r["n_pairs"] == T and r["ate_rmse"] < 1e-9

    # extension dispatch
    assert np.allclose(Trajectory.load(str(csv)).positions, gt.positions)


def test_associate_by_timestamp():
    ia, ib = associate(np.array([0.0, 1.0, 2.0]), np.array([0.005, 2.01, 5.0]))
    assert list(ia) == [0, 2]
    assert list(ib) == [0, 1]


def test_load_tartanair_ned_permutation(tmp_path):
    """pose_left.txt is NED with no timestamp column; the loader must apply
    the reference's ned->xyz permutation and stamp rows by index
    (validate_tartanair.py:93-94)."""
    # NED row: tx_n ty_n tz_n qx_n qy_n qz_n qw
    rows = np.array(
        [[1.0, 2.0, 3.0, 0.1, 0.2, 0.3, 0.9],
         [4.0, 5.0, 6.0, 0.4, 0.5, 0.6, 0.8]]
    )
    path = tmp_path / "pose_left.txt"
    np.savetxt(str(path), rows, delimiter=" ")
    traj = Trajectory.load_tartanair(str(path))
    assert np.array_equal(traj.tstamps, [0.0, 1.0])
    # xyz = (ned[1], ned[2], ned[0]); quat xyz likewise permuted, w kept
    assert np.allclose(traj.positions[0], [2.0, 3.0, 1.0])
    assert np.allclose(traj.quats[0], [0.2, 0.3, 0.1, 0.9])


def test_associate_prefers_nearest_not_first():
    """Dense GT vs sparse estimates (the EuRoC shape: 200 Hz GT, 20 Hz est):
    each estimate must pair with its NEAREST GT sample, not with an earlier
    one up to max_dt stale that happened to be scanned first."""
    t_gt = np.arange(0.0, 1.0, 0.005)  # 200 Hz
    t_est = np.array([0.1, 0.5, 0.9])
    ia, ib = associate(t_gt, t_est, max_dt=0.02)
    assert len(ia) == 3
    matched_gt = t_gt[ia]
    assert np.abs(matched_gt - t_est[ib]).max() < 1e-9  # exact hits exist


def test_iproj_points_roundtrip():
    """Back-projected points must reproject onto the original pixels."""
    F, ht, wd = 3, 6, 8
    from droid_slam_tpu.ops import projective as pops

    tw = 0.05 * rng.standard_normal((F, 6)).astype(np.float32)
    poses = np.asarray(
        lie.retr(jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (F, 1)), jnp.asarray(tw))
    )
    disps = (0.5 + rng.random((F, ht, wd))).astype(np.float32)
    intr = np.array([8.0, 8.0, wd / 2, ht / 2], np.float32)

    pts = np.asarray(vis_ops.iproj_points(jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr)))
    # reproject frame 1's points through its own pose
    X = jnp.concatenate(
        [jnp.asarray(pts[1]), jnp.ones((ht, wd, 1))], axis=-1
    )
    Y = lie.act(jnp.asarray(poses[1])[None, None], X)
    u = intr[0] * Y[..., 0] / Y[..., 2] + intr[2]
    v = intr[1] * Y[..., 1] / Y[..., 2] + intr[3]
    grid = np.asarray(pops.coords_grid(ht, wd))
    assert np.abs(np.asarray(u) - grid[..., 0]).max() < 1e-3
    assert np.abs(np.asarray(v) - grid[..., 1]).max() < 1e-3


def test_depth_filter_consistent_scene():
    """A perfectly consistent scene must give positive neighbor counts."""
    F, ht, wd = 8, 6, 8
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))
    # camera slides along x; constant depth plane at z=2 (disp 0.5)
    poses[:, 0] = 0.01 * np.arange(F)
    disps = np.full((F, ht, wd), 0.5, np.float32)
    intr = np.array([8.0, 8.0, wd / 2, ht / 2], np.float32)

    counts = np.asarray(
        vis_ops.depth_filter(
            jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
            jnp.arange(F), jnp.full((F,), 0.1),
        )
    )
    assert counts.shape == (F, ht, wd)
    assert counts.max() > 0


def test_geodesic_loss_zero_at_ground_truth():
    F = 5
    tw = 0.1 * rng.standard_normal((F, 6)).astype(np.float32)
    Ps = np.asarray(
        lie.retr(jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (F, 1)), jnp.asarray(tw))
    )[None]
    ii = jnp.asarray([0, 1, 2], jnp.int32)
    jj = jnp.asarray([1, 2, 3], jnp.int32)
    Gs = jnp.asarray(Ps)[None]  # one step, exactly GT
    loss, metrics = L.geodesic_loss(jnp.asarray(Ps), Gs, ii, jj, do_scale=False)
    assert float(loss) < 1e-5
    assert float(metrics["rot_error"]) < 1e-3

    # perturbed estimate → positive loss
    tw2 = 0.05 * rng.standard_normal((1, F, 6)).astype(np.float32)
    Gs2 = lie.retr(jnp.asarray(Ps), jnp.asarray(tw2))[None]
    loss2, _ = L.geodesic_loss(jnp.asarray(Ps), Gs2, ii, jj, do_scale=False)
    assert float(loss2) > float(loss)


def test_residual_loss_gamma_weighting():
    res = jnp.stack([jnp.ones((2, 3)), 2 * jnp.ones((2, 3))])
    loss, _ = L.residual_loss(res, gamma=0.5)
    assert abs(float(loss) - (0.5 * 1.0 + 1.0 * 2.0)) < 1e-6


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])
