"""Tests for projective_transform: NumPy oracle + directional-derivative checks.

The Jacobian convention (left-multiplied twist on pose i / pose j, and the
inverse-depth Jacobian) is validated with jax.jvp through the retraction —
an oracle the reference lacks (it only cross-checks CPU vs CUDA; here we check
against the mathematical definition directly).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from droid_slam_tpu.ops import lie, projective as pops

TOL = 1e-4
rng = np.random.default_rng(5432)


def make_scene(P=4, ht=6, wd=8):
    # small SLAM-like inter-frame motion (large random rotations put whole
    # frames behind the camera and void the valid mask)
    rot = Rotation.from_rotvec(0.1 * rng.standard_normal((P, 3)))
    q = rot.as_quat().astype(np.float32)
    t = 0.1 * rng.standard_normal((P, 3)).astype(np.float32)
    poses = np.concatenate([t, q], axis=-1)
    disps = (0.5 + rng.random((P, ht, wd))).astype(np.float32)
    intr = np.tile(np.array([8.0, 8.0, wd / 2 - 0.5, ht / 2 - 0.5], np.float32), (P, 1))
    return poses, disps, intr


def numpy_reproject(poses, disps, intr, i, j):
    """Independent per-pixel oracle for the reprojection coordinates."""
    ht, wd = disps.shape[1:]
    Ri = Rotation.from_quat(poses[i, 3:7]).as_matrix()
    Rj = Rotation.from_quat(poses[j, 3:7]).as_matrix()
    ti, tj = poses[i, :3], poses[j, :3]
    Rij = Rj @ Ri.T
    tij = tj - Rij @ ti
    fx, fy, cx, cy = intr[i]
    out = np.zeros((ht, wd, 2))
    for v in range(ht):
        for u in range(wd):
            d = disps[i, v, u]
            X = np.array([(u - cx) / fx, (v - cy) / fy, 1.0])
            Y = Rij @ X + d * tij
            Z = Y[2] if Y[2] >= 0.5 * 0.2 else 1.0
            fx2, fy2, cx2, cy2 = intr[j]
            out[v, u] = [fx2 * Y[0] / Z + cx2, fy2 * Y[1] / Z + cy2]
    return out


def test_coords_match_numpy_oracle():
    poses, disps, intr = make_scene()
    ii = np.array([0, 1, 2], np.int32)
    jj = np.array([1, 3, 0], np.int32)
    coords, valid = pops.projective_transform(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr), jnp.asarray(ii), jnp.asarray(jj)
    )
    coords = np.asarray(coords)
    for k, (i, j) in enumerate(zip(ii, jj)):
        want = numpy_reproject(poses, disps, intr, i, j)
        assert np.abs(coords[k] - want).max() < TOL


def test_identity_maps_to_grid():
    poses, disps, intr = make_scene()
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (4, 1))
    flow, valid = pops.induced_flow(
        jnp.asarray(poses),
        jnp.asarray(disps),
        jnp.asarray(intr),
        jnp.asarray([0, 1], np.int32),
        jnp.asarray([1, 2], np.int32),
    )
    assert np.abs(np.asarray(flow)).max() < TOL
    assert np.asarray(valid).min() == 1.0


def test_stereo_self_edge_uses_baseline():
    poses, disps, intr = make_scene()
    ii = jnp.asarray([1], jnp.int32)
    jj = jnp.asarray([1], jnp.int32)
    coords, _ = pops.projective_transform(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr), ii, jj
    )
    # baseline (-0.1, 0, 0): u' = u + fx * (-0.1) * d / 1
    fx = intr[1, 0]
    want_du = -0.1 * fx * disps[1]
    got_du = np.asarray(coords)[0, ..., 0] - np.asarray(pops.coords_grid(6, 8))[..., 0]
    assert np.abs(got_du - want_du).max() < TOL


def test_jacobians_match_directional_derivatives():
    poses, disps, intr = make_scene()
    ii = jnp.asarray([0, 2], jnp.int32)
    jj = jnp.asarray([1, 3], jnp.int32)
    poses_j = jnp.asarray(poses)
    disps_j = jnp.asarray(disps)
    intr_j = jnp.asarray(intr)

    coords, valid, jac = pops.projective_transform(
        poses_j, disps_j, intr_j, ii, jj, jacobian=True
    )

    # directional derivative w.r.t. a twist applied to one pose via retraction
    xi = jnp.asarray(0.7 * rng.standard_normal(6).astype(np.float32))
    for which, J in [(0, "Ji"), (1, "Jj")]:
        for edge in range(2):
            p = int(np.asarray(ii if which == 0 else jj)[edge])

            def f(eps):
                perturbed = poses_j.at[p].set(lie.retr(poses_j[p], eps * xi))
                c, _ = pops.projective_transform(perturbed, disps_j, intr_j, ii, jj)
                return c[edge]

            got_dir = np.asarray(jax.jvp(f, (0.0,), (1.0,))[1])
            Jmat = np.asarray(getattr(jac, J)[edge])
            want_dir = np.einsum("hwck,k->hwc", Jmat, np.asarray(xi))
            ok = np.asarray(valid)[edge, ..., 0] > 0
            # float32 comparison: normalise by the cancellation scale
            # Σ|J|·|xi| (float64 agreement is ~1e-13 — the convention is
            # exact; what remains here is f32 roundoff through the
            # quaternion chain)
            scale = 1.0 + np.einsum("hwck,k->hwc", np.abs(Jmat), np.abs(np.asarray(xi)))
            err = (np.abs(got_dir - want_dir) / scale)[ok]
            assert err.max() < 7e-3, f"{J} edge {edge} err {err.max()}"

    # inverse-depth Jacobian
    def g(eps):
        c, _ = pops.projective_transform(
            poses_j, disps_j.at[0].add(eps), intr_j, ii, jj
        )
        return c[0]

    got_dz = jax.jvp(g, (0.0,), (1.0,))[1]
    want_dz = np.asarray(jac.Jz)[0, ..., 0]
    ok = np.asarray(valid)[0, ..., 0] > 0
    assert np.abs(np.asarray(got_dz) - want_dz)[ok].max() < 1e-2


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])
