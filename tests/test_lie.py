"""Unit tests for the SE(3) Lie core against independent NumPy/scipy oracles.

Follows the reference test strategy (seeded tiny random tensors, L-inf
tolerance 1e-4; /root/reference/tests/test_droid_backends.py:8) but with
scipy.spatial.transform.Rotation as the rotation oracle instead of a second
native implementation.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from droid_slam_tpu.ops import lie

TOL = 1e-4
rng = np.random.default_rng(5432)


def random_pose(shape=()):
    q = Rotation.random(num=int(np.prod(shape)) if shape else 1, random_state=42).as_quat()
    q = q.reshape(shape + (4,)) if shape else q[0]
    t = rng.standard_normal(shape + (3,)).astype(np.float32)
    return np.concatenate([t, q.astype(np.float32)], axis=-1)


def pose_to_mat(pose):
    mat = np.eye(4, dtype=np.float64)
    mat[:3, :3] = Rotation.from_quat(pose[3:7]).as_matrix()
    mat[:3, 3] = pose[:3]
    return mat


def test_quat_rotate_matches_rotation_matrix():
    poses = random_pose((16,))
    x = rng.standard_normal((16, 3)).astype(np.float32)
    got = np.asarray(lie.quat_rotate(jnp.asarray(poses[:, 3:7]), jnp.asarray(x)))
    want = np.stack([Rotation.from_quat(p[3:7]).apply(xi) for p, xi in zip(poses, x)])
    assert np.abs(got - want).max() < TOL


def test_mul_inv_match_matrices():
    a, b = random_pose((8,)), random_pose((8,))
    ab = np.asarray(lie.mul(jnp.asarray(a), jnp.asarray(b)))
    inv_a = np.asarray(lie.inv(jnp.asarray(a)))
    for k in range(8):
        want = pose_to_mat(a[k]) @ pose_to_mat(b[k])
        got = pose_to_mat(ab[k])
        assert np.abs(got - want).max() < TOL
        got_inv = pose_to_mat(inv_a[k])
        assert np.abs(got_inv @ pose_to_mat(a[k]) - np.eye(4)).max() < TOL


def test_rel_is_j_compose_i_inverse():
    gi, gj = random_pose((8,)), random_pose((8,))
    gij = np.asarray(lie.rel(jnp.asarray(gi), jnp.asarray(gj)))
    for k in range(8):
        want = pose_to_mat(gj[k]) @ np.linalg.inv(pose_to_mat(gi[k]))
        assert np.abs(pose_to_mat(gij[k]) - want).max() < TOL


def test_act_homogeneous_point():
    g = random_pose((8,))
    X = rng.standard_normal((8, 4)).astype(np.float32)
    Y = np.asarray(lie.act(jnp.asarray(g), jnp.asarray(X)))
    for k in range(8):
        R = Rotation.from_quat(g[k, 3:7]).as_matrix()
        want3 = R @ X[k, :3] + X[k, 3] * g[k, :3]
        assert np.abs(Y[k, :3] - want3).max() < TOL
        assert Y[k, 3] == X[k, 3]


def test_exp_log_roundtrip():
    xi = 0.5 * rng.standard_normal((32, 6)).astype(np.float32)
    g = lie.exp(jnp.asarray(xi))
    xi_back = np.asarray(lie.log(g))
    assert np.abs(xi_back - xi).max() < TOL


def test_log_double_cover_invariance():
    """q and -q are the same rotation; log must reduce to the principal
    branch for both (lietorch/Sophus semantics). The qw<0 representative
    once returned 2*pi - theta, inflating a 0.1 rad geodesic error ~60x."""
    xi = 1.5 * rng.standard_normal((16, 6)).astype(np.float32)
    g = np.asarray(lie.exp(jnp.asarray(xi)))
    g_neg = g.copy()
    g_neg[:, 3:7] *= -1.0
    l1 = np.asarray(lie.log(jnp.asarray(g)))
    l2 = np.asarray(lie.log(jnp.asarray(g_neg)))
    assert np.abs(l1 - l2).max() < 1e-5
    # the returned angle is principal
    assert np.linalg.norm(l1[:, 3:6], axis=-1).max() <= np.pi + 1e-6
    # exp matches the matrix exponential
    from scipy.linalg import expm

    for k in range(4):
        tau, phi = xi[k, :3], xi[k, 3:6]
        hat = np.zeros((4, 4))
        hat[:3, :3] = np.array(
            [[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]]
        )
        hat[:3, 3] = tau
        want = expm(hat)
        got = pose_to_mat(np.asarray(g)[k])
        assert np.abs(got - want).max() < TOL


def test_exp_small_angle_branch():
    xi = np.zeros((3, 6), dtype=np.float32)
    xi[1, 3:] = 1e-6  # below both Taylor switch points
    xi[2, 0] = 0.3
    g = np.asarray(lie.exp(jnp.asarray(xi)))
    assert np.abs(g[0] - np.array([0, 0, 0, 0, 0, 0, 1])).max() < 1e-7
    assert np.abs(g[2, :3] - np.array([0.3, 0, 0])).max() < 1e-7
    # gradient is finite through the small-angle branch
    import jax

    grad = jax.grad(lambda v: jnp.sum(lie.exp(v) ** 2))(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_retr_matches_exp_compose():
    g = random_pose((8,))
    xi = 0.1 * rng.standard_normal((8, 6)).astype(np.float32)
    got = np.asarray(lie.retr(jnp.asarray(g), jnp.asarray(xi)))
    want = np.asarray(lie.mul(lie.exp(jnp.asarray(xi)), jnp.asarray(g)))
    assert np.abs(got - want).max() < TOL


def test_adjT_definition():
    """adjT must satisfy <Ad^T(G) a, b> = <a, Ad(G) b> with the generator
    convention used by the projective Jacobians (translation-first twist,
    action d/dε exp(ε ξ) G)."""
    g = random_pose((4,))
    a = rng.standard_normal((4, 6)).astype(np.float32)
    got = np.asarray(lie.adjT(jnp.asarray(g), jnp.asarray(a)))

    for k in range(4):
        R = Rotation.from_quat(g[k, 3:7]).as_matrix()
        t = g[k, :3]
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        Ad = np.zeros((6, 6))
        Ad[:3, :3] = R
        Ad[:3, 3:] = tx @ R
        Ad[3:, 3:] = R
        want = Ad.T @ a[k]
        assert np.abs(got[k] - want).max() < TOL


def test_to_matrix_and_normalize():
    g = random_pose((5,))
    M = np.asarray(lie.to_matrix(jnp.asarray(g)))
    for k in range(5):
        assert np.abs(M[k] - pose_to_mat(g[k])).max() < TOL
    g2 = np.asarray(lie.normalize(jnp.asarray(g) * 1.0001))
    assert np.abs(np.linalg.norm(g2[:, 3:7], axis=-1) - 1).max() < 1e-6


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])


class TestSim3:
    """Sim(3) group ops vs the 4×4 matrix-exponential oracle (the reference
    gets Sim3 from lietorch; used for scale-invariant losses, SURVEY §2.4)."""

    def _rng(self):
        return np.random.default_rng(17)

    def _to_matrix(self, g):
        g = np.asarray(g)
        t, q, s = g[:3], g[3:7], g[7]
        x, y, z, w = q
        R = np.array([
            [1 - 2*(y*y + z*z), 2*(x*y - w*z), 2*(x*z + w*y)],
            [2*(x*y + w*z), 1 - 2*(x*x + z*z), 2*(y*z - w*x)],
            [2*(x*z - w*y), 2*(y*z + w*x), 1 - 2*(x*x + y*y)],
        ])
        M = np.eye(4)
        M[:3, :3] = s * R
        M[:3, 3] = t
        return M

    def test_exp_matches_matrix_exponential(self):
        from scipy.linalg import expm
        rng = self._rng()
        for scale in [1e-6, 1e-3, 0.3, 1.5]:
            xi = (scale * rng.standard_normal(7)).astype(np.float32)
            g = lie.sim3_exp(jnp.asarray(xi))
            tau, phi, sigma = xi[:3], xi[3:6], xi[6]
            Phi = np.array([[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]])
            Xi = np.zeros((4, 4))
            Xi[:3, :3] = sigma * np.eye(3) + Phi
            Xi[:3, 3] = tau
            want = expm(Xi)
            got = self._to_matrix(g)
            assert np.abs(got - want).max() < 1e-4, (scale, np.abs(got - want).max())

    def test_mul_inv_identity(self):
        rng = self._rng()
        g = lie.sim3_exp(jnp.asarray(0.3 * rng.standard_normal((5, 7)), jnp.float32))
        e = lie.sim3_mul(g, lie.sim3_inv(g))
        assert np.abs(np.asarray(e) - np.asarray(lie.sim3_identity((5,)))).max() < 1e-5

    def test_act_composes(self):
        rng = self._rng()
        a = lie.sim3_exp(jnp.asarray(0.2 * rng.standard_normal(7), jnp.float32))
        b = lie.sim3_exp(jnp.asarray(0.2 * rng.standard_normal(7), jnp.float32))
        x = jnp.asarray(rng.standard_normal((10, 3)), jnp.float32)
        lhs = lie.sim3_act(lie.sim3_mul(a, b), x)
        rhs = lie.sim3_act(a, lie.sim3_act(b, x))
        assert np.abs(np.asarray(lhs) - np.asarray(rhs)).max() < 1e-5

    def test_sigma_zero_matches_se3(self):
        rng = self._rng()
        xi6 = jnp.asarray(0.4 * rng.standard_normal((4, 6)), jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((4, 1))], axis=-1)
        g8 = np.asarray(lie.sim3_exp(xi7))
        g7 = np.asarray(lie.exp(xi6))
        assert np.abs(g8[:, :7] - g7).max() < 1e-5
        assert np.abs(g8[:, 7] - 1.0).max() < 1e-6
