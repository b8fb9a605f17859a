"""Unit tests for SO3/SE3/Sim3/plane geometry against scipy/numpy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from planarslam_tpu.geometry import se3, sim3, plane


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(0, 1.0, (32, 3)).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)
    w_back = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_so3_log_near_pi(rng):
    axis = rng.normal(0, 1, (8, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    w = (axis * (np.pi - 1e-4)).astype(np.float32)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w_back = np.asarray(se3.so3_log(jnp.asarray(R)))
    R_back = Rotation.from_rotvec(w_back).as_matrix()
    np.testing.assert_allclose(R_back, R, atol=2e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(0, 0.5, (16, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-4)
    # group property: T(xi) T(xi)^-1 = I
    prod = np.asarray(T @ se3.T_inv(T))
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_quat_roundtrip(rng):
    w = rng.normal(0, 1.5, (64, 3)).astype(np.float32)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = np.asarray(se3.R_to_quat(jnp.asarray(R)))
    q_ref = Rotation.from_matrix(R).as_quat()  # (x,y,z,w)
    # sign-normalize both
    q_ref *= np.where(q_ref[:, 3:4] < 0, -1, 1)
    np.testing.assert_allclose(q, q_ref, atol=1e-4)
    R_back = np.asarray(se3.quat_to_R(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_project_backproject(rng):
    K = (300.0, 310.0, 160.0, 120.0)
    pts = rng.uniform(0.5, 5.0, (100, 3)).astype(np.float32)
    pts[:, :2] -= 2.5
    uv = se3.project(K, jnp.asarray(pts))
    back = se3.backproject(K, uv, jnp.asarray(pts[:, 2]))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_transform_points(rng):
    xi = rng.normal(0, 0.3, (6,)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    pts = rng.normal(0, 1, (50, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
    ref = (np.asarray(T)[:3, :3] @ pts.T).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sim3_compose_inverse(rng):
    def rand_sim3():
        R = Rotation.from_rotvec(rng.normal(0, 0.5, 3)).as_matrix().astype(np.float32)
        return sim3.make(jnp.asarray(R), jnp.asarray(rng.normal(0, 1, 3).astype(np.float32)),
                         jnp.asarray(np.float32(np.exp(rng.normal(0, 0.2)))))

    S1, S2 = rand_sim3(), rand_sim3()
    pts = jnp.asarray(rng.normal(0, 1, (20, 3)).astype(np.float32))
    out1 = sim3.apply(S1, sim3.apply(S2, pts))
    out2 = sim3.apply(sim3.compose(S1, S2), pts)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
    back = sim3.apply(sim3.inverse(S1), sim3.apply(S1, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_plane_transform_consistency(rng):
    """Transformed plane must contain transformed points of the original plane."""
    n = rng.normal(0, 1, 3)
    n /= np.linalg.norm(n)
    d = float(rng.normal(0, 1))
    coeffs = jnp.asarray(np.r_[n, d].astype(np.float32))
    xi = rng.normal(0, 0.4, (6,)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    # points on plane: x = -d*n + tangent
    t1 = np.cross(n, [1.0, 0.3, 0.2])
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(n, t1)
    pts = (-d * n + rng.normal(0, 1, (30, 1)) * t1
           + rng.normal(0, 1, (30, 1)) * t2).astype(np.float32)
    pts_t = se3.transform_points(T, jnp.asarray(pts))
    coeffs_t = plane.transform(T, coeffs)
    dist = np.asarray(plane.point_plane_distance(coeffs_t, pts_t))
    np.testing.assert_allclose(dist, np.zeros(30), atol=1e-4)


def test_plane_ominus_zero_and_sensitivity():
    p = jnp.asarray(np.array([0.0, 0.0, 1.0, -2.0], dtype=np.float32))
    err = np.asarray(plane.ominus(p, p))
    np.testing.assert_allclose(err, np.zeros(3), atol=1e-6)
    # distance-only perturbation shows up only in component 2
    p2 = jnp.asarray(np.array([0.0, 0.0, 1.0, -2.1], dtype=np.float32))
    err = np.asarray(plane.ominus(p, p2))
    assert abs(abs(err[2]) - 0.1) < 1e-5 and np.allclose(err[:2], 0, atol=1e-6)


def test_plane_ominus_par_ver():
    ez = jnp.asarray(np.array([0.0, 0.0, 1.0, -1.0], dtype=np.float32))
    ez_flip = jnp.asarray(np.array([0.0, 0.0, -1.0, 5.0], dtype=np.float32))
    ex = jnp.asarray(np.array([1.0, 0.0, 0.0, 3.0], dtype=np.float32))
    # parallel error zero for parallel & anti-parallel planes, any distance
    np.testing.assert_allclose(np.asarray(plane.ominus_par(ez, ez_flip)),
                               np.zeros(2), atol=1e-6)
    # vertical error zero for perpendicular planes
    np.testing.assert_allclose(np.asarray(plane.ominus_ver(ez, ex)),
                               np.zeros(2), atol=1e-6)
    # near-parallel perturbation gives small nonzero par error
    tilted = jnp.asarray(np.array([0.05, 0.0, 0.998, -1.0], dtype=np.float32))
    err = np.asarray(plane.ominus_par(ez, tilted))
    assert 0.001 < np.abs(err).max() < 0.2


def test_orthonormalize(rng):
    R = Rotation.from_rotvec(rng.normal(0, 1, 3)).as_matrix().astype(np.float32)
    noisy = R + rng.normal(0, 0.01, (3, 3)).astype(np.float32)
    R2 = np.asarray(se3.orthonormalize(jnp.asarray(noisy)))
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R2) > 0.9
