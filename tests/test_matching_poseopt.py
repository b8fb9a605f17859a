"""Tests for batched matching and pose-only optimization."""

import numpy as np
import jax.numpy as jnp

from planarslam_tpu.config import PlaneConfig
from planarslam_tpu.geometry import se3
from planarslam_tpu.ops import matching
from planarslam_tpu.solvers import pose_opt

K = (300.0, 310.0, 160.0, 120.0)
WH = (320.0, 240.0)
BF = 24.0


def _random_descs(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def _perturb_desc(rng, desc, n_bits):
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


def test_match_descriptors_mutual(rng):
    a = _random_descs(rng, 32)
    noisy = _perturb_desc(rng, a, 5)
    perm = rng.permutation(32)
    b = noisy[perm]
    res = matching.match_descriptors(
        jnp.asarray(a), jnp.asarray(b),
        jnp.ones(32, bool), jnp.ones(32, bool), max_dist=50, ratio=0.95)
    idx = np.asarray(res.idx)
    assert (idx >= 0).sum() >= 30
    ok = idx >= 0
    # matched index must invert the permutation
    assert (perm[idx[ok]] == np.arange(32)[ok]).all()


def test_search_by_projection_synthetic(rng):
    """Known 3D points observed in a frame: projection search must recover
    the ground-truth correspondence under a perturbed pose."""
    n = 64
    pts_w = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts_w[:, 2] = rng.uniform(2.0, 5.0, n)
    descs = _random_descs(rng, n)
    T_cw = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.05, -0.02, 0.1, 0.01, -0.02, 0.015], np.float32))))
    pc = (T_cw[:3, :3] @ pts_w.T).T + T_cw[:3, 3]
    uv = np.stack([K[0] * pc[:, 0] / pc[:, 2] + K[2],
                   K[1] * pc[:, 1] / pc[:, 2] + K[3]], -1).astype(np.float32)
    inside = ((uv[:, 0] > 5) & (uv[:, 0] < WH[0] - 5) &
              (uv[:, 1] > 5) & (uv[:, 1] < WH[1] - 5))
    feat_desc = _perturb_desc(rng, descs, 3)
    ur = (uv[:, 0] - BF / pc[:, 2]).astype(np.float32)

    # slightly wrong pose for the search (2cm translation error)
    T_bad = T_cw.copy()
    T_bad[:3, 3] += [0.02, -0.01, 0.01]
    res = matching.search_by_projection(
        jnp.asarray(pts_w), jnp.asarray(descs), jnp.ones(n, bool),
        jnp.asarray(T_bad.astype(np.float32)),
        jnp.asarray(uv), jnp.asarray(feat_desc),
        jnp.zeros(n, jnp.int32), jnp.asarray(inside),
        jnp.asarray(ur), K, WH, BF, scale_factor=1.2, radius=8.0,
        max_dist=60)
    idx = np.asarray(res.idx)
    matched = idx >= 0
    assert matched.sum() >= 0.8 * inside.sum()
    assert (idx[matched] == np.arange(n)[matched]).all()


def test_rotation_histogram_filter(rng):
    n = 100
    ang_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    ang_b = (ang_a - 0.3).astype(np.float32)  # consistent rotation
    bad = rng.choice(n, 10, replace=False)
    ang_b[bad] = rng.uniform(0, 2 * np.pi, 10)
    valid = np.ones(n, bool)
    keep = np.asarray(matching.rotation_histogram_filter(
        jnp.asarray(ang_a), jnp.asarray(ang_b), jnp.asarray(valid)))
    good = np.setdiff1d(np.arange(n), bad)
    assert keep[good].mean() > 0.95
    assert keep[bad].mean() < 0.5


def _make_pose_problem(rng, n=200, noise_px=0.5, outlier_frac=0.0,
                       stereo_frac=0.6):
    pts_w = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts_w[:, 2] = rng.uniform(2.0, 6.0, n)
    xi_true = np.array([0.1, -0.05, 0.08, 0.03, -0.02, 0.04], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))
    pc = (T_true[:3, :3] @ pts_w.T).T + T_true[:3, 3]
    uv = np.stack([K[0] * pc[:, 0] / pc[:, 2] + K[2],
                   K[1] * pc[:, 1] / pc[:, 2] + K[3]], -1)
    uv += rng.normal(0, noise_px, uv.shape)
    ur = uv[:, 0] - BF / pc[:, 2] + rng.normal(0, noise_px, n)
    is_stereo = rng.uniform(size=n) < stereo_frac
    ur = np.where(is_stereo, ur, -1.0)
    n_out = int(outlier_frac * n)
    if n_out:
        out_idx = rng.choice(n, n_out, replace=False)
        uv[out_idx] += rng.uniform(15, 40, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    points = pose_opt.PointObs(
        xw=jnp.asarray(pts_w), uv=jnp.asarray(uv.astype(np.float32)),
        u_right=jnp.asarray(ur.astype(np.float32)),
        inv_sigma2=jnp.ones(n, jnp.float32), valid=jnp.ones(n, bool))
    return T_true, points


def test_pose_optimize_points_converges(rng):
    T_true, points = _make_pose_problem(rng)
    res = pose_opt.pose_optimize(jnp.eye(4, dtype=jnp.float32), K, BF,
                                 points=points)
    T = np.asarray(res.T_cw)
    err_t = np.linalg.norm(T[:3, 3] - T_true[:3, 3])
    err_r = np.linalg.norm(np.asarray(se3.so3_log(
        jnp.asarray(T[:3, :3] @ T_true[:3, :3].T))))
    assert err_t < 0.01, f"translation error {err_t}"
    assert err_r < 0.005, f"rotation error {err_r}"
    assert int(res.n_point_inliers) > 180


def test_pose_optimize_rejects_outliers(rng):
    T_true, points = _make_pose_problem(rng, outlier_frac=0.3)
    res = pose_opt.pose_optimize(jnp.eye(4, dtype=jnp.float32), K, BF,
                                 points=points)
    T = np.asarray(res.T_cw)
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.02
    inlier = np.asarray(res.point_inlier)
    assert 120 <= inlier.sum() <= 160  # ~30% outliers rejected


def test_pose_optimize_translation_only(rng):
    T_true, points = _make_pose_problem(rng)
    # start from the true rotation, wrong translation
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :3] = T_true[:3, :3]
    res = pose_opt.pose_optimize(jnp.asarray(T0), K, BF, points=points,
                                 rotation_fixed=True)
    T = np.asarray(res.T_cw)
    np.testing.assert_allclose(T[:3, :3], T_true[:3, :3], atol=1e-7)
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.01


def test_pose_optimize_with_planes(rng):
    """Three perpendicular planes + a few points pin the pose fully."""
    T_true, points = _make_pose_problem(rng, n=30)
    pis_w = np.array([[1, 0, 0, -2.0], [0, 1, 0, -1.5], [0, 0, 1, -4.0]],
                     np.float32)
    from planarslam_tpu.geometry import plane as plane_geo

    pi_obs = np.asarray(plane_geo.transform(jnp.asarray(T_true),
                                            jnp.asarray(pis_w)))
    planes = pose_opt.PlaneObs(pi_w=jnp.asarray(pis_w),
                               pi_obs=jnp.asarray(pi_obs),
                               valid=jnp.ones(3, bool))
    res = pose_opt.pose_optimize(jnp.eye(4, dtype=jnp.float32), K, BF,
                                 points=points, planes=planes)
    T = np.asarray(res.T_cw)
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.01
    assert bool(np.asarray(res.plane_inlier).all())


def test_pose_optimize_with_lines(rng):
    T_true, points = _make_pose_problem(rng, n=20)
    L = 12
    xs = rng.uniform(-1.5, 1.5, (L, 3)).astype(np.float32)
    xs[:, 2] = rng.uniform(2, 5, L)
    dirs = rng.normal(0, 1, (L, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    xe = xs + dirs * 0.8
    # observed image line through the two projected endpoints (true pose)
    def proj(p):
        pc = (T_true[:3, :3] @ p.T).T + T_true[:3, 3]
        return np.stack([K[0] * pc[:, 0] / pc[:, 2] + K[2],
                         K[1] * pc[:, 1] / pc[:, 2] + K[3]], -1)

    a, b = proj(xs), proj(xe)
    lines2d = np.cross(np.c_[a, np.ones(L)], np.c_[b, np.ones(L)])
    lines2d /= np.linalg.norm(lines2d[:, :2], axis=1, keepdims=True)
    lines = pose_opt.LineObs(
        xw_s=jnp.asarray(xs), xw_e=jnp.asarray(xe),
        line2d=jnp.asarray(lines2d.astype(np.float32)),
        inv_sigma2=jnp.ones(L, jnp.float32), valid=jnp.ones(L, bool))
    res = pose_opt.pose_optimize(jnp.eye(4, dtype=jnp.float32), K, BF,
                                 points=points, lines=lines)
    T = np.asarray(res.T_cw)
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.02
    assert np.asarray(res.line_inlier).sum() >= L - 1
