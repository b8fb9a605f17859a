"""Tests for Horn/RANSAC alignment, pose graph, and local BA."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.geometry import se3
from planarslam_tpu.solvers.pose_graph import _optimize
from planarslam_tpu.solvers.sim3_solver import horn_ransac_se3, horn_ransac_sim3


def test_horn_ransac_se3(rng):
    src = rng.uniform(-2, 2, (60, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    t = np.array([0.5, -0.2, 1.0], np.float32)
    dst = src @ R.T + t + rng.normal(0, 0.005, (60, 3)).astype(np.float32)
    # 20% outliers
    out = rng.choice(60, 12, replace=False)
    dst[out] += rng.uniform(0.5, 1.5, (12, 3))
    T, n_inl, inl = horn_ransac_se3(src, dst)
    assert n_inl >= 40
    np.testing.assert_allclose(T[:3, :3], R, atol=0.02)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.03)


def test_horn_ransac_sim3(rng):
    src = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.1, 0.2, -0.1]).as_matrix().astype(np.float32)
    s = 1.4
    dst = s * (src @ R.T) + np.array([0.1, 0.2, 0.3], np.float32)
    T, s_est, n_inl, _ = horn_ransac_sim3(src, dst)
    assert abs(s_est - s) < 0.02
    assert n_inl >= 38


def test_pose_graph_closes_loop(rng):
    """Chain of 8 poses with accumulated drift; a loop edge from the last to
    the first must distribute the correction."""
    n = 8
    # ground truth: poses around a circle
    gt = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_euler("y", ang).as_matrix()
        T[:3, 3] = [np.sin(ang), 0.0, 1 - np.cos(ang)]
        gt.append(np.linalg.inv(T).astype(np.float32))  # T_cw
    gt = np.stack(gt)
    # drifted estimates: add noise growing along the chain
    est = gt.copy()
    for i in range(1, n):
        xi = rng.normal(0, 0.02 * i, 6).astype(np.float32) * 0.4
        est[i] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ est[i]

    edges, meas, w = [], [], []
    for i in range(1, n):
        edges.append((i, i - 1))
        meas.append(est[i] @ np.linalg.inv(est[i - 1]))  # drifted odometry
        w.append(1.0)
    # loop edge with the TRUE relative pose (what loop closing measures)
    edges.append((n - 1, 0))
    meas.append(gt[n - 1] @ np.linalg.inv(gt[0]))
    w.append(5.0)

    fixed = np.zeros(n, np.float32)
    fixed[0] = 1.0
    out = np.asarray(_optimize(jnp.asarray(est), jnp.asarray(np.array(edges, np.int32)),
                               jnp.asarray(np.stack(meas).astype(np.float32)),
                               jnp.asarray(np.array(w, np.float32)),
                               jnp.asarray(fixed)))
    # the last pose must now satisfy the loop constraint
    rel = out[n - 1] @ np.linalg.inv(out[0])
    rel_gt = gt[n - 1] @ np.linalg.inv(gt[0])
    err = np.asarray(se3.se3_log(jnp.asarray(
        (np.linalg.inv(rel_gt) @ rel).astype(np.float32))))
    assert np.linalg.norm(err) < 0.02, f"loop residual {err}"


def test_local_ba_reduces_error(rng):
    """Perturbed poses + points with perfect observations: LBA must recover
    both."""
    from planarslam_tpu.solvers.local_ba import _ba_iterate

    cam_K = (300.0, 310.0, 160.0, 120.0)
    bf = 24.0
    Kt, P, F = 4, 240, 160
    pts_gt = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    pts_gt[:, 2] = rng.uniform(3, 6, P)
    poses_gt = []
    for i in range(Kt):
        xi = np.r_[rng.normal(0, 0.2, 3), rng.normal(0, 0.05, 3)].astype(np.float32)
        poses_gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    poses_gt = np.stack(poses_gt)

    obs_slot = np.full((Kt, F), -1, np.int32)
    obs_uv = np.zeros((Kt, F, 2), np.float32)
    obs_ur = np.full((Kt, F), -1.0, np.float32)
    for k in range(Kt):
        sel = rng.choice(P, F - 10, replace=False)
        for f, p in enumerate(sel):
            pc = poses_gt[k, :3, :3] @ pts_gt[p] + poses_gt[k, :3, 3]
            if pc[2] < 0.5:
                continue
            u = cam_K[0] * pc[0] / pc[2] + cam_K[2]
            v = cam_K[1] * pc[1] / pc[2] + cam_K[3]
            obs_slot[k, f] = p
            obs_uv[k, f] = (u, v)
            obs_ur[k, f] = u - bf / pc[2]
    obs_mask = (obs_slot >= 0).astype(np.float32)

    # perturb everything except pose 0 (gauge)
    poses0 = poses_gt.copy()
    for k in range(1, Kt):
        xi = rng.normal(0, 0.01, 6).astype(np.float32)
        poses0[k] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses0[k]
    pts0 = pts_gt + rng.normal(0, 0.02, (P, 3)).astype(np.float32)
    fixed = np.zeros(Kt, np.float32)
    fixed[0] = 1.0

    poses1, pts1, chi2 = _ba_iterate(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(pts0),
        jnp.asarray(obs_slot), jnp.asarray(obs_uv), jnp.asarray(obs_ur),
        jnp.asarray(np.ones((Kt, F), np.float32)), jnp.asarray(obs_mask),
        cam_K, bf, n_iters=10)
    poses1, pts1 = np.asarray(poses1), np.asarray(pts1)
    pose_err0 = np.linalg.norm(poses0[1:, :3, 3] - poses_gt[1:, :3, 3])
    pose_err1 = np.linalg.norm(poses1[1:, :3, 3] - poses_gt[1:, :3, 3])
    assert pose_err1 < 0.1 * pose_err0, f"{pose_err0} -> {pose_err1}"
    chi_final = float(np.asarray(chi2)[obs_mask > 0].mean())
    assert chi_final < 0.5


def test_local_ba_on_map():
    """Integration: run local_bundle_adjustment on a map built by tracking."""
    from planarslam_tpu.io import synthetic
    from planarslam_tpu.slam.system import System
    from planarslam_tpu.solvers.local_ba import local_bundle_adjustment

    cfg = SystemConfig.tiny()
    seq = synthetic.make_sequence(n_frames=14, width=cfg.camera.width,
                                  height=cfg.camera.height)
    slam = System(config=cfg)
    for i in range(len(seq)):
        g, d = seq.render(i)
        slam.track_rgbd(g, d, seq.timestamps[i])
    m = slam.map
    if m.n_kf < 3:
        return  # not enough KFs to exercise BA on this short run
    before = m.kf_pose.copy()
    local_bundle_adjustment(m, m.n_kf - 1, cfg)
    # poses remain finite; corrections stay bounded (no divergence)
    assert np.isfinite(m.kf_pose[:m.n_kf]).all()
    delta = np.abs(m.kf_pose[:m.n_kf] - before[:m.n_kf]).max()
    assert delta < 1.0
