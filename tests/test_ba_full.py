"""Unified BA core: line/plane parameter blocks + long-chain convergence.

VERDICT round-1 acceptance tests:
  - item 3: a corrupted plane/line map is recovered by BA
    (`src/Optimizer.cc:1853-2600` vertex semantics);
  - item 5: GBA on a perturbed long keyframe chain converges to ground
    truth with exact gauge fixing and NO improvement-revert gate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from planarslam_tpu.geometry import plane as plane_geo
from planarslam_tpu.geometry import se3
from planarslam_tpu.solvers.ba_core import (BAWeights, LineTables,
                                            PlaneTables, PointTables,
                                            ba_solve, empty_line_tables,
                                            empty_plane_tables)
from planarslam_tpu.solvers.ba_pcg import ba_solve_pcg
from planarslam_tpu.config import PlaneConfig

CAM_K = (300.0, 310.0, 160.0, 120.0)
BF = 24.0


def project(T, x):
    pc = T[:3, :3] @ x + T[:3, 3]
    u = CAM_K[0] * pc[0] / pc[2] + CAM_K[2]
    v = CAM_K[1] * pc[1] / pc[2] + CAM_K[3]
    return np.array([u, v]), pc[2]


def make_poses(rng, Kt, spread=0.25):
    poses = []
    for i in range(Kt):
        xi = np.r_[rng.normal(0, spread, 3) * 0.3,
                   rng.normal(0, spread, 3)].astype(np.float32)
        poses.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    return np.stack(poses)


@pytest.mark.parametrize("solver", [ba_solve, ba_solve_pcg],
                         ids=["dense", "pcg"])
def test_ba_recovers_lines_and_planes(rng, solver):
    """Perturbed line endpoints + plane coefficients + poses recover from
    perfect observations (the reference's full-BA vertex set). Runs through
    BOTH the dense-Schur solver and the matrix-free PCG variant
    (solvers/ba_pcg.py) — same measurement model, same convergence."""
    Kt, P_pts, NL, NP = 4, 96, 6, 3
    F = 96
    pts_gt = rng.uniform(-2, 2, (P_pts, 3)).astype(np.float32)
    pts_gt[:, 2] = rng.uniform(3, 6, P_pts)
    poses_gt = make_poses(rng, Kt, spread=0.15)

    # line endpoints (world)
    ln_s = rng.uniform(-2, 2, (NL, 3)).astype(np.float32)
    ln_s[:, 2] = rng.uniform(3, 5, NL)
    d = rng.normal(0, 1, (NL, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ln_e = ln_s + d * 1.0

    # planes (world, normalized, d >= 0)
    pl_gt = np.asarray(plane_geo.normalize(jnp.asarray(
        rng.normal(0, 1, (NP, 4)).astype(np.float32)
        + np.array([0, 0, 0, 5.0], np.float32))))

    # point observations
    obs_slot = np.full((Kt, F), -1, np.int32)
    obs_uv = np.zeros((Kt, F, 2), np.float32)
    obs_ur = np.full((Kt, F), -1.0, np.float32)
    for k in range(Kt):
        sel = rng.choice(P_pts, F - 16, replace=False)
        for f, p in enumerate(sel):
            uv, z = project(poses_gt[k], pts_gt[p])
            if z < 0.5:
                continue
            obs_slot[k, f] = p
            obs_uv[k, f] = uv
            obs_ur[k, f] = uv[0] - BF / z
    pt_tab = PointTables(slot=jnp.asarray(obs_slot),
                         uv=jnp.asarray(obs_uv), ur=jnp.asarray(obs_ur),
                         inv_s2=jnp.ones((Kt, F), jnp.float32),
                         mask=jnp.asarray((obs_slot >= 0).astype(np.float32)))

    # line observations: image-line through projected GT endpoints
    L2 = 2 * NL
    ln_slot = np.full((Kt, L2), -1, np.int32)
    ln_l2d = np.zeros((Kt, L2, 3), np.float32)
    for k in range(Kt):
        for i in range(NL):
            uv_s, zs = project(poses_gt[k], ln_s[i])
            uv_e, ze = project(poses_gt[k], ln_e[i])
            if zs < 0.5 or ze < 0.5:
                continue
            l_eq = np.cross(np.r_[uv_s, 1.0], np.r_[uv_e, 1.0])
            l_eq /= np.linalg.norm(l_eq[:2])
            ln_slot[k, 2 * i] = P_pts + 2 * i
            ln_slot[k, 2 * i + 1] = P_pts + 2 * i + 1
            ln_l2d[k, 2 * i] = l_eq
            ln_l2d[k, 2 * i + 1] = l_eq
    ln_tab = LineTables(slot=jnp.asarray(ln_slot),
                        line2d=jnp.asarray(ln_l2d),
                        inv_s2=jnp.ones((Kt, L2), jnp.float32),
                        mask=jnp.asarray((ln_slot >= 0).astype(np.float32)))

    # plane observations: GT camera-frame coefficients
    pl_slot = np.full((Kt, NP), -1, np.int32)
    pl_obs = np.zeros((Kt, NP, 4), np.float32)
    for k in range(Kt):
        for i in range(NP):
            pi_c = np.asarray(plane_geo.transform(
                jnp.asarray(poses_gt[k]), jnp.asarray(pl_gt[i])))
            pl_slot[k, i] = i
            pl_obs[k, i] = np.asarray(plane_geo.normalize(jnp.asarray(pi_c)))
    pl_tab = PlaneTables(slot=jnp.asarray(pl_slot),
                         pi_obs=jnp.asarray(pl_obs),
                         mask=jnp.ones((Kt, NP), jnp.float32))

    # ---- perturb everything except the gauge pose ----
    poses0 = poses_gt.copy()
    for k in range(1, Kt):
        xi = np.r_[rng.normal(0, 0.004, 3), rng.normal(0, 0.015, 3)]
        poses0[k] = np.asarray(se3.se3_exp(
            jnp.asarray(xi.astype(np.float32)))) @ poses0[k]
    lm0 = np.concatenate([
        pts_gt + rng.normal(0, 0.03, (P_pts, 3)).astype(np.float32),
        np.stack([ln_s, ln_e], axis=1).reshape(-1, 3)
        + rng.normal(0, 0.05, (L2, 3)).astype(np.float32)])
    pl0 = pl_gt.copy()
    pl0[:, 3] += rng.normal(0, 0.05, NP).astype(np.float32)
    nrm = pl0[:, :3] + rng.normal(0, 0.02, (NP, 3)).astype(np.float32)
    pl0[:, :3] = nrm / np.linalg.norm(nrm, axis=1, keepdims=True)

    fixed = np.zeros(Kt, np.float32)
    fixed[0] = 1.0
    w = BAWeights.from_config(PlaneConfig())
    poses1, lm1, pl1, chis = solver(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(lm0),
        jnp.asarray(pl0), pt_tab, ln_tab, pl_tab,
        empty_plane_tables(Kt), empty_plane_tables(Kt),
        CAM_K, BF, w, n_iters=15)
    poses1 = np.asarray(poses1)
    lm1 = np.asarray(lm1)
    pl1 = np.asarray(pl1)

    pose_err0 = np.linalg.norm(poses0[1:, :3, 3] - poses_gt[1:, :3, 3])
    pose_err1 = np.linalg.norm(poses1[1:, :3, 3] - poses_gt[1:, :3, 3])
    assert pose_err1 < 0.2 * pose_err0, f"poses {pose_err0} -> {pose_err1}"

    # plane coefficients recover (normal angle + d)
    for i in range(NP):
        cos = abs(float(pl1[i, :3] @ pl_gt[i, :3]))
        assert cos > 0.9995, f"plane {i} normal cos {cos}"
        assert abs(float(pl1[i, 3] - pl_gt[i, 3])) < 0.02

    # line endpoints recover ALONG the constraint directions: a point-to-
    # image-line residual leaves the along-line direction unobservable
    # (same as the reference's EdgeLine), so measure endpoint-to-GT-line
    # distance instead of endpoint identity
    for i in range(NL):
        dgt = (ln_e[i] - ln_s[i]) / np.linalg.norm(ln_e[i] - ln_s[i])
        for j, ep in enumerate((lm1[P_pts + 2 * i], lm1[P_pts + 2 * i + 1])):
            rel = ep - ln_s[i]
            perp = rel - (rel @ dgt) * dgt
            assert np.linalg.norm(perp) < 0.02, \
                f"line {i} endpoint {j} off-line by {np.linalg.norm(perp)}"


def _orbit_problem(rng, Kt, P, F):
    """Perturbed orbit around a shared landmark cloud (see geometry note in
    test_gba_long_chain_converges): returns (poses_gt, pts_gt, pt_tab,
    poses0, pts0, fixed)."""
    pts_gt = rng.normal(0, 1.5, (P, 3)).astype(np.float32)
    # cameras on a radius-6 circle, looking at the cloud center
    poses_gt = []
    for k in range(Kt):
        ang = 2 * np.pi * k / Kt
        c = np.array([6 * np.sin(ang), 0.3 * np.sin(3 * ang),
                      -6 * np.cos(ang)], np.float32)
        fwd = -c / np.linalg.norm(c)          # optical axis toward origin
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R_wc = np.stack([right, upv, fwd], axis=1)  # columns = camera axes
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = c
        poses_gt.append(np.linalg.inv(T_wc).astype(np.float32))
    poses_gt = np.stack(poses_gt)

    obs_slot = np.full((Kt, F), -1, np.int32)
    obs_uv = np.zeros((Kt, F, 2), np.float32)
    obs_ur = np.full((Kt, F), -1.0, np.float32)
    for k in range(Kt):
        sel = rng.choice(P, F, replace=False)
        for f, p in enumerate(sel):
            uv, z = project(poses_gt[k], pts_gt[p])
            if z < 0.5 or not (0 <= uv[0] < 320 and 0 <= uv[1] < 240):
                continue
            obs_slot[k, f] = p
            obs_uv[k, f] = uv
            obs_ur[k, f] = uv[0] - BF / z
    pt_tab = PointTables(slot=jnp.asarray(obs_slot),
                         uv=jnp.asarray(obs_uv), ur=jnp.asarray(obs_ur),
                         inv_s2=jnp.ones((Kt, F), jnp.float32),
                         mask=jnp.asarray((obs_slot >= 0).astype(np.float32)))

    # accumulated drift-style perturbation (like a pre-loop-closure map)
    poses0 = poses_gt.copy()
    drift = np.eye(4, dtype=np.float32)
    for k in range(1, Kt):
        xi = np.r_[rng.normal(0, 0.0006, 3), rng.normal(0, 0.002, 3)]
        drift = np.asarray(se3.se3_exp(
            jnp.asarray(xi.astype(np.float32)))) @ drift
        poses0[k] = drift @ poses0[k]
    pts0 = pts_gt + rng.normal(0, 0.02, (P, 3)).astype(np.float32)

    fixed = np.zeros(Kt, np.float32)
    fixed[0] = 1.0
    return poses_gt, pts_gt, pt_tab, poses0, pts0, fixed


@pytest.mark.slow
def test_gba_long_chain_converges(rng):
    """96-KF perturbed orbit + exact gauge fixing converges toward ground
    truth WITHOUT any revert gate or pose prior (VERDICT round-1 item 5 —
    round 1's solver actively diverged here and hid it behind a
    chi2-improvement revert gate).

    Geometry note: the trajectory ORBITS a shared landmark cloud so every
    keyframe co-observes landmarks with the gauge keyframe's neighborhood —
    ground truth is then strongly observable from the fixed KF0. (On a
    forward-moving corridor chain, smooth accumulated drift lies in a
    near-zero-cost valley by construction; removing it is loop closure's
    job, not BA's, so that makes a meaningless convergence test.)"""
    Kt, P, F = 96, 1024, 48
    poses_gt, pts_gt, pt_tab, poses0, pts0, fixed = _orbit_problem(
        rng, Kt, P, F)
    w = BAWeights.from_config(PlaneConfig())
    poses1, lm1, _, chis = ba_solve(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(pts0),
        jnp.zeros((0, 4), jnp.float32), pt_tab, empty_line_tables(Kt),
        empty_plane_tables(Kt), empty_plane_tables(Kt),
        empty_plane_tables(Kt), CAM_K, BF, w, n_iters=12)
    poses1 = np.asarray(poses1)

    err0 = np.linalg.norm(poses0[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    err1 = np.linalg.norm(poses1[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    # strong convergence over the whole chain, no wander at the far end
    assert err1.mean() < 0.15 * err0.mean(), \
        f"chain error {err0.mean():.4f} -> {err1.mean():.4f}"
    assert err1.max() < 0.3 * err0.max(), \
        f"max error {err0.max():.4f} -> {err1.max():.4f}"
    chi = np.asarray(chis["pt"])[np.asarray(pt_tab.mask) > 0]
    assert float(np.median(chi)) < 0.5


@pytest.mark.slow
def test_gba_pcg_beyond_dense_window(rng):
    """256-KF perturbed orbit through the matrix-free PCG solver — twice
    the dense-Schur window (global_ba.MAX_GBA_KF = 128). The dense path
    cannot hold this problem (its (Kt, M, 6, 3) cross tensor); PCG
    converges on it with the same gauge and LM policy."""
    Kt, P, F = 256, 1024, 24
    poses_gt, pts_gt, pt_tab, poses0, pts0, fixed = _orbit_problem(
        rng, Kt, P, F)
    w = BAWeights.from_config(PlaneConfig())
    poses1, lm1, _, chis = ba_solve_pcg(
        jnp.asarray(poses0), jnp.asarray(fixed), jnp.asarray(pts0),
        jnp.zeros((0, 4), jnp.float32), pt_tab, empty_line_tables(Kt),
        empty_plane_tables(Kt), empty_plane_tables(Kt),
        empty_plane_tables(Kt), CAM_K, BF, w, n_iters=12)
    poses1 = np.asarray(poses1)

    err0 = np.linalg.norm(poses0[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    err1 = np.linalg.norm(poses1[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    assert err1.mean() < 0.2 * err0.mean(), \
        f"chain error {err0.mean():.4f} -> {err1.mean():.4f}"
    assert err1.max() < 0.4 * err0.max(), \
        f"max error {err0.max():.4f} -> {err1.max():.4f}"
    chi = np.asarray(chis["pt"])[np.asarray(pt_tab.mask) > 0]
    assert float(np.median(chi)) < 0.5
