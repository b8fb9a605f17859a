"""Local bundle adjustment over points + line endpoints + planes.

Rebuild of `Optimizer::LocalBundleAdjustment` (`src/Optimizer.cc:1853`):
optimize the covisibility-local window of keyframe poses plus the point /
line-endpoint / plane landmarks they observe (vertices at `:1906-2010`),
with fixed anchor keyframes, in the reference's two-stage schedule
(5 iterations, outlier purge at 5.991 mono / 7.815 stereo / 2x5.991 per
line pair / Plane.Chi / VPChi, then 10 more iterations) and write-back of
poses + landmarks + erased outlier observations.

Note: the shipped reference never CALLS this (the invocation is commented
out at `src/LocalMapping.cc:67-69`); it is kept behind
LocalMapping(enable_local_ba=...) for ship-state parity (SURVEY.md §7
semantics-to-preserve).

The solver core (dense Schur over unified 3-dof landmark blocks, exact
gauge fixing, LM accept/reject) lives in solvers/ba_core.py.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from planarslam_tpu.config import PlaneConfig, SystemConfig
from planarslam_tpu.solvers import ba_core
from planarslam_tpu.solvers.ba_core import (CHI2_MONO, CHI2_STEREO,
                                            BAWeights, LineTables,
                                            PlaneTables, PointTables,
                                            ba_solve)

MAX_LOCAL_KF = 8
MAX_FIXED_KF = 8
MAX_LOCAL_PTS = 2048
MAX_LOCAL_LNS = 128   # line landmarks -> 256 endpoint blocks
MAX_LOCAL_PLS = 32


def build_point_tables(m, all_kfs: List[int], Kt: int, pt_ids: np.ndarray,
                       cfg: SystemConfig) -> Tuple[PointTables, np.ndarray]:
    """Vectorized observation-table gather (no per-feature Python loops)."""
    F = cfg.orb.max_keypoints
    slot_lut = np.full(m.pt_xyz.shape[0], -1, np.int32)
    slot_lut[pt_ids] = np.arange(len(pt_ids), dtype=np.int32)
    kf_arr = np.asarray(all_kfs)
    rows = m.kf_pt_idx[kf_arr]                       # (Kr, F)
    obs_slot = np.where(rows >= 0, slot_lut[np.clip(rows, 0, None)], -1)
    s2 = (1.0 / cfg.orb.scale_factor ** (
        2 * np.arange(cfg.orb.n_levels))).astype(np.float32)
    obs_uv = m.kf_uv[kf_arr].astype(np.float32)
    obs_ur = np.where(obs_slot >= 0, m.kf_ur[kf_arr], -1.0).astype(np.float32)
    obs_is2 = s2[m.kf_level[kf_arr]].astype(np.float32)

    def pad(a, fill):
        out = np.full((Kt,) + a.shape[1:], fill, a.dtype)
        out[:len(kf_arr)] = a
        return out

    obs_slot = pad(obs_slot, -1)
    tables = PointTables(
        slot=jnp.asarray(obs_slot),
        uv=jnp.asarray(pad(obs_uv, 0.0)),
        ur=jnp.asarray(pad(obs_ur, -1.0)),
        inv_s2=jnp.asarray(pad(obs_is2, 1.0)),
        mask=jnp.asarray((obs_slot >= 0).astype(np.float32)))
    return tables, obs_slot


def build_line_tables(m, all_kfs: List[int], Kt: int, ln_ids: np.ndarray,
                      n_xyz_pts: int, cfg: SystemConfig
                      ) -> Tuple[LineTables, np.ndarray]:
    """Line-endpoint tables: map line id -> two xyz landmark slots appended
    after the points (start = n_pts + 2i, end = n_pts + 2i + 1)."""
    L = cfg.lines.max_lines
    slot_lut = np.full(m.ln_sw.shape[0], -1, np.int32)
    slot_lut[ln_ids] = np.arange(len(ln_ids), dtype=np.int32)
    kf_arr = np.asarray(all_kfs)
    rows = m.kf_ln_idx[kf_arr]                       # (Kr, L)
    lslot = np.where(rows >= 0, slot_lut[np.clip(rows, 0, None)], -1)
    # two endpoint observations per detected line, same image-line equation
    ep_slot = np.full((len(kf_arr), 2 * L), -1, np.int32)
    ep_slot[:, 0::2] = np.where(lslot >= 0, n_xyz_pts + 2 * lslot, -1)
    ep_slot[:, 1::2] = np.where(lslot >= 0, n_xyz_pts + 2 * lslot + 1, -1)
    line2d = np.repeat(m.kf_ln_line2d[kf_arr], 2, axis=1).astype(np.float32)

    def pad(a, fill):
        out = np.full((Kt,) + a.shape[1:], fill, a.dtype)
        out[:len(kf_arr)] = a
        return out

    ep_slot = pad(ep_slot, -1)
    tables = LineTables(
        slot=jnp.asarray(ep_slot),
        line2d=jnp.asarray(pad(line2d, 0.0)),
        inv_s2=jnp.ones((Kt, 2 * L), jnp.float32),
        mask=jnp.asarray((ep_slot >= 0).astype(np.float32)))
    return tables, ep_slot


def build_plane_tables(m, all_kfs: List[int], Kt: int, pl_ids: np.ndarray,
                       cfg: SystemConfig):
    """Direct/parallel/vertical plane observation tables.

    The observed camera-frame coefficients come from the KF's stored
    per-frame plane detections (kf_pl_coeffs)."""
    Pp = cfg.planes.max_planes
    slot_lut = np.full(m.pl_coeffs.shape[0], -1, np.int32)
    slot_lut[pl_ids] = np.arange(len(pl_ids), dtype=np.int32)
    kf_arr = np.asarray(all_kfs)

    def table_for(idx_table):
        rows = idx_table[kf_arr]                     # (Kr, Pp)
        slot = np.where(rows >= 0, slot_lut[np.clip(rows, 0, None)], -1)
        pi_obs = m.kf_pl_coeffs[kf_arr].astype(np.float32)
        out_slot = np.full((Kt, Pp), -1, np.int32)
        out_slot[:len(kf_arr)] = slot
        out_pi = np.zeros((Kt, Pp, 4), np.float32)
        out_pi[:len(kf_arr)] = pi_obs
        # planes with zero coeffs (no detection in that frame slot) invalid
        has_obs = (np.abs(out_pi).sum(-1) > 1e-6) & (out_slot >= 0)
        out_slot = np.where(has_obs, out_slot, -1)
        return PlaneTables(slot=jnp.asarray(out_slot),
                           pi_obs=jnp.asarray(out_pi),
                           mask=jnp.asarray(has_obs.astype(np.float32))), \
            out_slot

    direct, direct_slot = table_for(m.kf_pl_idx)
    par, _ = table_for(m.kf_pl_par_idx)
    ver, _ = table_for(m.kf_pl_ver_idx)
    return direct, par, ver, direct_slot


def local_bundle_adjustment(slam_map, kf: int, cfg: SystemConfig) -> None:
    """Gather the local window from the map, run the two-stage schedule,
    write back poses/points/lines/planes and erase outlier observations."""
    m = slam_map
    K = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    bf = cfg.camera.bf
    w = BAWeights.from_config(cfg.planes)

    local = [kf] + [int(c) for c in m.covisible_kfs(kf)[:MAX_LOCAL_KF - 1]]
    local = [k for k in local if m.kf_valid[k]]
    pt_ids = m.local_map_points(np.asarray(local), cap=MAX_LOCAL_PTS)
    if len(pt_ids) < 30 or len(local) < 2:
        return
    ln_ids = m.local_map_lines(np.asarray(local), cap=MAX_LOCAL_LNS)
    pl_rows = m.kf_pl_idx[np.asarray(local)]
    pl_ids = np.unique(pl_rows[pl_rows >= 0])
    pl_ids = pl_ids[m.pl_valid[pl_ids]][:MAX_LOCAL_PLS]

    # fixed KFs: observe local points but are not local (reference adds all
    # observers as fixed vertices, `src/Optimizer.cc:1894`)
    fixed = []
    for other in m.valid_kf_ids():
        if int(other) in local:
            continue
        o = m.kf_pt_idx[other]
        if np.isin(o[o >= 0], pt_ids).any():
            fixed.append(int(other))
        if len(fixed) >= MAX_FIXED_KF:
            break
    all_kfs = local + fixed
    Kt = MAX_LOCAL_KF + MAX_FIXED_KF
    n_real = len(all_kfs)
    fixed_mask = np.ones(Kt, np.float32)  # dummies fixed
    for i, k in enumerate(all_kfs):
        fixed_mask[i] = 1.0 if (k in fixed or k == 0) else 0.0
    if fixed_mask[:n_real].sum() == 0:
        fixed_mask[int(np.argmin(local))] = 1.0  # gauge

    pt_tab, obs_slot = build_point_tables(m, all_kfs, Kt, pt_ids, cfg)
    # landmark layout: [points | line endpoints] then plane blocks
    P_pts = MAX_LOCAL_PTS
    ln_tab, ep_slot = build_line_tables(m, all_kfs, Kt, ln_ids, P_pts, cfg)
    pl_tab, par_tab, ver_tab, pl_slot_tbl = build_plane_tables(
        m, all_kfs, Kt, pl_ids, cfg)

    P_total = P_pts + 2 * MAX_LOCAL_LNS
    lm = np.zeros((P_total, 3), np.float32)
    lm[:len(pt_ids)] = m.pt_xyz[pt_ids]
    lm[P_pts + 0:P_pts + 2 * len(ln_ids):2] = m.ln_sw[ln_ids]
    lm[P_pts + 1:P_pts + 2 * len(ln_ids):2] = m.ln_ew[ln_ids]
    plane_base = np.zeros((MAX_LOCAL_PLS, 4), np.float32)
    plane_base[:, 2] = 1.0  # harmless unit normal for padding slots
    plane_base[:len(pl_ids)] = m.pl_coeffs[pl_ids]

    poses0 = np.tile(np.eye(4, dtype=np.float32), (Kt, 1, 1))
    poses0[:n_real] = m.kf_pose[all_kfs].astype(np.float32)

    # stage 1: 5 iters with Huber
    poses1, lm1, planes1, chis = ba_solve(
        jnp.asarray(poses0), jnp.asarray(fixed_mask), jnp.asarray(lm),
        jnp.asarray(plane_base), pt_tab, ln_tab, pl_tab, par_tab, ver_tab,
        K, bf, w, n_iters=5)

    # outlier purge (reference two-stage schedule): drop observations over
    # the per-type gates, then 10 more iterations without them
    chi_pt = np.asarray(chis["pt"])
    gate = np.where(np.asarray(pt_tab.ur) >= 0, CHI2_STEREO, CHI2_MONO)
    pt_in = (chi_pt <= gate)
    chi_ln = np.asarray(chis["ln"]).reshape(Kt, -1, 2).sum(-1)
    ln_in = np.repeat(chi_ln <= 2 * CHI2_MONO, 2, axis=1)
    pl_in = np.asarray(chis["pl"]) <= float(np.asarray(w.plane_chi))
    par_in = np.asarray(chis["par"]) <= float(np.asarray(w.vp_chi))
    ver_in = np.asarray(chis["ver"]) <= float(np.asarray(w.vp_chi))

    def gated(t, keep):
        return t._replace(mask=t.mask * jnp.asarray(keep.astype(np.float32)))

    poses2, lm2, planes2, chis2 = ba_solve(
        poses1, jnp.asarray(fixed_mask), lm1, planes1,
        gated(pt_tab, pt_in), gated(ln_tab, ln_in), gated(pl_tab, pl_in),
        gated(par_tab, par_in), gated(ver_tab, ver_in),
        K, bf, w, n_iters=10)

    poses2 = np.asarray(poses2)
    lm2 = np.asarray(lm2)
    planes2 = np.asarray(planes2)

    # write back free poses + landmarks
    for i, k in enumerate(all_kfs):
        if fixed_mask[i] == 0:
            m.kf_pose[k] = poses2[i]
    m.pt_xyz[pt_ids] = lm2[:len(pt_ids)]
    if len(ln_ids):
        m.ln_sw[ln_ids] = lm2[P_pts + 0:P_pts + 2 * len(ln_ids):2]
        m.ln_ew[ln_ids] = lm2[P_pts + 1:P_pts + 2 * len(ln_ids):2]
    if len(pl_ids):
        m.pl_coeffs[pl_ids] = planes2[:len(pl_ids)]

    # erase outlier point observations from association tables (reference
    # erases chi2-gated observations after the second stage, `:2380-2430`)
    chi2b = np.asarray(chis2["pt"])
    bad = (chi2b > gate) & (np.asarray(pt_tab.mask) > 0)
    for i, k in enumerate(all_kfs[:n_real]):
        fbad = np.flatnonzero(bad[i])
        if len(fbad):
            pts_bad = m.kf_pt_idx[k, fbad]
            m.kf_pt_idx[k, fbad] = -1
            ok = pts_bad >= 0
            m.pt_nobs[pts_bad[ok]] -= 1


def _ba_iterate(kf_pose, kf_fixed_mask, pt_xyz, obs_pt_slot, obs_uv, obs_ur,
                obs_inv_s2, obs_mask, K, bf, n_iters=5, huber=True,
                damping=1e-4, pose_prior=0.0):
    """Compatibility wrapper over ba_core.ba_solve (points only).

    Kept for tests and callers of the round-1 core; pose_prior is accepted
    but ignored — gauge handling is exact in ba_core (fixed poses
    eliminated), the prior band-aid is gone."""
    Kt = kf_pose.shape[0]
    pt_tab = PointTables(slot=obs_pt_slot, uv=obs_uv, ur=obs_ur,
                         inv_s2=obs_inv_s2,
                         mask=obs_mask * (obs_pt_slot >= 0))
    poses, lm, _, chis = ba_solve(
        kf_pose, kf_fixed_mask, pt_xyz, jnp.zeros((0, 4), jnp.float32),
        pt_tab, ba_core.empty_line_tables(Kt), ba_core.empty_plane_tables(Kt),
        ba_core.empty_plane_tables(Kt), ba_core.empty_plane_tables(Kt),
        tuple(float(v) for v in K), float(bf),
        BAWeights.from_config(PlaneConfig()),
        n_iters=n_iters, huber=huber)
    return poses, lm, chis["pt"]
