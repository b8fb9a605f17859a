"""Global bundle adjustment.

Rebuild of `Optimizer::GlobalBundleAdjustemnt` (`src/Optimizer.cc:35`,
invoked from the loop-closing GBA thread `src/LoopClosing.cc:579/645`):
all keyframes + all landmarks, first keyframe fixed, followed by the
spanning-tree propagation of corrections to keyframes and landmarks that
were created during the (here: synchronous) optimization.

Reuses the dense-Schur batched GN core of local_ba over a capped window:
the window is all valid keyframes up to MAX_GBA_KF (beyond that, the most
recent + most connected ones; older poses follow via the spanning tree
exactly like the reference's propagation for KFs outside the optimized
set, `src/LoopClosing.cc:656+`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.solvers.local_ba import (CHI2_MONO, CHI2_STEREO,
                                             _ba_iterate)

MAX_GBA_KF = 48
MAX_GBA_PTS = 8192


def global_bundle_adjustment(slam_map, cfg: SystemConfig,
                             n_iters: int = 15) -> None:
    m = slam_map
    K = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
    bf = cfg.camera.bf
    ids = [int(k) for k in m.valid_kf_ids()]
    if len(ids) < 3:
        return
    if len(ids) > MAX_GBA_KF:
        # keep KF0 + the most recent window
        ids = [ids[0]] + ids[-(MAX_GBA_KF - 1):]
    pt_ids = m.local_map_points(np.asarray(ids), cap=MAX_GBA_PTS)
    if len(pt_ids) < 50:
        return
    pt_slot = {int(p): i for i, p in enumerate(pt_ids)}

    # fixed KF dimension (pad with fixed dummies -> single compilation)
    Kt = MAX_GBA_KF
    n_real = len(ids)
    fixed_mask = np.ones(Kt, np.float32)
    fixed_mask[:n_real] = 0.0
    fixed_mask[0] = 1.0  # gauge: first keyframe fixed (reference GBA)

    F = cfg.orb.max_keypoints
    obs_slot = np.full((Kt, F), -1, np.int32)
    obs_uv = np.zeros((Kt, F, 2), np.float32)
    obs_ur = np.full((Kt, F), -1.0, np.float32)
    obs_is2 = np.ones((Kt, F), np.float32)
    s2 = (1.0 / cfg.orb.scale_factor ** (
        2 * np.arange(cfg.orb.n_levels))).astype(np.float32)
    for i, k in enumerate(ids):
        row = m.kf_pt_idx[k]
        sel = np.flatnonzero(row >= 0)
        for f in sel:
            p = int(row[f])
            if p in pt_slot:
                obs_slot[i, f] = pt_slot[p]
                obs_uv[i, f] = m.kf_uv[k, f]
                obs_ur[i, f] = m.kf_ur[k, f]
                obs_is2[i, f] = s2[m.kf_level[k, f]]
    obs_mask = (obs_slot >= 0).astype(np.float32)

    P_pad = MAX_GBA_PTS
    pts_p = np.zeros((P_pad, 3), np.float32)
    pts_p[:len(pt_ids)] = m.pt_xyz[pt_ids]
    poses_before = np.tile(np.eye(4, dtype=np.float32), (Kt, 1, 1))
    poses_before[:n_real] = m.kf_pose[ids].astype(np.float32)

    def host_chi(poses, pts):
        """Masked median reprojection chi2 (host, numpy) — GBA quality gate."""
        fx, fy, cx, cy = K
        vals = []
        for i in range(n_real):
            sel = obs_slot[i] >= 0
            if not sel.any():
                continue
            p = pts[obs_slot[i][sel]]
            pc = p @ poses[i][:3, :3].T + poses[i][:3, 3]
            z = np.maximum(pc[:, 2], 1e-6)
            u = fx * pc[:, 0] / z + cx
            v = fy * pc[:, 1] / z + cy
            e2 = ((u - obs_uv[i][sel, 0]) ** 2
                  + (v - obs_uv[i][sel, 1]) ** 2) * obs_is2[i][sel]
            vals.append(np.minimum(e2, 20.0))  # robust cap
        return float(np.median(np.concatenate(vals))) if vals else 0.0

    pts_before_arr = pts_p.copy()
    chi_before = host_chi(poses_before, pts_before_arr)

    poses_out, pts_out, chi2 = _ba_iterate(
        jnp.asarray(poses_before), jnp.asarray(fixed_mask),
        jnp.asarray(pts_p), jnp.asarray(obs_slot), jnp.asarray(obs_uv),
        jnp.asarray(obs_ur), jnp.asarray(obs_is2), jnp.asarray(obs_mask),
        K, bf, n_iters=n_iters)
    poses_out = np.asarray(poses_out)
    pts_out = np.asarray(pts_out)

    chi_after = host_chi(poses_out, pts_out)
    if chi_after > 0.95 * chi_before:
        # no meaningful improvement: the map was already self-consistent and
        # any pose motion is gauge/nullspace wander — keep the input state
        return

    # spanning-tree propagation for keyframes outside the window
    # (x_new = T_new_anchor^-1 T_old_anchor x_old chains through parents)
    optimized = {k: i for i, k in enumerate(ids)}
    for k in m.valid_kf_ids():
        k = int(k)
        if k in optimized:
            continue
        p = int(m.kf_parent[k])
        hops = 0
        while p >= 0 and p not in optimized and hops < 64:
            p = int(m.kf_parent[p])
            hops += 1
        if p in optimized:
            # keep the child rigid relative to its parent:
            # T_k_new = (T_k T_p^-1) T_p_new
            m.kf_pose[k] = (m.kf_pose[k] @ np.linalg.inv(m.kf_pose[p])
                            @ poses_out[optimized[p]]).astype(np.float32)
    for i, k in enumerate(ids):
        m.kf_pose[k] = poses_out[i]
    m.pt_xyz[pt_ids] = pts_out[:len(pt_ids)]
