"""Bisect the fused step: time cumulative prefixes of the pipeline."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.geometry import plane as plane_geo
from planarslam_tpu.geometry import se3
from planarslam_tpu.io import synthetic
from planarslam_tpu.ops import manhattan as manhattan_ops
from planarslam_tpu.ops import matching
from planarslam_tpu.slam.frame import extract_frame
from planarslam_tpu.slam.device_tracker import (
    WIN_PTS, WIN_LNS, build_window, make_last_state,
    _associate_planes_device)
from planarslam_tpu.slam.map import SlamMap
from planarslam_tpu.solvers import pose_opt

cfg = SystemConfig()
cam = cfg.camera
K = (cam.fx, cam.fy, cam.cx, cam.cy)
Kp = cfg.orb.max_keypoints
seq = synthetic.make_sequence(n_frames=2, width=cam.width, height=cam.height)
gray, depth = seq.render(0)
gray = jnp.asarray(gray, jnp.float32)
depth = jnp.asarray(depth, jnp.float32)
weights = pose_opt.PoseOptWeights.from_config(cfg.planes)

m = SlamMap(cfg)
m.kf_valid[0] = True
m.n_kf = 1
win, _, _ = build_window(m, np.asarray([0]), cfg)
state = make_last_state(gray, depth, jnp.eye(4), cfg)
jax.block_until_ready(state)


def tsum(x):
    return jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), x))


def make_stage(upto):
    @jax.jit
    def f(gray, depth, T_last, velocity, R_wm, manh_enabled, last, win):
        acc = jnp.float32(0)
        feats = extract_frame(gray, depth, cfg)
        if upto == "extract":
            return acc + tsum((feats.points.uv, feats.points.desc.astype(jnp.float32), feats.normals, feats.planes.coeffs, feats.lines.desc))
        T_pred = velocity @ T_last
        R_cm_pred = T_pred[:3, :3] @ R_wm
        manh = manhattan_ops.track_manhattan_frame(
            R_cm_pred, feats.normals, feats.normals_valid,
            cone_sin=cfg.manhattan.cone_sin_track,
            kernel=cfg.manhattan.mean_shift_kernel,
            min_support=cfg.manhattan.min_axis_support)
        use_manh = manh_enabled & manh.success
        R_manh = manh.R_cm @ R_wm.T
        T_init = jnp.where(use_manh, T_pred.at[:3, :3].set(R_manh), T_pred)
        if upto == "manhattan":
            return acc + tsum(T_init)
        proj = matching.search_by_projection(
            last.pt3d_w, last.feats.points.desc, last.valid3d, T_init,
            feats.points.uv, feats.points.desc, feats.points.level,
            feats.points.valid, feats.points.u_right,
            K=K, image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
            scale_factor=cfg.orb.scale_factor, radius=15.0,
            max_dist=cfg.matcher.th_high, level_window=cfg.orb.n_levels)
        bf_res = matching.match_descriptors(
            last.feats.points.desc, feats.points.desc, last.valid3d,
            feats.points.valid, max_dist=cfg.matcher.th_low, ratio=0.9)
        n_proj = jnp.sum(proj.idx >= 0)
        ff_idx = jnp.where(n_proj < 20, bf_res.idx, proj.idx)
        if upto == "ffmatch":
            return acc + tsum(ff_idx)
        inv_s2_feat = jnp.power(jnp.float32(cfg.orb.scale_factor),
                                -2.0 * feats.points.level.astype(jnp.float32))
        matched_ff = ff_idx >= 0
        fi = jnp.clip(ff_idx, 0, Kp - 1)
        obs1 = pose_opt.PointObs(
            xw=last.pt3d_w, uv=feats.points.uv[fi],
            u_right=jnp.where(matched_ff, feats.points.u_right[fi], -1.0),
            inv_sigma2=inv_s2_feat[fi], valid=matched_ff)
        res1 = jax.lax.cond(
            use_manh,
            lambda _: pose_opt.pose_optimize(T_init, K, cam.bf, points=obs1,
                                             weights=weights,
                                             rotation_fixed=True),
            lambda _: pose_opt.pose_optimize(T_init, K, cam.bf, points=obs1,
                                             weights=weights,
                                             rotation_fixed=False),
            None)
        T1 = jnp.where(res1.n_point_inliers >= cfg.tracking.min_matches_track,
                       res1.T_cw, T_init)
        if upto == "pose1":
            return acc + tsum(T1)
        win_res = matching.search_by_projection(
            win.pt_xyz, win.pt_desc, win.pt_valid, T1,
            feats.points.uv, feats.points.desc, feats.points.level,
            feats.points.valid, feats.points.u_right,
            K=K, image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
            scale_factor=cfg.orb.scale_factor, radius=4.0,
            max_dist=cfg.matcher.th_high, view_normals=win.pt_normal,
            dist_range=(win.pt_min_d, win.pt_max_d), level_window=1)
        if upto == "winmatch":
            return acc + tsum(win_res.idx)
        pl_direct, pl_par, pl_ver, pi_w = _associate_planes_device(
            feats, T1, win, cfg)
        if upto == "planes":
            return acc + tsum((pl_direct, pl_par, pl_ver, pi_w))
        # final pose opt (points only approximation for cost)
        feat_slot = jnp.full((Kp,), -1, jnp.int32)
        w_ids = jnp.arange(WIN_PTS, dtype=jnp.int32)
        tgt = jnp.clip(win_res.idx, 0, Kp - 1)
        feat_slot = feat_slot.at[tgt].max(jnp.where(win_res.idx >= 0, w_ids, -1))
        has_slot = feat_slot >= 0
        slot = jnp.clip(feat_slot, 0, WIN_PTS - 1)
        obs2 = pose_opt.PointObs(
            xw=win.pt_xyz[slot], uv=feats.points.uv,
            u_right=jnp.where(has_slot, feats.points.u_right, -1.0),
            inv_sigma2=inv_s2_feat, valid=has_slot)
        res2 = pose_opt.pose_optimize(T1, K, cam.bf, points=obs2,
                                      weights=weights, rotation_fixed=False)
        return acc + tsum(res2.T_cw)
    return f


stages = ["extract", "manhattan", "ffmatch", "pose1", "winmatch", "planes",
          "full"]
T = jnp.eye(4); V = jnp.eye(4); R = jnp.eye(3); en = jnp.asarray(True)
prev = 0.0
for s in stages:
    f = make_stage(s)
    out = f(gray, depth, T, V, R, en, state, win)
    np.asarray(out)  # force
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(gray, depth, T, V, R, en, state, win)
        np.asarray(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"prefix upto {s:10s}: {dt:8.1f} ms  (delta {dt - prev:+8.1f})")
    prev = dt
