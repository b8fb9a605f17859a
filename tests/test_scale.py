"""Correction machinery at scale (round-2 VERDICT weak #5 / next-step #6).

220 keyframes on a loop trajectory with odometric drift, KF-culling churn,
TWO loop closures, then global BA with its 128-KF window + spanning-tree /
re-anchoring propagation for everything outside it. Asserts the essential
graph and GBA stay finite AND reduce trajectory error at a map size the
round-2 build never exercised (tests ran 16-32 KFs; capacity is 512).
Matches `src/Optimizer.cc:2680` (essential graph at scale, minFeat=100) and
`src/LoopClosing.cc:645+` (GBA + out-of-window propagation).
"""

import dataclasses
import time

import numpy as np
import jax.numpy as jnp
import pytest

from planarslam_tpu.config import MapConfig, SystemConfig
from planarslam_tpu.geometry import se3
from planarslam_tpu.slam.map import SlamMap


def _build_scale_map(cfg, n_kf=220, n_pts=4000, seed=3):
    """Synthesize a loop-trajectory map: GT observations, drifted poses,
    landmarks unprojected through the drifted first observer (exactly what
    incremental mapping under drift produces)."""
    rng = np.random.default_rng(seed)
    cam = cfg.camera
    m = SlamMap(cfg)

    # camera ring (radius 2) looking outward at a landmark cylinder (radius 5)
    gt_wc = []
    for k in range(n_kf):
        a = 2 * np.pi * k / n_kf
        fwd = np.array([np.cos(a), 0.0, np.sin(a)])  # outward
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2] = right, up, fwd
        T[:3, 3] = 2.0 * np.array([np.cos(a), 0.0, np.sin(a)])
        gt_wc.append(T.astype(np.float32))
    gt_cw = [np.linalg.inv(T).astype(np.float32) for T in gt_wc]

    ang = rng.uniform(0, 2 * np.pi, n_pts)
    pts_w = np.stack([5.0 * np.cos(ang), rng.uniform(-1.2, 1.2, n_pts),
                      5.0 * np.sin(ang)], -1).astype(np.float32)

    # odometric drift: smooth random walk, zero at KF0
    drift = [np.eye(4, dtype=np.float32)]
    xi_rate = np.array([1e-4, 2e-4, 1e-4, 8e-4, 4e-4, 8e-4], np.float32)
    for k in range(1, n_kf):
        xi = (xi_rate * (1.0 + 0.3 * rng.standard_normal(6))).astype(
            np.float32)
        step = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        drift.append((drift[-1] @ step).astype(np.float32))

    Kp = cfg.orb.max_keypoints
    first_obs: dict[int, int] = {}
    for k in range(n_kf):
        kf = m.alloc_keyframe()
        m.kf_valid[kf] = True
        m.kf_frame_id[kf] = k
        m.kf_pose[kf] = (gt_cw[k] @ drift[k]).astype(np.float32)
        pc = pts_w @ gt_cw[k][:3, :3].T + gt_cw[k][:3, 3]
        u = cam.fx * pc[:, 0] / np.maximum(pc[:, 2], 1e-6) + cam.cx
        v = cam.fy * pc[:, 1] / np.maximum(pc[:, 2], 1e-6) + cam.cy
        vis = ((pc[:, 2] > 0.5) & (pc[:, 2] < 9.0) & (u >= 1)
               & (u < cam.width - 1) & (v >= 1) & (v < cam.height - 1))
        sel = np.flatnonzero(vis)[:Kp]
        m.kf_uv[kf, :len(sel)] = np.stack([u[sel], v[sel]], -1)
        m.kf_depth[kf, :len(sel)] = pc[sel, 2]
        m.kf_ur[kf, :len(sel)] = u[sel] - cam.bf / pc[sel, 2]
        m.kf_feat_valid[kf, :len(sel)] = True
        m.kf_pt_idx[kf, :len(sel)] = sel
        for p in sel:
            if int(p) not in first_obs:
                first_obs[int(p)] = k
        m.update_covisibility(kf)

    obs_counts = np.zeros(n_pts, np.int64)
    tbl = m.kf_pt_idx[:n_kf]
    ids, cnt = np.unique(tbl[tbl >= 0], return_counts=True)
    obs_counts[ids] = cnt
    m.pt_valid[:n_pts] = obs_counts >= 2
    m.pt_nobs[:n_pts] = obs_counts
    for p, k in first_obs.items():
        m.pt_first_kf[p] = k
        # unproject through the DRIFTED first-observer pose
        T_wc = np.linalg.inv(m.kf_pose[k])
        f = int(np.flatnonzero(m.kf_pt_idx[k] == p)[0])
        z = m.kf_depth[k, f]
        x = (m.kf_uv[k, f, 0] - cam.cx) / cam.fx * z
        y = (m.kf_uv[k, f, 1] - cam.cy) / cam.fy * z
        m.pt_xyz[p] = (T_wc[:3, :3] @ np.array([x, y, z]) + T_wc[:3, 3])
    return m, gt_cw, pts_w


def _kf_ate(m, gt_cw):
    ids = m.valid_kf_ids()
    err = [np.linalg.norm(np.linalg.inv(m.kf_pose[k])[:3, 3]
                          - np.linalg.inv(gt_cw[int(m.kf_frame_id[k])])[:3, 3])
           for k in ids]
    return float(np.sqrt(np.mean(np.square(err))))


@pytest.mark.slow
def test_correction_machinery_at_scale():
    cfg = SystemConfig.tiny()
    cfg = cfg.replace(map=dataclasses.replace(
        cfg.map, max_keyframes=256, max_points=8192))
    m, gt_cw, pts_w = _build_scale_map(cfg)
    n_kf = 220

    # keyframe-culling churn: 20 mid-loop KFs culled with stored Tcp chains
    rng = np.random.default_rng(11)
    for cand in sorted(rng.choice(np.arange(40, 180), 20, replace=False)):
        cand = int(cand)
        row = m.kf_pt_idx[cand]
        own = row[row >= 0]
        m.cull_keyframe(cand)
        m.pt_nobs[own] -= 1
        m.kf_pt_idx[cand] = -1

    ate_drift = _kf_ate(m, gt_cw)
    assert ate_drift > 0.05, f"setup: drift too small ({ate_drift})"

    def rel_gt(a, b):
        return (gt_cw[a] @ np.linalg.inv(gt_cw[b])).astype(np.float32)

    from planarslam_tpu.solvers.pose_graph import optimize_pose_graph

    # two loop closures, the second relying on the persisted first edge
    t0 = time.perf_counter()
    for cur, old in ((205, 2), (219, 0)):
        m.add_loop_edge(cur, old, rel_gt(cur, old))
        T_corr = (rel_gt(cur, old) @ m.kf_pose[old]).astype(np.float32)
        new_poses = optimize_pose_graph(m, kf_corrected=cur,
                                        T_corrected=T_corr, loop_kf=old,
                                        cfg=cfg)
        ids = m.valid_kf_ids()
        # re-anchor landmarks to their (resolved) first observer, as
        # LoopClosing._correct does
        before = m.kf_pose.copy()
        m.kf_pose[ids] = new_poses[ids]
        pt_ids = np.flatnonzero(m.pt_valid)
        anchors = np.asarray([m.resolve_kf(int(max(k, 0)))[0]
                              for k in m.pt_first_kf[pt_ids]])
        corr = np.einsum("nij,njk->nik",
                         np.linalg.inv(m.kf_pose[anchors]), before[anchors])
        h = np.concatenate([m.pt_xyz[pt_ids],
                            np.ones((len(pt_ids), 1), np.float32)], axis=1)
        m.pt_xyz[pt_ids] = np.einsum("nij,nj->ni", corr, h)[:, :3]
    t_pg = time.perf_counter() - t0

    assert np.isfinite(m.kf_pose[:n_kf]).all()
    ate_pg = _kf_ate(m, gt_cw)
    assert ate_pg < 0.5 * ate_drift, \
        f"pose graph did not reduce ATE: {ate_drift:.4f} -> {ate_pg:.4f}"

    # global BA: 128-KF window + spanning-tree propagation outside it
    from planarslam_tpu.solvers.global_ba import global_bundle_adjustment

    t0 = time.perf_counter()
    global_bundle_adjustment(m, cfg)
    t_gba = time.perf_counter() - t0
    assert np.isfinite(m.kf_pose[:n_kf]).all()
    assert np.isfinite(m.pt_xyz[m.pt_valid]).all()
    ate_gba = _kf_ate(m, gt_cw)
    assert ate_gba < max(1.05 * ate_pg, 0.02), \
        f"GBA made it worse: {ate_pg:.4f} -> {ate_gba:.4f}"
    # the first loop's constraint still holds after the second correction
    rel_after = m.kf_pose[205] @ np.linalg.inv(m.kf_pose[2])
    err_xi = np.asarray(se3.se3_log(jnp.asarray(
        (np.linalg.inv(rel_gt(205, 2)) @ rel_after).astype(np.float32))))
    assert np.linalg.norm(err_xi) < 0.05, err_xi
    print(f"\nscale test: ate {ate_drift:.4f} -> pg {ate_pg:.4f} -> "
          f"gba {ate_gba:.4f} m; pose-graph {t_pg:.1f}s, gba {t_gba:.1f}s "
          f"({len(m.valid_kf_ids())} KFs)")
    # wall-time sanity: a 200-KF correction must stay interactive-scale
    assert t_pg < 300 and t_gba < 300


def _retrieval_discrimination(n_pos: int, max_keyframes: int,
                              min_top_frac: float = 0.7):
    """Two laps of an n_pos-position ring with ALIASED decor: lap-2
    keyframes observe drift-unassociated COPIES of lap-1's landmarks (the
    genuine loop-closure regime: same place, no shared map entries yet),
    and the whole scene draws from only 48 distinct descriptors —
    repetitive texture that flattens LSH word histograms. Asserts the true
    revisit ranks first for most queries and the group top-up fallback
    (`slam/retrieval.py`) does not flood the verifier with far-away
    candidates (`src/KeyFrameDatabase.cc:147-176` discrimination role)."""
    from planarslam_tpu.slam.retrieval import KeyFrameDatabase

    cfg = SystemConfig.tiny()
    cfg = cfg.replace(map=dataclasses.replace(
        cfg.map, max_keyframes=max_keyframes, max_points=16384))
    rng = np.random.default_rng(17)
    m = SlamMap(cfg)
    db = KeyFrameDatabase(cfg)

    n_lm = 3000
    Kp = cfg.orb.max_keypoints

    # landmark bearings around the ring; lap 2 re-creates every landmark
    # under new ids (drift-unassociated revisit)
    lm_ang = rng.uniform(0, 2 * np.pi, n_lm)
    # aliased decor: only 48 distinct descriptors for 3000 landmarks
    pool = rng.integers(0, 2 ** 32, (48, 8), dtype=np.uint32)
    lm_desc = pool[rng.integers(0, len(pool), n_lm)]

    def ang_dist(a, b):
        d = np.abs(a - b) % (2 * np.pi)
        return np.minimum(d, 2 * np.pi - d)

    fov = 0.5  # radians of ring visible per keyframe
    for k in range(2 * n_pos):
        pos_ang = 2 * np.pi * (k % n_pos) / n_pos
        lap = k // n_pos
        kf = m.alloc_keyframe()
        m.kf_valid[kf] = True
        m.kf_frame_id[kf] = k
        vis = np.flatnonzero(ang_dist(lm_ang, pos_ang) < fov)[:Kp]
        n = len(vis)
        # per-observation sensor noise: ~6 random bit flips per descriptor
        flips = (np.uint32(1) << rng.integers(0, 32, (n, 8), dtype=np.uint32))
        keep = rng.random((n, 8)) < 0.75
        noisy = lm_desc[vis] ^ np.where(keep, np.uint32(0), flips)
        m.kf_desc[kf, :n] = noisy
        m.kf_feat_valid[kf, :n] = True
        # lap-2 landmark ids offset by n_lm -> zero shared observations
        m.kf_pt_idx[kf, :n] = vis + lap * n_lm
        m.update_covisibility(kf)
        db.add(m, kf)

    hits, tops, flood = 0, 0, 0
    queries = list(range(n_pos + 10, 2 * n_pos, 7))
    for q in queries:
        true_pos = q - n_pos
        cands = db.loop_candidates(m, q, max_out=3)
        assert len(cands) <= 3  # bounded verifier load
        near = [c for c in cands if c < n_pos
                and min(abs(c - true_pos), n_pos - abs(c - true_pos)) <= 6]
        far = [c for c in cands if c < n_pos
               and min(abs(c - true_pos), n_pos - abs(c - true_pos)) > 12]
        hits += bool(near)
        flood += len(far)
        if cands and cands[0] in near:
            tops += 1
    n_q = len(queries)
    assert hits >= 0.9 * n_q, f"recall {hits}/{n_q}"
    assert tops >= min_top_frac * n_q, \
        f"true revisit ranked first only {tops}/{n_q}"
    # precision: far-away candidates (aliased decor) must stay rare
    assert flood <= 0.5 * n_q, f"{flood} far candidates over {n_q} queries"


@pytest.mark.slow
def test_retrieval_discrimination_at_220_kfs():
    """220 aliased-decor KFs (round-3 VERDICT weak #5 / next-step #8)."""
    _retrieval_discrimination(n_pos=110, max_keyframes=256)


@pytest.mark.slow
def test_retrieval_discrimination_at_full_capacity():
    """360 aliased-decor KFs — 70% of the 512-slot capacity with DOUBLE the
    ring density of the 220-KF test (round-4 VERDICT next-step #8: the
    12-bit/4096-word LSH vocabulary had never been exercised near the cap
    where word histograms of distinct places collide most)."""
    _retrieval_discrimination(n_pos=180, max_keyframes=512)
