"""Local mapping — synchronous back-end stage (reference `src/LocalMapping.cc`).

The reference runs this as a polling thread with intra-stage thread pools
(3x culling, 2x creation, `src/LocalMapping.cc:43-56`); here it is a
deterministic stage invoked per inserted keyframe, with the per-landmark
loops vectorized over the map arrays.

Stages mirrored:
  - MapPointCulling (`:175`): found/visible ratio < 0.25 or too few
    observations shortly after creation;
  - MapLineCulling (`:204`): same policy for lines;
  - MapPlaneCulling (`:233`): observation-starved planes erased; coplanar
    map planes merged (O(P^2) pairwise, tiny);
  - KeyFrameCulling (`:1226`): redundant KFs (>=90% of points seen by >=3
    other KFs) erased, skipped when the KF carries a new plane;
  - Local bundle adjustment: the reference ships with the call COMMENTED OUT
    (`src/LocalMapping.cc:67-69`) — we keep it off by default for ship-state
    parity and expose `enable_local_ba` (SURVEY.md §7 semantics note).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.slam.map import SlamMap


class LocalMapping:
    def __init__(self, cfg: SystemConfig, slam_map: SlamMap,
                 enable_local_ba: bool = False):
        self.cfg = cfg
        self.map = slam_map
        self.enable_local_ba = enable_local_ba
        # recently created landmarks awaiting the culling probation window
        self._recent_pts: dict[int, int] = {}  # point id -> created-at KF
        self._recent_lns: dict[int, int] = {}

    def process_keyframe(self, kf: int) -> None:
        m = self.map
        created = np.flatnonzero((m.pt_first_kf == kf) & m.pt_valid)
        for p in created:
            self._recent_pts[int(p)] = kf
        created_l = np.flatnonzero((m.ln_first_kf == kf) & m.ln_valid)
        for l in created_l:
            self._recent_lns[int(l)] = kf

        self._cull_points(kf)
        self._cull_lines(kf)
        self._cull_planes(kf)
        self._create_points_by_triangulation(kf)
        self._fuse_neighbors(kf)
        self._cull_keyframes(kf)
        if self.enable_local_ba and m.n_kf >= 3:
            from planarslam_tpu.solvers.local_ba import local_bundle_adjustment

            local_bundle_adjustment(m, kf, self.cfg)

    # ----------------------------------------------------- point creation
    def _create_points_by_triangulation(self, kf: int) -> None:
        """Reference `CreateNewMapPoints` (`src/LocalMapping.cc:309`):
        descriptor-match still-unassociated features of the new KF against
        covisible KFs and triangulate. In the RGB-D pipeline depth-based
        creation at KF insertion covers close points; triangulation adds
        far points (depth <= 0)."""
        import jax.numpy as jnp

        from planarslam_tpu.ops import matching
        from planarslam_tpu.solvers.triangulation import (
            reprojection_checks, triangulate)

        m = self.map
        cfg = self.cfg
        cam = cfg.camera
        K = (cam.fx, cam.fy, cam.cx, cam.cy)
        Kmat = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                        np.float32)
        free = (m.kf_pt_idx[kf] < 0) & m.kf_feat_valid[kf] \
            & (m.kf_depth[kf] <= 0)
        if free.sum() < 10:
            return
        s2 = (1.0 / cfg.orb.scale_factor ** (
            2 * np.arange(cfg.orb.n_levels))).astype(np.float32)
        T1 = m.kf_pose[kf]
        baseline_min = 0.02
        for nb in m.covisible_kfs(kf)[:5]:
            nb = int(nb)
            T2 = m.kf_pose[nb]
            # enough parallax between the two cameras?
            c1 = -T1[:3, :3].T @ T1[:3, 3]
            c2 = -T2[:3, :3].T @ T2[:3, 3]
            if np.linalg.norm(c1 - c2) < baseline_min:
                continue
            free_nb = (m.kf_pt_idx[nb] < 0) & m.kf_feat_valid[nb]
            res = matching.match_descriptors(
                jnp.asarray(m.kf_desc[kf]), jnp.asarray(m.kf_desc[nb]),
                jnp.asarray(free), jnp.asarray(free_nb),
                max_dist=cfg.matcher.th_low, ratio=0.8)
            idx = np.asarray(res.idx)
            ok = idx >= 0
            if ok.sum() < 5:
                continue
            f1 = np.flatnonzero(ok)
            f2 = idx[f1]
            # static-shape padding -> one compilation of the triangulator
            CAP = 256
            f1 = f1[:CAP]
            f2 = f2[:CAP]
            n_c = len(f1)
            uv1 = np.zeros((CAP, 2), np.float32)
            uv2 = np.zeros((CAP, 2), np.float32)
            is2a = np.ones(CAP, np.float32)
            is2b = np.ones(CAP, np.float32)
            uv1[:n_c] = m.kf_uv[kf][f1]
            uv2[:n_c] = m.kf_uv[nb][f2]
            is2a[:n_c] = s2[m.kf_level[kf][f1]]
            is2b[:n_c] = s2[m.kf_level[nb][f2]]
            P1 = Kmat @ T1[:3]
            P2 = Kmat @ T2[:3]
            X, fin = triangulate(jnp.asarray(P1), jnp.asarray(P2),
                                 jnp.asarray(uv1), jnp.asarray(uv2))
            good = reprojection_checks(
                X, jnp.asarray(T1), jnp.asarray(T2),
                jnp.asarray(uv1), jnp.asarray(uv2),
                K, jnp.asarray(is2a), jnp.asarray(is2b))
            good = np.asarray(good & fin)
            good[n_c:] = False
            sel = np.flatnonzero(good)
            if len(sel) == 0:
                continue
            X = np.asarray(X)[sel]
            try:
                ids = m.alloc_points(len(sel))
            except RuntimeError:
                return
            m.pt_xyz[ids] = X
            m.pt_desc[ids] = m.kf_desc[kf][f1[sel]]
            cam_c = c1
            vec = X - cam_c
            dist = np.linalg.norm(vec, axis=1)
            m.pt_normal[ids] = vec / np.maximum(dist[:, None], 1e-9)
            lvl = m.kf_level[kf][f1[sel]]
            sf = cfg.orb.scale_factor
            m.pt_max_dist[ids] = dist * (sf ** lvl) * 1.2
            m.pt_min_dist[ids] = m.pt_max_dist[ids] / (sf ** cfg.orb.n_levels) * 0.8
            m.pt_valid[ids] = True
            m.pt_nobs[ids] = 2
            m.pt_found[ids] = 1
            m.pt_visible[ids] = 1
            m.pt_first_kf[ids] = kf
            m.kf_pt_idx[kf, f1[sel]] = ids
            m.kf_pt_idx[nb, f2[sel]] = ids
            free[f1[sel]] = False
            for p in ids:
                self._recent_pts[int(p)] = kf

    # ---------------------------------------------------------------- fuse
    def _fuse_neighbors(self, kf: int) -> None:
        """Reference `SearchInNeighbors` (`src/LocalMapping.cc:1039`):
        project the new KF's landmarks into covisible KFs; merge duplicate
        landmarks (keep the better-observed one) and add missed
        associations."""
        import jax.numpy as jnp

        from planarslam_tpu.ops import matching

        m = self.map
        cfg = self.cfg
        cam = cfg.camera
        own = m.kf_pt_idx[kf]
        own_ids = np.unique(own[own >= 0])
        own_ids = own_ids[m.pt_valid[own_ids]]
        if len(own_ids) == 0:
            return
        cap = cfg.orb.max_keypoints
        pad = np.zeros(cap, np.int64)
        n_own = min(len(own_ids), cap)
        pad[:n_own] = own_ids[:n_own]
        valid_own = np.zeros(cap, bool)
        valid_own[:n_own] = True
        for nb in m.covisible_kfs(kf)[:5]:
            nb = int(nb)
            res = matching.search_by_projection(
                jnp.asarray(m.pt_xyz[pad]), jnp.asarray(m.pt_desc[pad]),
                jnp.asarray(valid_own), jnp.asarray(m.kf_pose[nb]),
                jnp.asarray(m.kf_uv[nb]), jnp.asarray(m.kf_desc[nb]),
                jnp.asarray(m.kf_level[nb]),
                jnp.asarray(m.kf_feat_valid[nb]), jnp.asarray(m.kf_ur[nb]),
                K=(cam.fx, cam.fy, cam.cx, cam.cy),
                image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
                scale_factor=cfg.orb.scale_factor, radius=3.0,
                max_dist=cfg.matcher.th_low, level_window=1)
            idx = np.asarray(res.idx)
            for i in np.flatnonzero(idx >= 0):
                p = int(pad[i])
                f = int(idx[i])
                q = int(m.kf_pt_idx[nb, f])
                if q == p:
                    continue
                if q >= 0 and m.pt_valid[q]:
                    # duplicate: keep the better-observed landmark
                    keep, drop = (p, q) if m.pt_nobs[p] >= m.pt_nobs[q] \
                        else (q, p)
                    m.replace_point(drop, keep)
                else:
                    m.kf_pt_idx[nb, f] = p
                    m.pt_nobs[p] += 1

    # ----------------------------------------------------------------- points
    def _cull_points(self, kf: int) -> None:
        """Reference `MapPointCulling` (`src/LocalMapping.cc:175`)."""
        m = self.map
        drop = []
        erase = []
        for p, born in list(self._recent_pts.items()):
            if not m.pt_valid[p]:
                drop.append(p)
                continue
            age = kf - born
            ratio = m.pt_found[p] / max(m.pt_visible[p], 1)
            if m.pt_visible[p] >= 3 and ratio < 0.25:
                erase.append(p)
                drop.append(p)
            elif age >= 2 and m.pt_nobs[p] <= 2:
                erase.append(p)
                drop.append(p)
            elif age >= 3:
                drop.append(p)  # graduated
        if erase:
            m.erase_point(np.asarray(erase))
        for p in drop:
            self._recent_pts.pop(p, None)

    def _cull_lines(self, kf: int) -> None:
        m = self.map
        drop = []
        erase = []
        for l, born in list(self._recent_lns.items()):
            if not m.ln_valid[l]:
                drop.append(l)
                continue
            age = kf - born
            if age >= 2 and m.ln_nobs[l] <= 1:
                erase.append(l)
                drop.append(l)
            elif age >= 3:
                drop.append(l)
        if erase:
            m.erase_line(np.asarray(erase))
        for l in drop:
            self._recent_lns.pop(l, None)

    # ----------------------------------------------------------------- planes
    def _cull_planes(self, kf: int) -> None:
        """Observation culling + O(P^2) coplanar merge
        (`src/LocalMapping.cc:233-307`)."""
        m = self.map
        cfg = self.cfg.planes
        ids = np.flatnonzero(m.pl_valid)
        # merge coplanar map planes: keep the earlier (more observed) one
        for a_i in range(len(ids)):
            for b_i in range(a_i + 1, len(ids)):
                a, b = int(ids[a_i]), int(ids[b_i])
                if not (m.pl_valid[a] and m.pl_valid[b]):
                    continue
                na = m.pl_coeffs[a, :3] / max(np.linalg.norm(m.pl_coeffs[a, :3]), 1e-9)
                nb = m.pl_coeffs[b, :3] / max(np.linalg.norm(m.pl_coeffs[b, :3]), 1e-9)
                if abs(float(na @ nb)) < cfg.assoc_angle:
                    continue
                d = m.plane_min_dist_to_cloud(m.pl_coeffs[a], b)
                if d < cfg.assoc_dist:
                    self._merge_planes(a, b)

    def _merge_planes(self, keep: int, drop: int) -> None:
        """Replace `drop` with `keep` everywhere (MapPlane::Replace semantics
        propagating direct/parallel/vertical observation maps,
        `include/MapPlane.h:32-34`)."""
        m = self.map
        n = int(m.pl_cloud_n[drop])
        if n > 0:
            m.add_plane_cloud(keep, m.pl_cloud[drop, :n])
        for table in (m.kf_pl_idx, m.kf_pl_par_idx, m.kf_pl_ver_idx):
            table[table == drop] = keep
        m.pl_nobs[keep] += m.pl_nobs[drop]
        m.pl_valid[drop] = False

    # -------------------------------------------------------------- keyframes
    def _cull_keyframes(self, kf: int) -> None:
        """Reference `KeyFrameCulling` (`src/LocalMapping.cc:1226`): a local
        KF is redundant if >=90% of its points are seen by >=3 other KFs.
        Skipped for KFs that introduced a new plane (`:1226-1231`)."""
        m = self.map
        for cand in m.covisible_kfs(kf):
            cand = int(cand)
            if cand == 0 or not m.kf_valid[cand]:
                continue  # never cull the origin KF
            if (m.pl_first_kf[m.pl_valid] == cand).any():
                continue
            own = m.kf_pt_idx[cand]
            own = own[(own >= 0)]
            own = own[m.pt_valid[own]]
            if len(own) < 20:
                continue
            redundant = (m.pt_nobs[own] >= 4).mean()
            if redundant > 0.9:
                m.kf_valid[cand] = False
                m.pt_nobs[own] -= 1
                # detach observations
                m.kf_pt_idx[cand] = -1
