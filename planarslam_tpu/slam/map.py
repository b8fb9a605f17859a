"""The SLAM map as fixed-capacity struct-of-arrays state.

Replaces the reference's pointer-web data model — Map / KeyFrame / MapPoint /
MapLine / MapPlane objects with observation dictionaries and mutexes
(`src/Map.cc`, `src/KeyFrame.cc`, `src/MapPoint.cc`, `src/MapLine.cpp`,
`src/MapPlane.cc`) — with flat arrays + int32 index tables + validity masks
(SURVEY.md §7 design stance). Observations are stored the way the reference
stores them per KeyFrame (mvpMapPoints: feature slot -> landmark id), i.e.
`kf_pt_idx[kf, feature] = point_id or -1`, which is exactly what batched
local/global BA needs.

Single-controller: all mutation happens in the host step loop — the
reference's lock hierarchy (Map::mMutexMapUpdate and friends) has no
equivalent because there is nothing to race.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from planarslam_tpu.config import SystemConfig

LOOP_EDGE_CAP = 64  # persisted loop constraints (KeyFrame::AddLoopEdge role)


class SlamMap:
    """Host-side global map; device kernels consume gathered windows of it."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        m = cfg.map
        kp = cfg.orb.max_keypoints
        kl = cfg.lines.max_lines
        pp = cfg.planes.max_planes
        ld = cfg.lines.desc_dim
        self.n_kf_slots = m.max_keyframes

        # --- points (MapPoint fields, `include/MapPoint.h`) ------------------
        self.pt_xyz = np.zeros((m.max_points, 3), np.float32)
        self.pt_desc = np.zeros((m.max_points, 8), np.uint32)
        self.pt_normal = np.zeros((m.max_points, 3), np.float32)
        self.pt_min_dist = np.zeros(m.max_points, np.float32)
        self.pt_max_dist = np.zeros(m.max_points, np.float32)
        self.pt_valid = np.zeros(m.max_points, bool)
        self.pt_nobs = np.zeros(m.max_points, np.int32)
        self.pt_visible = np.zeros(m.max_points, np.int32)
        self.pt_found = np.zeros(m.max_points, np.int32)
        self.pt_first_kf = np.full(m.max_points, -1, np.int32)
        self.pt_on_plane = np.zeros(m.max_points, bool)  # SetAssociatedWithPlaneFlag
        # generation stamp per slot: incremented on erase, so holders of a
        # carried id can detect that the slot was recycled for a different
        # landmark (pt_valid alone cannot — alloc_points revalidates slots)
        self.pt_gen = np.zeros(m.max_points, np.int32)

        # --- lines (MapLine fields, `include/MapLine.h:24`) ------------------
        self.ln_sw = np.zeros((m.max_lines, 3), np.float32)
        self.ln_ew = np.zeros((m.max_lines, 3), np.float32)
        self.ln_desc = np.zeros((m.max_lines, ld), np.float32)
        self.ln_valid = np.zeros(m.max_lines, bool)
        self.ln_nobs = np.zeros(m.max_lines, np.int32)
        self.ln_first_kf = np.full(m.max_lines, -1, np.int32)
        # found/visible stats for culling (`MapLine::IncreaseFound/Visible`,
        # `include/MapLine.h:96-104`) + mean viewing direction
        self.ln_found = np.zeros(m.max_lines, np.int32)
        self.ln_visible = np.zeros(m.max_lines, np.int32)
        self.ln_view_dir = np.zeros((m.max_lines, 3), np.float32)
        # erase+recycle generation stamps (same role as pt_gen): holders of
        # a line id captured in a device window can detect the slot was
        # recycled for a different landmark while the window was in flight
        self.ln_gen = np.zeros(m.max_lines, np.int32)

        # --- planes (MapPlane fields, `include/MapPlane.h:23`) ---------------
        self.pl_coeffs = np.zeros((m.max_planes, 4), np.float32)
        self.pl_valid = np.zeros(m.max_planes, bool)
        self.pl_nobs = np.zeros(m.max_planes, np.int32)
        self.pl_first_kf = np.full(m.max_planes, -1, np.int32)
        self.pl_cloud = np.zeros((m.max_planes, m.plane_cloud_capacity, 3),
                                 np.float32)
        self.pl_cloud_n = np.zeros(m.max_planes, np.int32)

        # --- keyframes (KeyFrame fields, `include/KeyFrame.h:53-304`) --------
        self.kf_pose = np.tile(np.eye(4, dtype=np.float32),
                               (m.max_keyframes, 1, 1))  # T_cw
        self.kf_valid = np.zeros(m.max_keyframes, bool)
        self.kf_frame_id = np.full(m.max_keyframes, -1, np.int64)
        self.kf_timestamp = np.zeros(m.max_keyframes, np.float64)
        # per-KF feature snapshots (immutable after insertion)
        self.kf_uv = np.zeros((m.max_keyframes, kp, 2), np.float32)
        self.kf_ur = np.full((m.max_keyframes, kp), -1.0, np.float32)
        self.kf_depth = np.full((m.max_keyframes, kp), -1.0, np.float32)
        self.kf_level = np.zeros((m.max_keyframes, kp), np.int32)
        self.kf_angle = np.zeros((m.max_keyframes, kp), np.float32)
        self.kf_desc = np.zeros((m.max_keyframes, kp, 8), np.uint32)
        self.kf_feat_valid = np.zeros((m.max_keyframes, kp), bool)
        # associations: feature slot -> landmark id (-1)
        self.kf_pt_idx = np.full((m.max_keyframes, kp), -1, np.int32)
        self.kf_ln_idx = np.full((m.max_keyframes, kl), -1, np.int32)
        self.kf_pl_idx = np.full((m.max_keyframes, pp), -1, np.int32)
        self.kf_pl_par_idx = np.full((m.max_keyframes, pp), -1, np.int32)  # parallel obs
        self.kf_pl_ver_idx = np.full((m.max_keyframes, pp), -1, np.int32)  # vertical obs
        self.kf_pl_coeffs = np.zeros((m.max_keyframes, pp, 4), np.float32)
        self.kf_ln_line2d = np.zeros((m.max_keyframes, kl, 3), np.float32)
        self.kf_ln_desc = np.zeros((m.max_keyframes, kl, ld), np.float32)
        self.kf_ln_valid = np.zeros((m.max_keyframes, kl), bool)
        # 2D segment endpoints + angle (needed by the guided line
        # projection search / fuse, `src/LSDmatcher.cpp:20,750`)
        self.kf_ln_uv_s = np.zeros((m.max_keyframes, kl, 2), np.float32)
        self.kf_ln_uv_e = np.zeros((m.max_keyframes, kl, 2), np.float32)
        self.kf_ln_angle = np.zeros((m.max_keyframes, kl), np.float32)
        # BoW-style retrieval sketch per KF (loop closing)
        self.kf_bow = np.zeros((m.max_keyframes, 1 << cfg.loop.vocab_bits),
                               np.float32)

        # covisibility weights (shared observed points)
        self.covis = np.zeros((m.max_keyframes, m.max_keyframes), np.int32)
        # spanning tree parent (for trajectory save of culled KFs)
        self.kf_parent = np.full(m.max_keyframes, -1, np.int32)
        # relative pose to parent, stored at cull time (reference
        # `KeyFrame::SetBadFlag` mTcp, `src/KeyFrame.cc:608`): culled KFs
        # stop receiving loop/GBA corrections, so anything anchored to them
        # must chain through T_culled_parent to the nearest VALID ancestor
        self.kf_tcp = np.tile(np.eye(4, dtype=np.float32),
                              (m.max_keyframes, 1, 1))

        # accepted loop constraints (reference `KeyFrame::AddLoopEdge` —
        # stored on keyframes and included in EVERY later essential-graph
        # run, `src/Optimizer.cc:2799+`; round 2 rebuilt edges from scratch
        # per correction so old loop constraints evaporated)
        self.loop_edge_ab = np.full((LOOP_EDGE_CAP, 2), -1, np.int32)
        self.loop_edge_T = np.tile(np.eye(4, dtype=np.float32),
                                   (LOOP_EDGE_CAP, 1, 1))  # measured T_a_b
        self.n_loop_edges = 0

        self.n_kf = 0  # next keyframe slot (monotonic)
        self.next_pt = 0
        self.next_ln = 0
        self.next_pl = 0

    def add_loop_edge(self, a: int, b: int, T_ab: np.ndarray) -> None:
        """Persist an accepted loop constraint T_a_w = T_ab @ T_b_w
        (`KeyFrame::AddLoopEdge` role). Oldest edge is dropped at capacity."""
        if self.n_loop_edges >= LOOP_EDGE_CAP:
            self.loop_edge_ab[:-1] = self.loop_edge_ab[1:]
            self.loop_edge_T[:-1] = self.loop_edge_T[1:]
            self.n_loop_edges = LOOP_EDGE_CAP - 1
        i = self.n_loop_edges
        self.loop_edge_ab[i] = (a, b)
        self.loop_edge_T[i] = T_ab.astype(np.float32)
        self.n_loop_edges += 1

    # -- allocation helpers ---------------------------------------------------
    def alloc_points(self, k: int) -> np.ndarray:
        """Return k free point slots (recycling invalidated ones)."""
        free = np.flatnonzero(~self.pt_valid[:max(self.next_pt + k,
                                                  len(self.pt_valid))])
        if len(free) < k:
            raise RuntimeError("map point capacity exhausted")
        self.next_pt = max(self.next_pt, int(free[k - 1]) + 1)
        return free[:k]

    def alloc_lines(self, k: int) -> np.ndarray:
        free = np.flatnonzero(~self.ln_valid)
        if len(free) < k:
            raise RuntimeError("map line capacity exhausted")
        return free[:k]

    def alloc_plane(self) -> int:
        free = np.flatnonzero(~self.pl_valid)
        if len(free) == 0:
            raise RuntimeError("map plane capacity exhausted")
        return int(free[0])

    def alloc_keyframe(self) -> int:
        if self.n_kf >= self.n_kf_slots:
            raise RuntimeError("keyframe capacity exhausted")
        kf = self.n_kf
        self.n_kf += 1
        return kf

    def compact_keyframes(self) -> Optional[np.ndarray]:
        """Reclaim the slots of culled keyframes by compacting valid KFs to
        the front (in insertion order, preserving the id-order == time-order
        invariant the recency gates rely on).

        The reference's KeyFrame lifecycle is unbounded (`src/KeyFrame.cc:
        560-620` keeps bad KFs as husks holding mTcp chains); this build's
        fixed-capacity slots would otherwise exhaust on long sequences with
        culling churn (every insertion permanently burned a slot). Culled
        husks are DROPPED here: every reference to them must be flattened
        to a valid anchor first — this method folds the map-internal ones
        (spanning-tree parents, landmark first_kf anchors, loop edges);
        callers owning external references (trajectory records, tracker
        ref_kf, loop streaks) flatten via the returned remap (old slot ->
        new slot, -1 for dropped) — see System._maybe_compact_keyframes.

        Returns the remap, or None if there was nothing to reclaim."""
        old_valid = np.flatnonzero(self.kf_valid[:self.n_kf])
        V = len(old_valid)
        if V == self.n_kf:
            return None
        remap = np.full(self.n_kf_slots, -1, np.int32)
        remap[old_valid] = np.arange(V, dtype=np.int32)

        def fold(k: int) -> int:
            """Nearest valid ancestor in NEW ids (the cull-time relative
            cancels in every before/after correction — see _correct)."""
            a, _ = self.resolve_kf(int(k))
            return int(remap[a]) if a >= 0 else -1

        # spanning-tree parents of surviving KFs -> nearest valid ancestor
        new_parent = np.full(self.n_kf_slots, -1, np.int32)
        for new_i, old_i in enumerate(old_valid):
            p = int(self.kf_parent[old_i])
            new_parent[new_i] = fold(p) if p >= 0 else -1
            if new_parent[new_i] == new_i:  # parent chain hit itself
                new_parent[new_i] = -1

        # landmark creation anchors (used only through resolve_kf)
        for first in (self.pt_first_kf, self.ln_first_kf, self.pl_first_kf):
            refd = np.unique(first[first >= 0])
            lut = {int(k): fold(int(k)) for k in refd}
            for k, v in lut.items():
                first[first == k] = v

        # persisted loop edges: T_a_w = T_ab @ T_b_w; a culled endpoint a
        # with T_a_w = rel_a @ T_anchor_w folds to
        # T_anchor_w = rel_a^-1 @ T_ab @ (rel_b @ T_anchorB_w)
        kept_ab, kept_T = [], []
        for i in range(self.n_loop_edges):
            a, b = (int(x) for x in self.loop_edge_ab[i])
            aa, rel_a = self.resolve_kf(a)
            ab_, rel_b = self.resolve_kf(b)
            if aa < 0 or ab_ < 0 or aa == ab_:
                continue
            T = np.linalg.inv(rel_a) @ self.loop_edge_T[i] @ rel_b
            kept_ab.append((remap[aa], remap[ab_]))
            kept_T.append(T.astype(np.float32))

        # move every per-KF array; reset the freed tail
        per_kf = [self.kf_pose, self.kf_valid, self.kf_frame_id,
                  self.kf_timestamp, self.kf_uv, self.kf_ur, self.kf_depth,
                  self.kf_level, self.kf_angle, self.kf_desc,
                  self.kf_feat_valid, self.kf_pt_idx, self.kf_ln_idx,
                  self.kf_pl_idx, self.kf_pl_par_idx, self.kf_pl_ver_idx,
                  self.kf_pl_coeffs, self.kf_ln_line2d, self.kf_ln_desc,
                  self.kf_ln_valid, self.kf_ln_uv_s, self.kf_ln_uv_e,
                  self.kf_ln_angle, self.kf_bow]
        for arr in per_kf:
            arr[:V] = arr[old_valid]
        self.kf_valid[V:] = False
        self.kf_frame_id[V:] = -1
        self.kf_pt_idx[V:] = -1
        self.kf_ln_idx[V:] = -1
        self.kf_pl_idx[V:] = -1
        self.kf_pl_par_idx[V:] = -1
        self.kf_pl_ver_idx[V:] = -1
        self.kf_feat_valid[V:] = False
        self.kf_ln_valid[V:] = False
        self.kf_bow[V:] = 0.0
        self.kf_parent[:] = new_parent
        # valid KFs carry current absolute poses; tcp is only read for
        # culled husks, which no longer exist
        self.kf_tcp[:] = np.eye(4, dtype=np.float32)
        cv = self.covis[np.ix_(old_valid, old_valid)]
        self.covis[:] = 0
        self.covis[:V, :V] = cv
        self.loop_edge_ab[:] = -1
        self.loop_edge_T[:] = np.eye(4, dtype=np.float32)
        for i, (ab, T) in enumerate(zip(kept_ab, kept_T)):
            self.loop_edge_ab[i] = ab
            self.loop_edge_T[i] = T
        self.n_loop_edges = len(kept_ab)
        self.n_kf = V
        return remap

    # -- queries --------------------------------------------------------------
    def valid_kf_ids(self) -> np.ndarray:
        return np.flatnonzero(self.kf_valid[:self.n_kf])

    def covisible_kfs(self, kf: int, min_weight: Optional[int] = None
                      ) -> np.ndarray:
        """KFs ordered by shared-point weight (reference covisibility graph,
        `KeyFrame::UpdateConnections`)."""
        w = self.covis[kf, :self.n_kf].copy()
        w[~self.kf_valid[:self.n_kf]] = 0
        if min_weight is None:
            min_weight = self.cfg.map.covis_min_weight
        ids = np.flatnonzero(w >= min_weight)
        return ids[np.argsort(-w[ids])]

    def update_covisibility(self, kf: int) -> None:
        """Recompute covisibility weights for one KF from shared points
        (native mapcore; `KeyFrame::UpdateConnections` role)."""
        from planarslam_tpu import native

        w = native.covis_update(self.kf_pt_idx, self.kf_valid, self.pt_valid,
                                self.n_kf, kf)
        self.covis[kf, :self.n_kf] = w
        self.covis[:self.n_kf, kf] = w
        # spanning tree: parent = strongest covisible older VALID KF
        older = self.covis[kf, :kf] * self.kf_valid[:kf]
        if kf > 0 and older.max(initial=0) > 0:
            self.kf_parent[kf] = int(np.argmax(older))

    def cull_keyframe(self, kf: int) -> None:
        """Invalidate a redundant KF, storing its pose RELATIVE to the
        nearest valid ancestor and reparenting its children (reference
        `KeyFrame::SetBadFlag`, `src/KeyFrame.cc:560-620`). Without this,
        landmarks/trajectory frames anchored to the culled KF silently stop
        receiving loop/GBA corrections (its stored absolute pose goes
        stale)."""
        anchor, _ = self.resolve_kf(int(self.kf_parent[kf])
                                    if self.kf_parent[kf] >= 0 else 0)
        if anchor < 0:
            anchor = 0
        # both kf and anchor poses are current here, so the stored relative
        # is exact: T_kf_w = kf_tcp @ T_anchor_w
        self.kf_tcp[kf] = (self.kf_pose[kf]
                           @ np.linalg.inv(self.kf_pose[anchor])
                           ).astype(np.float32)
        # reparent VALID children to the anchor (culled children keep their
        # parent pointer — their stored tcp is relative to THIS kf and the
        # resolve walk chains through it)
        self.kf_parent[kf] = anchor
        children = np.flatnonzero((self.kf_parent[:self.n_kf] == kf)
                                  & self.kf_valid[:self.n_kf])
        self.kf_parent[children[children != kf]] = anchor
        self.kf_valid[kf] = False

    def resolve_kf(self, kf: int):
        """Nearest valid ancestor of a (possibly culled) KF.

        Returns (anchor_id, T_rel) with T_kf_w = T_rel @ T_anchor_w, chaining
        the stored cull-time relatives (reference `SaveTrajectoryTUM` walks
        `GetParent()` multiplying mTcp, `src/System.cc:208-214`)."""
        T_rel = np.eye(4, dtype=np.float32)
        seen = set()
        while kf >= 0 and not self.kf_valid[kf] and kf not in seen:
            seen.add(kf)
            T_rel = T_rel @ self.kf_tcp[kf]
            kf = int(self.kf_parent[kf])
        if kf < 0 or not self.kf_valid[kf]:
            valid = self.valid_kf_ids()
            return (int(valid[0]) if len(valid) else -1,
                    np.eye(4, dtype=np.float32))
        return kf, T_rel

    def local_map_points(self, kf_ids: np.ndarray, cap: int) -> np.ndarray:
        """Union of point ids observed by the given KFs, padded to cap."""
        ids = np.unique(self.kf_pt_idx[kf_ids].reshape(-1))
        ids = ids[(ids >= 0) & self.pt_valid[np.clip(ids, 0, None)]]
        if len(ids) > cap:
            # prefer the most-observed points
            ids = ids[np.argsort(-self.pt_nobs[ids])][:cap]
        return ids

    def local_map_lines(self, kf_ids: np.ndarray, cap: int) -> np.ndarray:
        ids = np.unique(self.kf_ln_idx[kf_ids].reshape(-1))
        ids = ids[(ids >= 0) & self.ln_valid[np.clip(ids, 0, None)]]
        return ids[:cap]

    # -- plane clouds ---------------------------------------------------------
    def add_plane_cloud(self, pl: int, pts_w: np.ndarray) -> None:
        """Merge new world points into a plane's voxel-hashed cloud
        (native mapcore; the role of MapPlane::UpdateCoefficientsAndPoints
        voxel filtering, `src/MapPlane.cc:298-366`)."""
        from planarslam_tpu import native

        cap = self.pl_cloud.shape[1]
        leaf = self.cfg.planes.leaf_size * 4.0
        self.pl_cloud_n[pl] = native.voxel_merge(
            self.pl_cloud[pl], int(self.pl_cloud_n[pl]),
            pts_w.astype(np.float32), leaf, cap)

    def refit_plane(self, pl: int) -> None:
        """Re-estimate a plane's coefficients from its merged world cloud
        (the reference refits by RANSAC over the voxel cloud on every
        update, `src/MapPlane.cc:298-366`; here: eigen-fit with one
        robust trim round — same estimator PEAC uses per block).

        Round 1 froze coefficients at first observation (VERDICT item 6a);
        as clouds grow across keyframes the frozen normal drifts from the
        evidence."""
        n = int(self.pl_cloud_n[pl])
        if n < 30:
            return
        pts = self.pl_cloud[pl, :n].astype(np.float64)
        prev = self.pl_coeffs[pl].astype(np.float64)

        def eigen_fit(p):
            mean = p.mean(axis=0)
            c = p - mean
            cov = c.T @ c / len(p)
            evals, evecs = np.linalg.eigh(cov)
            normal = evecs[:, 0]
            d = -normal @ mean
            return normal, d

        normal, d = eigen_fit(pts)
        # one trim round: drop points beyond 2x the assoc distance gate
        dist = np.abs(pts @ normal + d)
        keep = dist < max(2.0 * float(np.median(dist)),
                          self.cfg.planes.leaf_size)
        if keep.sum() >= 30:
            normal, d = eigen_fit(pts[keep])
        coeffs = np.r_[normal, d]
        # keep the g2o sign convention (d >= 0, unit normal)
        if coeffs[3] < 0:
            coeffs = -coeffs
        # reject a refit that flips the plane (degenerate cloud geometry)
        if abs(coeffs[:3] @ prev[:3] / max(np.linalg.norm(prev[:3]), 1e-9)) \
                < 0.9:
            return
        self.pl_coeffs[pl] = coeffs.astype(np.float32)

    def plane_min_dist_to_cloud(self, coeffs_w: np.ndarray, pl: int) -> float:
        """Min |n.x + d| over the plane's cloud (native mapcore;
        PlaneMatcher's point-to-plane test, `src/PlaneMatcher.cpp:30-60`)."""
        from planarslam_tpu import native

        return native.plane_cloud_min_dist(
            self.pl_cloud[pl], int(self.pl_cloud_n[pl]),
            coeffs_w.astype(np.float64))

    # -- landmark bookkeeping -------------------------------------------------
    def erase_point(self, ids) -> None:
        """Invalidate points AND scrub their observation-table references —
        slots are recycled by alloc_points, so stale ids would silently
        rebind to different landmarks (fatal for BA)."""
        ids = np.atleast_1d(np.asarray(ids))
        self.pt_valid[ids] = False
        self.pt_gen[ids] += 1
        tbl = self.kf_pt_idx[:self.n_kf]
        tbl[np.isin(tbl, ids)] = -1

    def erase_line(self, ids) -> None:
        ids = np.atleast_1d(np.asarray(ids))
        self.ln_valid[ids] = False
        self.ln_gen[ids] += 1
        tbl = self.kf_ln_idx[:self.n_kf]
        tbl[np.isin(tbl, ids)] = -1

    def erase_plane(self, pl: int) -> None:
        """Invalidate a plane and scrub every observation table
        (`MapPlane::SetBadFlag` role — the probation culling of
        `src/LocalMapping.cc:279-307` erases observation-starved planes)."""
        self.pl_valid[pl] = False
        self.pl_cloud_n[pl] = 0
        for tbl in (self.kf_pl_idx, self.kf_pl_par_idx, self.kf_pl_ver_idx):
            t = tbl[:self.n_kf]
            t[t == pl] = -1

    def replace_point(self, drop: int, keep: int) -> None:
        """MapPoint::Replace semantics: rewrite every observation of `drop`
        to `keep` (first association wins where both exist) and merge
        statistics."""
        tbl = self.kf_pt_idx[:self.n_kf]
        where = tbl == drop
        n_moved = 0
        for k, f in zip(*np.nonzero(where)):
            row = tbl[k]
            if (row == keep).any():
                row[f] = -1  # keep already observed in this KF
            else:
                row[f] = keep
                n_moved += 1
        self.pt_nobs[keep] += n_moved
        self.pt_found[keep] += self.pt_found[drop]
        self.pt_visible[keep] += self.pt_visible[drop]
        self.pt_valid[drop] = False
        self.pt_gen[drop] += 1

    def point_stats_update(self, ids: np.ndarray, found_mask: np.ndarray) -> None:
        """Track the found/visible ratio used by culling
        (`MapPoint::IncreaseFound/IncreaseVisible`)."""
        self.pt_visible[ids] += 1
        self.pt_found[ids[found_mask]] += 1

    def line_stats_update(self, ids: np.ndarray, found_mask: np.ndarray,
                          cam_center_w: np.ndarray | None = None) -> None:
        """found/visible tracking + running mean view direction for map
        lines (`MapLine::IncreaseFound/IncreaseVisible/UpdateAverageDir`)."""
        self.ln_visible[ids] += 1
        self.ln_found[ids[found_mask]] += 1
        if cam_center_w is not None and len(ids):
            mid = 0.5 * (self.ln_sw[ids] + self.ln_ew[ids])
            v = mid - cam_center_w[None, :]
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
            acc = self.ln_view_dir[ids] * (self.ln_visible[ids, None] - 1) + v
            self.ln_view_dir[ids] = acc / np.maximum(
                np.linalg.norm(acc, axis=1, keepdims=True), 1e-9)

    def replace_line(self, drop: int, keep: int) -> None:
        """MapLine::Replace: rewrite observations of `drop` to `keep`
        (line fuse, `src/LSDmatcher.cpp:750,884`)."""
        tbl = self.kf_ln_idx[:self.n_kf]
        where = tbl == drop
        conflict = np.isin(tbl, [keep]) .any(axis=1)
        for k in np.flatnonzero(where.any(axis=1)):
            row = tbl[k]
            if conflict[k]:
                row[row == drop] = -1  # KF already observes keep
            else:
                row[row == drop] = keep
        self.ln_nobs[keep] += self.ln_nobs[drop]
        self.ln_found[keep] += self.ln_found[drop]
        self.ln_visible[keep] += self.ln_visible[drop]
        self.ln_valid[drop] = False
        self.ln_gen[drop] += 1
