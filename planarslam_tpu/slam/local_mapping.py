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
        self._recent_pls: dict[int, int] = {}
        self.last_line_tri_count = 0
        # deferred keyframe processing: begin_keyframe dispatches the fused
        # mapping program and parks the D2H pull here; finish_keyframe joins
        # and applies (System calls finish at the NEXT keyframe / drain, so
        # the round-trip overlaps tracking instead of stalling it)
        self._pending: Optional[dict] = None
        self._pull_pool = None
        self.prof = None  # set alongside Tracking.prof for stage budgets

    def process_keyframe(self, kf: int) -> None:
        """Synchronous begin+finish (host paths and tests)."""
        self.begin_keyframe(kf)
        self.finish_keyframe()

    def begin_keyframe(self, kf: int) -> None:
        """Probation bookkeeping + landmark culling + DISPATCH of the fused
        triangulation/fuse program for this keyframe (reference
        `ProcessNewKeyFrame`..`SearchInNeighbors` `src/LocalMapping.cc:
        28-99` — its thread hides this latency; here the pull is joined at
        the next keyframe by finish_keyframe, a fixed deterministic point).
        """
        m = self.map
        created = np.flatnonzero((m.pt_first_kf == kf) & m.pt_valid)
        for p in created:
            self._recent_pts[int(p)] = kf
        created_l = np.flatnonzero((m.ln_first_kf == kf) & m.ln_valid)
        for l in created_l:
            self._recent_lns[int(l)] = kf
        for p in np.flatnonzero((m.pl_first_kf == kf) & m.pl_valid):
            self._recent_pls[int(p)] = kf

        self._cull_points(kf)
        self._cull_lines(kf)
        self._cull_planes(kf)
        # triangulation + fuse run as ONE fused device program with one pull
        # (device_mapper.mapping_step) — the per-neighbor loop of round 1
        # cost a tunnel round-trip per call
        if len(m.covisible_kfs(kf)) > 0:
            from concurrent.futures import ThreadPoolExecutor

            from planarslam_tpu.slam.device_mapper import \
                dispatch_mapping_step

            if self._pull_pool is None:
                self._pull_pool = ThreadPoolExecutor(max_workers=1)
            self._pending = dispatch_mapping_step(m, kf, self.cfg,
                                                  pull_pool=self._pull_pool)
        else:
            self._pending = {"kf": kf, "no_dispatch": True}

    def finish_keyframe(self) -> None:
        """Join the pending mapping pull, apply triangulation/fuse, then
        run keyframe culling and (optional) local BA. No-op when nothing
        is pending. Must run before any operation that MOVES keyframe rows
        (slot compaction) — results are applied by keyframe id."""
        pending = self._pending
        if pending is None:
            return
        self._pending = None
        m = self.map
        kf = pending["kf"]
        if not m.kf_valid[kf]:
            return  # culled while the dispatch was in flight
        from time import perf_counter as _pc
        prof = self.prof
        t0 = _pc() if prof is not None else 0.0
        if not pending.get("no_dispatch"):
            from planarslam_tpu.slam.device_mapper import join_mapping_step

            res = join_mapping_step(pending)
            if prof is not None:
                prof["mapping_join"].append(_pc() - t0)
                t0 = _pc()
            self._apply_triangulation(kf, res)
            self._apply_line_triangulation(kf, res)
            self._apply_fuse(kf, res)
            self._fuse_lines(kf)
            self._update_distinctive_descriptors(kf)
            if prof is not None:
                prof["mapping_apply"].append(_pc() - t0)
                t0 = _pc()
        self._cull_keyframes(kf)
        if prof is not None:
            prof["mapping_cull_kfs"].append(_pc() - t0)
        if self.enable_local_ba and m.n_kf >= 3:
            from planarslam_tpu.solvers.local_ba import local_bundle_adjustment

            local_bundle_adjustment(m, kf, self.cfg)

    # ----------------------------------------------------- point creation
    def _apply_triangulation(self, kf: int, res: dict) -> None:
        """Apply the fused kernel's triangulations: create far map points
        observed by the new KF and one neighbor (reference
        `CreateNewMapPoints` `src/LocalMapping.cc:309`; RGB-D close points
        come from depth at KF insertion, triangulation adds depthless)."""
        m = self.map
        cfg = self.cfg
        T1 = m.kf_pose[kf]
        c1 = -T1[:3, :3].T @ T1[:3, 3]
        free = res["own_free"].copy()
        for i, nb in enumerate(res["nb_ids"]):
            if not res["tri_ok"][i]:
                continue
            nb = int(nb)
            sel = np.flatnonzero(res["tri_good"][i] > 0)
            sel = sel[free[sel]]  # an earlier neighbor may have claimed them
            f2 = res["tri_idx"][i][sel]
            still_free = m.kf_pt_idx[nb, f2] < 0
            sel, f2 = sel[still_free], f2[still_free]
            if len(sel) == 0:
                continue
            X = res["tri_x"][i][sel]
            try:
                ids = m.alloc_points(len(sel))
            except RuntimeError:
                return
            m.pt_xyz[ids] = X
            m.pt_desc[ids] = m.kf_desc[kf][sel]
            vec = X - c1
            dist = np.linalg.norm(vec, axis=1)
            m.pt_normal[ids] = vec / np.maximum(dist[:, None], 1e-9)
            lvl = m.kf_level[kf][sel]
            sf = cfg.orb.scale_factor
            m.pt_max_dist[ids] = dist * (sf ** lvl) * 1.2
            m.pt_min_dist[ids] = m.pt_max_dist[ids] / \
                (sf ** cfg.orb.n_levels) * 0.8
            m.pt_valid[ids] = True
            m.pt_nobs[ids] = 2
            m.pt_found[ids] = 1
            m.pt_visible[ids] = 1
            m.pt_first_kf[ids] = kf
            m.kf_pt_idx[kf, sel] = ids
            m.kf_pt_idx[nb, f2] = ids
            free[sel] = False
            for p in ids:
                self._recent_pts[int(p)] = kf

    def _apply_line_triangulation(self, kf: int, res: dict) -> None:
        """Create map lines from two-view plane-plane triangulation
        (reference `CreateNewMapLines2` `src/LocalMapping.cc:800`): free 2D
        segments without a depth lift get endpoints from intersecting their
        endpoint rays with the matched neighbor segment's back-projection
        plane. Complements the per-frame depth-based creation for lines
        beyond depth range or over invalid depth."""
        m = self.map
        T_wc = np.linalg.inv(m.kf_pose[kf])
        created = 0
        taken_nb: set[tuple[int, int]] = set()
        for i, nb in enumerate(res["nb_ids"]):
            if not res["nb_ok"][i]:
                continue
            nb = int(nb)
            good = res["ln_tri_good"][i] > 0
            for s in np.flatnonzero(good):
                if int(m.kf_ln_idx[kf, s]) >= 0:
                    continue  # created via an earlier neighbor
                f2 = int(res["ln_tri_idx"][i, s])
                if (nb, f2) in taken_nb or int(m.kf_ln_idx[nb, f2]) >= 0:
                    continue
                ids = m.alloc_lines(1)
                l = int(ids[0])
                m.ln_sw[l] = res["ln_tri_s"][i, s]
                m.ln_ew[l] = res["ln_tri_e"][i, s]
                m.ln_desc[l] = m.kf_ln_desc[kf, s]
                m.ln_valid[l] = True
                m.ln_nobs[l] = 2
                m.ln_first_kf[l] = kf
                m.ln_found[l] = 1
                m.ln_visible[l] = 1
                mid = 0.5 * (m.ln_sw[l] + m.ln_ew[l]) - T_wc[:3, 3]
                m.ln_view_dir[l] = mid / max(np.linalg.norm(mid), 1e-9)
                m.kf_ln_idx[kf, s] = l
                m.kf_ln_idx[nb, f2] = l
                taken_nb.add((nb, f2))
                self._recent_lns[l] = kf
                created += 1
        self.last_line_tri_count = created

    # ---------------------------------------------------------------- fuse
    def _apply_fuse(self, kf: int, res: dict) -> None:
        """Apply the fused kernel's projection matches: merge duplicate
        landmarks / add missed associations in covisible neighbors
        (reference `SearchInNeighbors` `src/LocalMapping.cc:1039`)."""
        m = self.map
        own = m.kf_pt_idx[kf]
        for i, nb in enumerate(res["nb_ids"]):
            if not res["nb_ok"][i]:
                continue
            nb = int(nb)
            idx = res["fuse_idx"][i]
            for s in np.flatnonzero(idx >= 0):
                p = int(own[s])
                # re-check every iteration: replace_point in an earlier
                # iteration may have invalidated p (slot recycling would
                # silently rebind the association — fatal for BA)
                if p < 0 or not m.pt_valid[p]:
                    continue
                f = int(idx[s])
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
        """Reference `MapLineCulling` (`src/LocalMapping.cc:204`): probation
        erases lines with found/visible ratio < 0.25 or too few observers
        shortly after creation."""
        m = self.map
        drop = []
        erase = []
        for l, born in list(self._recent_lns.items()):
            if not m.ln_valid[l]:
                drop.append(l)
                continue
            age = kf - born
            ratio = m.ln_found[l] / max(m.ln_visible[l], 1)
            if ratio < 0.25 and m.ln_visible[l] >= 3:
                erase.append(l)
                drop.append(l)
            elif age >= 2 and m.ln_nobs[l] <= 1:
                erase.append(l)
                drop.append(l)
            elif age >= 3:
                drop.append(l)
        if erase:
            m.erase_line(np.asarray(erase))
        for l in drop:
            self._recent_lns.pop(l, None)

    def _fuse_lines(self, kf: int) -> None:
        """Line fuse across covisible neighbors (`LSDmatcher::Fuse`
        `src/LSDmatcher.cpp:750,884`): project this KF's map lines into each
        neighbor; a hit on a segment bound to a DIFFERENT map line merges
        the two (better-observed id wins), an unbound hit adds the missing
        association. Keeps the map line count bounded across revisits."""
        from planarslam_tpu.ops.lines import search_lines_by_projection
        import jax.numpy as jnp

        m = self.map
        cfg = self.cfg
        cam = cfg.camera
        own = m.kf_ln_idx[kf]
        own_ids = np.unique(own[own >= 0])
        own_ids = own_ids[m.ln_valid[own_ids]]
        if len(own_ids) == 0:
            return
        cap = cfg.map.max_lines
        ids_l = np.zeros(cap, np.int64)
        ids_l[:len(own_ids)] = own_ids[:cap]
        valid_l = np.zeros(cap, bool)
        valid_l[:len(own_ids)] = True
        for nb in [int(c) for c in m.covisible_kfs(kf)[:4]]:
            idx, _ = search_lines_by_projection(
                jnp.asarray(m.ln_sw[ids_l]), jnp.asarray(m.ln_ew[ids_l]),
                jnp.asarray(m.ln_desc[ids_l]), jnp.asarray(valid_l),
                jnp.asarray(m.kf_pose[nb]),
                jnp.asarray(m.kf_ln_uv_s[nb]), jnp.asarray(m.kf_ln_uv_e[nb]),
                jnp.asarray(m.kf_ln_angle[nb]), jnp.asarray(m.kf_ln_desc[nb]),
                jnp.asarray(m.kf_ln_valid[nb]),
                K=(cam.fx, cam.fy, cam.cx, cam.cy),
                image_wh=(float(cam.width), float(cam.height)),
                radius=8.0)
            idx = np.asarray(idx)
            for s in np.flatnonzero(idx >= 0):
                p = int(ids_l[s])
                if not m.ln_valid[p]:  # merged away earlier this loop
                    continue
                f = int(idx[s])
                q = int(m.kf_ln_idx[nb, f])
                if q == p:
                    continue
                if q >= 0 and m.ln_valid[q]:
                    keep, dropped = (p, q) if m.ln_nobs[p] >= m.ln_nobs[q] \
                        else (q, p)
                    m.replace_line(dropped, keep)
                else:
                    m.kf_ln_idx[nb, f] = p
                    m.ln_nobs[p] += 1

    # ----------------------------------------------------------------- planes
    def _cull_planes(self, kf: int) -> None:
        """Observation culling + O(P^2) coplanar merge
        (`src/LocalMapping.cc:233-307`)."""
        m = self.map
        cfg = self.cfg.planes
        # probation: recent planes never re-observed after 2 KFs are erased
        # (the reference's recent-plane culling `:279-303`; its cnThObs=2
        # is calibrated to its per-frame matcher — here a fresh duplicate
        # of a real plane is often created and then MERGED instead of
        # re-associated, so a nobs<=2 rule erases real walls mid-merge;
        # nobs<=1 keeps the ghost-killing function: one-shot spurious fits
        # die, merged-at-least-once structure survives)
        drop = []
        for p, born in list(self._recent_pls.items()):
            if not m.pl_valid[p]:
                drop.append(p)
            elif kf - born >= 2 and m.pl_nobs[p] <= 1:
                m.erase_plane(p)
                drop.append(p)
            elif kf - born >= 3:
                drop.append(p)  # graduated
        for p in drop:
            self._recent_pls.pop(p, None)
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
        m.refit_plane(keep)

    def _update_distinctive_descriptors(self, kf: int) -> None:
        """Re-elect each landmark's representative descriptor as the medoid
        of its per-KF observations (`MapPoint::ComputeDistinctiveDescriptors`
        `src/MapPoint.cc:225-270`: minimal median distance to the others;
        same policy for MapLine descriptor pools, `src/MapLine.cpp`).

        Round 1 froze the creation-time descriptor forever; as viewpoint
        changes accumulate, matching against a stale descriptor degrades.

        The observation pool is gathered from the KF's COVISIBILITY
        neighborhood, not the whole map: the reference's per-landmark
        observation lists (`src/MapPoint.cc:225-270`) are by construction
        confined to KFs sharing observations — i.e. covisible ones — and a
        whole-map scan per insertion made this stage O(n_kf) host time on
        long runs (round-3 VERDICT weak #3)."""
        m = self.map
        neigh = [kf] + [int(c) for c in m.covisible_kfs(kf)[:12]]
        neigh = [k for k in neigh if m.kf_valid[k]]
        row = m.kf_pt_idx[kf]
        feats = np.flatnonzero(row >= 0)
        own = row[feats][m.pt_valid[row[feats]]]
        if len(own) == 0:
            return
        lut = np.full(m.pt_valid.shape[0], -1, np.int64)
        lut[own] = np.arange(len(own))
        # vectorized gather: (pool index, observing KF, feature) triplets
        pool_i: list[np.ndarray] = []
        pool_desc: list[np.ndarray] = []
        for other in neigh:
            rowk = m.kf_pt_idx[other]
            sel = np.flatnonzero(rowk >= 0)
            li = lut[rowk[sel]]
            hit = li >= 0
            if hit.any():
                pool_i.append(li[hit])
                pool_desc.append(m.kf_desc[other, sel[hit]])
        if not pool_i:
            return
        pi = np.concatenate(pool_i)
        pd = np.concatenate(pool_desc)  # (n_obs, 8) uint32
        order = np.argsort(pi, kind="stable")
        pi, pd = pi[order], pd[order]
        starts = np.searchsorted(pi, np.arange(len(own)))
        ends = np.searchsorted(pi, np.arange(len(own)) + 1)
        for i in range(len(own)):
            n = ends[i] - starts[i]
            if n < 3:
                continue
            D = pd[starts[i]:ends[i]]
            bits = np.unpackbits(D.view(np.uint8), axis=1)
            ham = (bits[:, None, :] != bits[None, :, :]).sum(-1)
            med = np.median(ham, axis=1)
            m.pt_desc[own[i]] = D[int(np.argmin(med))]

        # lines: medoid by cosine distance over the float band descriptors
        rowl = m.kf_ln_idx[kf]
        featsl = np.flatnonzero(rowl >= 0)
        ownl = rowl[featsl][m.ln_valid[rowl[featsl]]]
        if len(ownl) == 0:
            return
        lutl = np.full(m.ln_valid.shape[0], -1, np.int64)
        lutl[ownl] = np.arange(len(ownl))
        pool_il: list[np.ndarray] = []
        pool_dl: list[np.ndarray] = []
        for other in neigh:
            rowk = m.kf_ln_idx[other]
            sel = np.flatnonzero(rowk >= 0)
            li = lutl[rowk[sel]]
            hit = li >= 0
            if hit.any():
                pool_il.append(li[hit])
                pool_dl.append(m.kf_ln_desc[other, sel[hit]])
        if not pool_il:
            return
        pil = np.concatenate(pool_il)
        pdl = np.concatenate(pool_dl)
        order = np.argsort(pil, kind="stable")
        pil, pdl = pil[order], pdl[order]
        starts = np.searchsorted(pil, np.arange(len(ownl)))
        ends = np.searchsorted(pil, np.arange(len(ownl)) + 1)
        for i in range(len(ownl)):
            n = ends[i] - starts[i]
            if n < 3:
                continue
            D = pdl[starts[i]:ends[i]]
            dist = 1.0 - D @ D.T
            med = np.median(dist, axis=1)
            m.ln_desc[ownl[i]] = D[int(np.argmin(med))]

    # -------------------------------------------------------------- keyframes
    def _cull_keyframes(self, kf: int) -> None:
        """Reference `KeyFrameCulling` (`src/LocalMapping.cc:1226`): a local
        KF is redundant if >=90% of its points are observed by >=3 OTHER
        keyframes at the same or finer scale level (`:1256-1287` — round 1
        used a scale-blind nobs>=4 proxy). Skipped for KFs that introduced
        a new plane (`:1226-1231`).

        Observer counting runs over the candidate's covisibility row at
        min_weight=1 — every KF sharing at least one point, which is
        EXACTLY the set the reference's per-point observation lists cover
        (`src/MapPoint.cc`) — instead of every keyframe in the map (a
        whole-map scan per insertion was O(n_kf) host time, round-3
        VERDICT weak #3). The default >=15-weight neighborhood was not
        equivalent: a point observed mainly by low-overlap KFs was
        undercounted and the candidate retained where the reference would
        cull."""
        m = self.map
        n_pts_cap = m.pt_valid.shape[0]
        for cand in m.covisible_kfs(kf):
            cand = int(cand)
            if cand == 0 or not m.kf_valid[cand]:
                continue  # never cull the origin KF
            if (m.pl_first_kf[m.pl_valid] == cand).any():
                continue
            row = m.kf_pt_idx[cand]
            feats = np.flatnonzero(row >= 0)
            feats = feats[m.pt_valid[row[feats]]]
            if len(feats) < 20:
                continue
            own = row[feats]
            lvls = m.kf_level[cand, feats]
            lut = np.full(n_pts_cap, -1, np.int64)
            lut[own] = np.arange(len(own))
            counts = np.zeros(len(own), np.int32)
            observers = set(int(c) for c in m.covisible_kfs(cand,
                                                            min_weight=1))
            observers.add(kf)
            for other in sorted(observers):
                if other == cand or not m.kf_valid[other]:
                    continue
                rowk = m.kf_pt_idx[other]
                sel = np.flatnonzero(rowk >= 0)
                li = lut[rowk[sel]]
                hit = li >= 0
                if not hit.any():
                    continue
                # scale rule: observer level <= own level + 1
                lev_ok = m.kf_level[other, sel[hit]] <= lvls[li[hit]] + 1
                counts += np.bincount(li[hit][lev_ok], minlength=len(own)
                                      ).astype(np.int32)
            redundant = (counts >= 3).mean()
            if redundant > 0.9:
                # stores T_cull_parent + reparents children so trajectory
                # save / loop re-anchoring keep following corrections
                # (reference SetBadFlag, `src/KeyFrame.cc:560-620`)
                m.cull_keyframe(cand)
                m.pt_nobs[own] -= 1
                # detach observations
                m.kf_pt_idx[cand] = -1
