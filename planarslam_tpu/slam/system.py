"""System facade — the public API (reference `include/System.h:50-171`).

Same surface as the reference: construct from a settings file (or a
SystemConfig), feed frames with TrackRGBD, toggle localization mode, Reset,
Shutdown, save TUM-format trajectories
(`src/System.cc:100,152-170,192-320`). No vocabulary file is needed — loop
retrieval uses on-device descriptor sketching instead of DBoW2.

Thread model: the reference spawns LocalMapping/LoopClosing/Viewer threads
(`src/System.cc:72-86`); here mapping and loop closing run as deterministic
synchronous stages inside TrackRGBD (single-controller design — SURVEY.md
§5.8), which removes the reference's entire lock hierarchy.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from planarslam_tpu.config import SystemConfig, load_yaml_config
from planarslam_tpu.slam.local_mapping import LocalMapping
from planarslam_tpu.slam.map import SlamMap
from planarslam_tpu.slam.tracking import Tracking, TrackingState


class System:
    def __init__(self, settings: Optional[str] = None,
                 config: Optional[SystemConfig] = None,
                 enable_local_mapping: bool = True,
                 enable_loop_closing: bool = True):
        if config is None:
            config = load_yaml_config(settings) if settings else SystemConfig()
        from planarslam_tpu.slam.retrieval import KeyFrameDatabase

        self.cfg = config
        self.map = SlamMap(config)
        self.kf_db = KeyFrameDatabase(config)
        self.tracker = Tracking(config, self.map, kf_db=self.kf_db)
        self.local_mapper = LocalMapping(config, self.map) \
            if enable_local_mapping else None
        self.loop_closer = None
        if enable_loop_closing:
            from planarslam_tpu.slam.loop_closing import LoopClosing

            self.loop_closer = LoopClosing(config, self.map, kf_db=self.kf_db)
        self.localization_only = False
        self.timings: List[float] = []
        self._timestamps: List[float] = []
        self.compactions = 0  # KF slot-recycling passes (observability)
        # deferred backend: first KF id whose backend stages haven't started,
        # and the KF whose mapping join + loop detection are still pending
        # (finished at the NEXT keyframe / drain — deterministic overlap of
        # the mapping round-trip with tracking, reference thread role)
        self._next_backend_kf = 0
        self._backend_kf: Optional[int] = None
        self._backend_due = 0  # frame id at which the deferred work matures

    # ------------------------------------------------------------- main API
    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> Optional[np.ndarray]:
        """Process one frame; returns T_cw (reference `System::TrackRGBD`,
        `src/System.cc:100`). gray: (H, W) float/uint8; depth: metres."""
        t0 = time.perf_counter()
        # native sensor dtypes (uint8 gray / uint16 TUM-unit depth) pass
        # through to the device untouched — 2.7x less tunnel traffic than
        # float32; float inputs keep working (converted to float32)
        gray = np.asarray(gray)
        depth = np.asarray(depth)
        if gray.dtype not in (np.uint8, np.float32):
            gray = gray.astype(np.float32)
        if depth.dtype not in (np.uint16, np.float32):
            depth = depth.astype(np.float32)
        n_kf_before = self.map.n_kf
        pose = self.tracker.track(gray, depth, timestamp)
        self._post_track(n_kf_before)
        self.timings.append(time.perf_counter() - t0)
        self._timestamps.append(timestamp)
        return pose

    def _post_track(self, n_kf_before: int) -> None:
        """Back-end stages after one tracked frame: KF retrieval DB, local
        mapping, loop closing, auto-reset — shared by track_rgbd and the
        batched replayer's external-step path."""
        if self.map.n_kf > n_kf_before:
            self._run_backend()
            self._maybe_compact_keyframes()
        elif (self._backend_kf is not None
              and self.tracker.frame_id >= self._backend_due):
            # deferred mapping/loop work matures a FIXED number of frames
            # after its keyframe (deterministic; ~the reference thread's
            # latency). Waiting for the NEXT keyframe instead starves
            # pt_nobs and the weak-tracking KF policy (chicken-and-egg:
            # fewer KFs -> later fuse -> fewer KFs).
            self._finish_backend_kf()
        # auto-reset when lost with a young map (<=5 KFs, reference
        # `src/Tracking.cc:403-408` "Track lost soon after initialisation")
        if self.tracker.needs_reset and not self.localization_only:
            self.reset()

    def _run_backend(self, drain: bool = False) -> None:
        """Start backend stages for every keyframe that materialized since
        the last call (the deferred tracker can also materialize KFs inside
        flush paths that never pass through _post_track), finishing the
        previous keyframe's deferred work first.

        Per KF: retrieval-DB add + local-mapping BEGIN (culls + mapping
        program dispatch). The mapping JOIN+apply and loop detection for a
        KF run when the NEXT keyframe arrives (or at drain) — the reference
        hides the same work on its LocalMapping/LoopClosing threads
        (`src/System.cc:72-86`); a fixed next-KF horizon keeps runs
        bit-identical where threads would race."""
        prof = self.tracker.prof
        if self.local_mapper is not None:
            self.local_mapper.prof = prof
        while self._next_backend_kf < self.map.n_kf:
            kf = self._next_backend_kf
            self._next_backend_kf += 1
            t0 = time.perf_counter() if prof is not None else 0.0
            self.kf_db.add(self.map, kf)
            if prof is not None:
                prof["backend_db_add"].append(time.perf_counter() - t0)
            if self.localization_only:
                continue
            self._finish_backend_kf()
            if self.local_mapper is not None and self.map.kf_valid[kf]:
                t1 = time.perf_counter() if prof is not None else 0.0
                self.local_mapper.begin_keyframe(kf)
                if prof is not None:
                    prof["backend_begin"].append(time.perf_counter() - t1)
            self._backend_kf = kf
            # mapping join + loop detection mature 3 frames from now —
            # enough for the ~130 KB mapping pull to land in background
            self._backend_due = self.tracker.frame_id + 3
            if self.map.n_kf < 8:
                # young map: finish synchronously, pairing the tracker's
                # young-map synchronous KF creation (tracking.py) — the
                # burst-phase KF policy reads pt_nobs that the mapping
                # fuse populates, and even a 3-frame lag starves it
                # (weak-rule cascade: later fuse -> fewer KFs -> later fuse)
                self._finish_backend_kf()
        if drain:
            self._finish_backend_kf()

    def _finish_backend_kf(self) -> None:
        """Apply the previous keyframe's deferred backend: local-mapping
        join+apply (triangulation/fuse/KF-culling), then loop detection —
        the reference's LocalMapping -> LoopClosing queue order."""
        kf = self._backend_kf
        if kf is None:
            return
        self._backend_kf = None
        prof = self.tracker.prof
        t0 = time.perf_counter() if prof is not None else 0.0
        if self.local_mapper is not None:
            self.local_mapper.finish_keyframe()
        if prof is not None:
            t1 = time.perf_counter()
            prof["backend_finish_mapping"].append(t1 - t0)
        if self.loop_closer is not None and self.map.kf_valid[kf]:
            T_old = self.map.kf_pose[kf].copy()
            loop = self.loop_closer.process_keyframe(kf)
            if loop is not None:
                # re-base the (pipelined) tracker onto the corrected
                # map (reference CorrectLoop re-bases Tracking)
                self.tracker.apply_map_correction(
                    T_old, self.map.kf_pose[kf].copy())
            if prof is not None:
                prof["backend_loop"].append(time.perf_counter() - t1)
        if prof is not None:
            prof["backend_kf"].append(time.perf_counter() - t0)

    def _maybe_compact_keyframes(self) -> None:
        """Reclaim culled KF slots when nearing capacity (the reference's
        KeyFrame lifecycle is unbounded, `src/KeyFrame.cc:560-620`; this
        build's fixed slots would otherwise exhaust on long sequences —
        every insertion permanently burned one of map.max_keyframes slots
        and `alloc_keyframe` would eventually raise mid-sequence).

        All external holders of KF ids are flattened through the remap:
        trajectory records (their cull-time relative is folded into T_cr),
        the tracker's reference KF, loop-consistency streaks, and the
        local mapper's probation birth stamps."""
        m = self.map
        if m.n_kf < m.n_kf_slots - 4:
            return
        # pending mapping/loop work holds KF IDS and is applied by id —
        # the remap would silently misdirect it; drain first
        self._run_backend(drain=True)
        tr = self.tracker
        # resolve every externally held id BEFORE the layout moves
        cache: dict = {}

        def res(k: int):
            k = int(k)
            if k not in cache:
                cache[k] = m.resolve_kf(k)
            return cache[k]

        rec_res = [res(r.ref_kf) for r in tr.records]
        trk_anchor, _ = res(tr.ref_kf)
        lc_streaks = {}
        if self.loop_closer is not None:
            for c, s in self.loop_closer._consistency.items():
                a, _ = res(c)
                if a >= 0:
                    lc_streaks[a] = max(lc_streaks.get(a, 0), s)
        lm_births = []
        if self.local_mapper is not None:
            for d in (self.local_mapper._recent_pts,
                      self.local_mapper._recent_lns,
                      self.local_mapper._recent_pls):
                lm_births.append({lid: res(born)[0]
                                  for lid, born in d.items()})

        remap = m.compact_keyframes()
        if remap is None:
            # nothing culled to reclaim: the map is genuinely full; loud —
            # the next KF insertion will raise instead of silently freezing
            print(f"[planarslam] WARNING: keyframe capacity "
                  f"{m.n_kf_slots} reached with no culled slots to "
                  f"reclaim; raise config.map.max_keyframes", flush=True)
            return

        self.compactions += 1
        # backend was drained above; every surviving KF has been processed
        self._next_backend_kf = self.map.n_kf
        for rec, (anchor, T_rel) in zip(tr.records, rec_res):
            new_id = int(remap[anchor]) if anchor >= 0 else 0
            if new_id != rec.ref_kf:
                rec.T_cr = (rec.T_cr @ T_rel).astype(np.float32)
                rec.ref_kf = new_id
        tr.ref_kf = int(remap[trk_anchor]) if trk_anchor >= 0 else 0
        tr._window_dirty = True
        if self.loop_closer is not None:
            self.loop_closer._consistency = {
                int(remap[a]): s for a, s in lc_streaks.items()
                if remap[a] >= 0}
        if self.local_mapper is not None:
            for d, births in zip((self.local_mapper._recent_pts,
                                  self.local_mapper._recent_lns,
                                  self.local_mapper._recent_pls), lm_births):
                for lid, a in births.items():
                    d[lid] = int(remap[a]) if a >= 0 and remap[a] >= 0 else 0

    def submit_fused_result(self, result, timestamp: float,
                            state_stack=None, lane: int = 0) -> np.ndarray:
        """Batched-replay entry: apply an EXTERNALLY computed fused-step
        result (one slice of the vmapped multi-sequence program) and run
        the same back-end stages as track_rgbd."""
        n_kf_before = self.map.n_kf
        tr = self.tracker
        tr.frame_id += 1
        tr.stats["frames"] += 1
        ok = tr.submit_fused_result(result, timestamp,
                                    state_stack=state_stack, lane=lane)
        if not ok:
            tr.stats["lost"] += 1
            tr.state = TrackingState.LOST
            tr._flag_reset_if_young()
        self._post_track(n_kf_before)
        return tr.T_cw.copy()

    # alias matching the reference method name
    TrackRGBD = track_rgbd

    def activate_localization_mode(self):
        """Reference `System::ActivateLocalizationMode` (`src/System.cc:152`)."""
        self.localization_only = True
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.only_tracking = False

    def reset(self):
        """Reference `System::Reset` -> `Tracking::Reset` (clears map, KF
        database, and tracker state, `src/Tracking.cc:1877-1910`)."""
        from planarslam_tpu.slam.retrieval import KeyFrameDatabase

        self.map = SlamMap(self.cfg)
        self.kf_db = KeyFrameDatabase(self.cfg)  # ref clears the DB too
        self.tracker = Tracking(self.cfg, self.map, kf_db=self.kf_db)
        if self.local_mapper is not None:
            self.local_mapper = LocalMapping(self.cfg, self.map)
        if self.loop_closer is not None:
            from planarslam_tpu.slam.loop_closing import LoopClosing

            self.loop_closer = LoopClosing(self.cfg, self.map,
                                           kf_db=self.kf_db)
        self.timings.clear()
        self._timestamps.clear()
        self._next_backend_kf = 0
        self._backend_kf = None

    def shutdown(self):
        """Drain the tracking pipeline (the reference joins its threads here,
        `src/System.cc:170`)."""
        self.tracker.flush_pending()
        self._run_backend(drain=True)

    def get_tracking_state(self) -> TrackingState:
        return self.tracker.state

    def n_tracked_points(self) -> int:
        return self.tracker.n_inliers

    # ------------------------------------------------------------ trajectory
    def frame_poses_wc(self, flush: bool = True) -> np.ndarray:
        """Per-frame camera-to-world poses chained through reference KFs
        (reference `SaveTrajectoryTUM` semantics, `src/System.cc:192-251`:
        relative pose times the *current* KF estimate, so BA/loop corrections
        propagate to all frames).

        flush=False reads only the already-processed records WITHOUT
        draining the tracking pipeline — for mid-run observers (the live
        viewer) that must not serialize the in-flight frames."""
        if flush:
            self.tracker.flush_pending()
            self._run_backend(drain=True)
        out = []
        for rec in self.tracker.records:
            # culled reference KFs chain through their stored cull-time
            # relative to the nearest valid ancestor (`src/System.cc:208-214`)
            anchor, T_rel = self.map.resolve_kf(int(rec.ref_kf))
            T_rw = T_rel @ self.map.kf_pose[anchor]
            T_cw = rec.T_cr @ T_rw
            out.append(np.linalg.inv(T_cw))
        if not out:
            return np.zeros((0, 4, 4), np.float32)
        return np.asarray(out)

    def save_trajectory_tum(self, path: str) -> None:
        from planarslam_tpu.io.tum import write_trajectory_tum

        ts = [r.timestamp for r in self.tracker.records]
        write_trajectory_tum(path, ts, self.frame_poses_wc())

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        """Reference `SaveKeyFrameTrajectoryTUM` (`src/System.cc:254`)."""
        from planarslam_tpu.io.tum import write_trajectory_tum

        ids = self.map.valid_kf_ids()
        poses = np.asarray([np.linalg.inv(self.map.kf_pose[k]) for k in ids])
        ts = self.map.kf_timestamp[ids]
        write_trajectory_tum(path, ts, poses)

    def save_map(self, path: str) -> None:
        """Serialize the full map (capability the reference stubs as TODO,
        `include/System.h:104-106`)."""
        from planarslam_tpu.slam.serialization import save_map

        self.tracker.flush_pending()
        self._run_backend(drain=True)
        save_map(path, self.map)

    def load_map(self, path: str) -> None:
        """Load a map checkpoint; the tracker restarts LOST and must
        relocalize against it (kidnapped-robot start)."""
        from planarslam_tpu.slam.serialization import load_map
        from planarslam_tpu.slam.tracking import TrackingState

        self.map = load_map(path, self.cfg)
        self.tracker = Tracking(self.cfg, self.map, kf_db=self.kf_db)
        self.tracker.state = TrackingState.LOST
        valid = self.map.valid_kf_ids()
        self.tracker.ref_kf = int(valid[-1]) if len(valid) else 0
        self.tracker.frame_id = int(self.map.kf_frame_id[:self.map.n_kf].max(
            initial=-1)) + 1
        if self.local_mapper is not None:
            self.local_mapper = LocalMapping(self.cfg, self.map)
        if self.loop_closer is not None:
            from planarslam_tpu.slam.loop_closing import LoopClosing

            self.loop_closer = LoopClosing(self.cfg, self.map,
                                           kf_db=self.kf_db)
        # the checkpoint's KFs were backend-processed before the save
        self._next_backend_kf = self.map.n_kf
        self._backend_kf = None

    def save_mesh(self, path: str) -> None:
        """Planar mesh export (reference `System::SaveMesh`,
        `src/System.cc:322` -> `MeshViewer::SaveMeshModel`)."""
        from planarslam_tpu.viz.mesh import save_planar_mesh

        save_planar_mesh(path, self.map)

    # ------------------------------------------------------------- reporting
    def timing_summary(self) -> dict:
        t = np.asarray(self.timings[1:]) if len(self.timings) > 1 else \
            np.asarray(self.timings)
        if len(t) == 0:
            return {"median_s": 0.0, "mean_s": 0.0, "fps": 0.0}
        return {"median_s": float(np.median(t)), "mean_s": float(t.mean()),
                "fps": float(1.0 / np.median(t))}
