"""Batched multi-sequence replay — the multi-chip scaling axis.

The reference is a single-process system; its only scaling story is thread
pools (SURVEY.md §2 parallelism table). The TPU-native scaling axis is
batch-of-sequences (BASELINE config 5: 8 TUM+ICL replays in parallel): every
per-frame kernel carries a leading batch dimension via vmap, and the batch is
sharded across chips with jax.sharding — XLA inserts the (trivially
data-parallel) collectives, ICI-only.

`make_batched_frame_step` builds the jitted, mesh-sharded device step used
by both the multi-sequence replayer and the driver's multichip dry-run:
fused frontend extraction + Manhattan tracking + pose optimization for B
frames at once, B sharded over the 'seq' mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.ops import manhattan as manhattan_ops
from planarslam_tpu.slam.frame import extract_frame
from planarslam_tpu.solvers import pose_opt


def make_mesh(n_devices: Optional[int] = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _single_frame_step(gray, depth, T_init, R_cm_prev, prev_pts_w, prev_desc,
                       prev_valid, cfg: SystemConfig):
    """One sequence's device-side frame step: extract + Manhattan + match +
    pose-optimize. Host-side policy (keyframes, map growth) stays per
    sequence on the host; this is the dense compute slab."""
    from planarslam_tpu.ops import matching

    feats = extract_frame(gray, depth, cfg)
    manh = manhattan_ops.track_manhattan_frame(
        R_cm_prev, feats.normals, feats.normals_valid,
        cone_sin=cfg.manhattan.cone_sin_track,
        kernel=cfg.manhattan.mean_shift_kernel,
        min_support=cfg.manhattan.min_axis_support)
    res = matching.search_by_projection(
        prev_pts_w, prev_desc, prev_valid, T_init,
        feats.points.uv, feats.points.desc, feats.points.level,
        feats.points.valid, feats.points.u_right,
        K=(cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy),
        image_wh=(float(cfg.camera.width), float(cfg.camera.height)),
        bf=cfg.camera.bf, scale_factor=cfg.orb.scale_factor,
        radius=15.0, max_dist=cfg.matcher.th_high,
        level_window=cfg.orb.n_levels)
    k = cfg.orb.max_keypoints
    matched = res.idx >= 0
    fi = jnp.clip(res.idx, 0, k - 1)
    uv_o = feats.points.uv[fi]
    ur_o = feats.points.u_right[fi]
    obs = pose_opt.PointObs(
        xw=prev_pts_w, uv=uv_o,
        u_right=jnp.where(matched, ur_o, -1.0),
        inv_sigma2=jnp.ones((k,), jnp.float32),
        valid=matched)
    result = pose_opt.pose_optimize(
        T_init, (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy),
        cfg.camera.bf, points=obs,
        weights=pose_opt.PoseOptWeights.from_config(cfg.planes))
    return result.T_cw, manh.R_cm, feats, result.n_point_inliers


def make_batched_frame_step(cfg: SystemConfig, mesh: Mesh, axis: str = "seq"):
    """Build the jitted multi-sequence step with batch sharded over `mesh`.

    Returns (step_fn, shard_batch) where step_fn(gray (B,H,W), depth,
    T_init (B,4,4), R_cm (B,3,3), prev_pts_w (B,K,3), prev_desc (B,K,8),
    prev_valid (B,K)) -> (T_cw (B,4,4), R_cm (B,3,3), n_inliers (B,)).
    """
    vstep = jax.vmap(partial(_single_frame_step, cfg=cfg))

    def step(gray, depth, T_init, R_cm, pts_w, desc, valid):
        T, R, feats, n_in = vstep(gray, depth, T_init, R_cm, pts_w, desc,
                                  valid)
        return T, R, n_in

    batch_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    jitted = jax.jit(
        step,
        in_shardings=(batch_sharding,) * 7,
        out_shardings=(batch_sharding, batch_sharding, batch_sharding))

    def shard_batch(x):
        return jax.device_put(x, batch_sharding)

    return jitted, shard_batch


def run_batched_replay(sequences, cfg: SystemConfig,
                       mesh: Optional[Mesh] = None) -> np.ndarray:
    """Replay B synthetic sequences in parallel (visual odometry over the
    previous frame's unprojected features). Returns (B, N, 4, 4) estimated
    T_cw trajectories."""
    from planarslam_tpu.slam.frame import unproject_points

    B = len(sequences)
    n = min(len(s) for s in sequences)
    if mesh is None:
        mesh = make_mesh(min(B, len(jax.devices())))
    step, shard = make_batched_frame_step(cfg, mesh)
    k = cfg.orb.max_keypoints

    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    R_cm = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    pts_w = np.zeros((B, k, 3), np.float32)
    desc = np.zeros((B, k, 8), np.uint32)
    valid = np.zeros((B, k), bool)
    out = np.zeros((B, n, 4, 4), np.float32)

    vextract = jax.jit(jax.vmap(partial(extract_frame, cfg=cfg)))
    for i in range(n):
        grays = np.stack([s.render(i)[0] for s in sequences])
        depths = np.stack([s.render(i)[1] for s in sequences])
        if i == 0:
            feats = vextract(shard(jnp.asarray(grays)),
                             shard(jnp.asarray(depths)))
        else:
            T_j, R_j, n_in = step(shard(jnp.asarray(grays)),
                                  shard(jnp.asarray(depths)),
                                  shard(jnp.asarray(T)),
                                  shard(jnp.asarray(R_cm)),
                                  shard(jnp.asarray(pts_w)),
                                  shard(jnp.asarray(desc)),
                                  shard(jnp.asarray(valid)))
            T = np.asarray(T_j)
            R_cm = np.asarray(R_j)
            feats = vextract(shard(jnp.asarray(grays)),
                             shard(jnp.asarray(depths)))
        out[:, i] = T
        # prepare next-frame references on host (per sequence)
        for b in range(B):
            fb = jax.tree.map(lambda x: x[b], feats)
            T_wc = np.linalg.inv(T[b])
            pts_w[b] = unproject_points(fb.points, cfg, T_wc)
            desc[b] = np.asarray(fb.points.desc)
            valid[b] = (np.asarray(fb.points.valid)
                        & (np.asarray(fb.points.depth) > 0))
    return out


class BatchedSLAM:
    """B COMPLETE SLAM systems over one device mesh — full per-sequence
    tracking state machines, keyframing, local mapping and loop closing on
    the host; the per-frame dense compute (frontend + Manhattan + two-stage
    pose optimization + window matching) for all B sequences runs as ONE
    vmapped `fused_track_step` program with the batch axis sharded over the
    mesh (BASELINE config 5's "8 TUM+ICL replays in parallel" workload —
    round 1 shipped frame-to-frame VO only, VERDICT weak #6).

    Host policy is per-sequence Python (exactly the single-sequence code:
    System/Tracking/LocalMapping/LoopClosing instances); sequences that are
    initializing or relocalizing fall back to their own host path for that
    frame and rejoin the batch when fused tracking resumes.
    """

    def __init__(self, cfg: SystemConfig, n_sequences: int,
                 mesh: Optional[Mesh] = None, axis: str = "seq"):
        from planarslam_tpu.slam.system import System

        self.cfg = cfg
        self.B = n_sequences
        self.axis = axis
        self.mesh = mesh if mesh is not None else make_mesh(
            min(n_sequences, len(jax.devices())), axis=axis)
        self.systems = [System(config=cfg) for _ in range(n_sequences)]
        self._vstep = None
        # observability: how many frames rode the fused batch vs host path
        self.stats = {"fused_lane_frames": 0, "host_lane_frames": 0,
                      "padded_lane_frames": 0}

    def _build_vstep(self):
        from planarslam_tpu.slam.device_tracker import fused_track_step

        cfg = self.cfg

        def one(gray, depth, T_ovr, use_ovr, R_wm, manh_on, state, win, w):
            return fused_track_step(gray, depth, T_ovr, use_ovr, R_wm,
                                    manh_on, state, win, w, cfg)

        sh_batch = NamedSharding(self.mesh, P(self.axis))
        # every input/output leaf carries a leading batch dim -> shard it
        self._vstep = jax.jit(jax.vmap(one), in_shardings=sh_batch,
                              out_shardings=sh_batch)

    def track(self, grays, depths, timestamps) -> np.ndarray:
        """One frame for every sequence. grays/depths: (B, H, W) arrays (or
        per-sequence lists); timestamps: (B,). Returns (B, 4, 4) poses."""
        from planarslam_tpu.slam.tracking import TrackingState

        poses = np.zeros((self.B, 4, 4), np.float32)
        fused, host = [], []
        for b, s in enumerate(self.systems):
            tr = s.tracker
            if (tr.state == TrackingState.OK
                    and tr._fused_state is not None):
                fused.append(b)
            else:
                host.append(b)
        # initializing / lost sequences: their own host path this frame
        for b in host:
            poses[b] = self.systems[b].track_rgbd(
                grays[b], depths[b], float(timestamps[b]))
        if not fused:
            return poses
        # batched fused step: stack the B trackers' inputs and run the
        # single sharded program. The batch is ALWAYS padded to B lanes —
        # a sequence dropping into reloc/init must not change the traced
        # batch size, or the full fused step re-jits mid-replay (multi-
        # second compiles, round-3 VERDICT weak #4). Inactive lanes simply
        # replay a ready lane's inputs (the step is pure; their outputs
        # are dropped).
        args = []
        for b in fused:
            tr = self.systems[b].tracker
            tr._last_depth = np.asarray(depths[b])
            args.append(tr.fused_step_inputs(grays[b], depths[b]))
        self.stats["fused_lane_frames"] += len(fused)
        self.stats["host_lane_frames"] += len(host)
        self.stats["padded_lane_frames"] += self.B - len(fused)
        while len(args) < self.B:
            args.append(args[len(args) % len(fused)])
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *args)
        if self._vstep is None:
            self._build_vstep()
        # commit inputs to the batch sharding (the stack above lands on the
        # default device; jit's in_shardings requires a matching placement)
        stacked = jax.device_put(
            stacked, NamedSharding(self.mesh, P(self.axis)))
        res = self._vstep(*stacked)
        # the packed bundle carries int32 fields BITCAST to float32 (-1
        # sentinels are NaN payloads); an eager per-lane device slice
        # canonicalizes those NaNs on TPU (measured: 0xFFFFFFFF ->
        # 0x7FC00000, turning "unmatched" into a garbage index) — and costs
        # B separate D2H pulls besides. Pull the whole (B, bundle) array
        # ONCE (transfers are bit-exact) and hand each tracker its numpy
        # row; only the carried device state is lane-sliced (its int fields
        # are real int dtypes, which slicing never canonicalizes).
        packed_np = np.asarray(res.packed)
        for i, b in enumerate(fused):
            res_b = res._replace(
                packed=packed_np[i],
                new_state=jax.tree.map(lambda x: x[i], res.new_state))
            poses[b] = self.systems[b].submit_fused_result(
                res_b, float(timestamps[b]))
        return poses

    def run(self, sequences, timestamps: Optional[np.ndarray] = None
            ) -> np.ndarray:
        """Replay B sequences end-to-end; returns (B, N, 4, 4) T_cw."""
        n = min(len(s) for s in sequences)
        out = np.zeros((self.B, n, 4, 4), np.float32)
        for i in range(n):
            grays = [s.render(i)[0] for s in sequences]
            depths = [s.render(i)[1] for s in sequences]
            ts = (timestamps[:, i] if timestamps is not None
                  else np.full(self.B, float(i) / 30.0))
            out[:, i] = self.track(grays, depths, ts)
        for s in self.systems:
            s.shutdown()
        return out
