"""Benchmark: per-frame tracking throughput on one TPU chip.

Protocol mirrors the reference's self-measurement (`Examples/RGB-D/main.cc:
108-116`: median per-frame tracking time at exit) on the metric sequence
class (640x480 RGB-D structured indoor scene). The TUM/ICL datasets are not
available in this offline image and the C++ reference cannot be built here
(needs OpenCV3+contrib/PCL/Pangolin), so:

  - frames come from the synthetic Manhattan-room renderer (same resolution,
    feature budget, and scene structure class as fr3_structure_texture_far);
  - the baseline denominator is the reference's own real-time operating
    point: 30 fps sensor rate which the reference meets on a desktop i7
    ("real-time performance", README.md:53; Camera.fps=30 in TUM3.yaml) —
    i.e. ~33.3 ms/frame. vs_baseline = our_fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_FRAMES = 96
WARMUP = 5
BASELINE_FPS = 30.0  # reference real-time operating point (see module doc)


def main() -> None:
    from planarslam_tpu.config import SystemConfig
    from planarslam_tpu.evaluation.ate import ate_rmse
    from planarslam_tpu.io import synthetic
    from planarslam_tpu.slam.system import System

    cfg = SystemConfig()
    seq = synthetic.make_sequence(n_frames=N_FRAMES, width=cfg.camera.width,
                                  height=cfg.camera.height)
    # pre-render (host) and quantize to the sensor's native on-disk format:
    # uint8 gray + uint16 depth in 1/depth_map_factor units — exactly what a
    # TUM dataset loader yields (`Examples/RGB-D/main.cc:75` feeds CV_8U/CV_16U)
    factor = cfg.camera.depth_map_factor

    def quantize(gray, depth):
        g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(depth * factor), 0, 65535).astype(np.uint16)
        return g8, d16

    frames = [quantize(*seq.render(i)) for i in range(N_FRAMES)]

    # ---- streaming mode (per-frame pipeline, reference-like latency) ----
    slam = System(config=cfg)
    times, feat_times, track_times = [], [], []
    for i, (gray, depth) in enumerate(frames):
        t0 = time.perf_counter()
        slam.track_rgbd(gray, depth, seq.timestamps[i])
        times.append(time.perf_counter() - t0)
        feat_times.append(slam.tracker.last_feature_time)
        track_times.append(slam.tracker.last_track_time)
    slam.shutdown()

    t = np.asarray(times[WARMUP:])
    stream_median_ms = float(np.median(t) * 1e3)
    stream_fps = 1e3 / stream_median_ms
    est_s = slam.frame_poses_wc()
    ate = ate_rmse(est_s[:, :3, 3], seq.poses_wc[:len(est_s), :3, 3])
    stream_kfs = int(slam.map.n_kf)
    stream_pts = int(slam.map.pt_valid.sum())

    # ---- chunked throughput mode (C frames per device program) ----------
    # The metric of record: full SLAM over the same sequence with the
    # device transactions amortized over CHUNK-frame chunks (pose output
    # lags <= 2*CHUNK frames; ATE is measured on THIS run, proving quality
    # holds). The host<->chip tunnel's per-transaction service time (highly
    # load-dependent, measured 2-60 ms for the SAME program) dominates the
    # ~0.3 ms/frame of actual device compute, so throughput scales with
    # transactions-per-frame, not FLOPs.
    import dataclasses

    CHUNK = 8
    cfg_c = cfg.replace(tracking=dataclasses.replace(cfg.tracking,
                                                     chunk_size=CHUNK))
    slam = System(config=cfg_c)
    times_c = []
    for i, (gray, depth) in enumerate(frames):
        t0 = time.perf_counter()
        slam.track_rgbd(gray, depth, seq.timestamps[i])
        times_c.append(time.perf_counter() - t0)
    slam.shutdown()
    # steady-state throughput: wall time of the LAST 2/3 of the sequence
    # (the first chunk dispatch compiles fused_track_chunk; per-call times
    # alternate between buffering (~0) and dispatch+drain frames, so the
    # windowed MEAN is the meaningful per-frame cost, not the median)
    tc = np.asarray(times_c[N_FRAMES // 3:])
    chunk_ms = float(tc.mean() * 1e3)
    chunk_fps = 1e3 / chunk_ms
    est = slam.frame_poses_wc()
    chunk_ate = ate_rmse(est[:, :3, 3], seq.poses_wc[:len(est), :3, 3])

    # headline: the streaming per-frame pipeline (the reference's own
    # protocol: per-frame tracking latency, `Examples/RGB-D/main.cc:108`);
    # the chunked throughput mode is reported alongside — on this tunnel the
    # per-transaction service time varies 2-60 ms run to run, so whichever
    # mode wins a given run is environment noise, and the streaming number
    # is the apples-to-apples one.
    median_ms = stream_median_ms
    fps = stream_fps

    result = {
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "detail": {
            "mode": "streaming (per-frame pipeline, depth 2)",
            "median_ms_per_frame": round(median_ms, 3),
            "chunked_fps": round(chunk_fps, 2),
            "chunked_mean_ms_per_frame": round(chunk_ms, 3),
            "chunked_ate_rmse_m": round(float(chunk_ate), 5),
            "chunked_mode": f"x{CHUNK} frames per device program, pose "
                            f"latency <= {2 * CHUNK} frames",
            # Feature/Track split protocol (`src/Tracking.cc:189-198`): the
            # fused pipeline runs extraction+tracking as ONE device program,
            # so feature_ms is the CALIBRATED latency of the extraction-only
            # program run standalone (blocking). It can exceed the pipelined
            # per-frame total because depth-2 pipelining hides device
            # latency behind the next frame's dispatch.
            "feature_ms_unpipelined_calibrated": round(
                float(np.median(feat_times[WARMUP:]) * 1e3), 3),
            "median_track_ms": round(
                float(np.median(track_times[WARMUP:]) * 1e3), 3),
            "ate_rmse_m": round(float(ate), 5),
            "n_frames": N_FRAMES,
            "resolution": [cfg.camera.width, cfg.camera.height],
            "keyframes": stream_kfs,
            "map_points": stream_pts,
            "baseline": "reference real-time operating point 30 fps "
                        "(README.md:53, TUM3.yaml Camera.fps)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
