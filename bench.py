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

N_FRAMES = 60
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

    slam = System(config=cfg)
    times, feat_times, track_times = [], [], []
    for i, (gray, depth) in enumerate(frames):
        t0 = time.perf_counter()
        slam.track_rgbd(gray, depth, seq.timestamps[i])
        times.append(time.perf_counter() - t0)
        feat_times.append(slam.tracker.last_feature_time)
        track_times.append(slam.tracker.last_track_time)

    t = np.asarray(times[WARMUP:])
    median_ms = float(np.median(t) * 1e3)
    fps = 1e3 / median_ms
    est = slam.frame_poses_wc()
    ate = ate_rmse(est[:, :3, 3], seq.poses_wc[:, :3, 3])

    result = {
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "detail": {
            "median_ms_per_frame": round(median_ms, 3),
            "mean_ms_per_frame": round(float(t.mean() * 1e3), 3),
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
            "keyframes": int(slam.map.n_kf),
            "map_points": int(slam.map.pt_valid.sum()),
            "baseline": "reference real-time operating point 30 fps "
                        "(README.md:53, TUM3.yaml Camera.fps)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
