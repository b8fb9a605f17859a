"""Per-frame latency budget of the REAL tracking loop (streaming and
chunked), from the in-tracker stage instrumentation (`Tracking.prof`).

Stages (wall-clock, host timeline):
  pack             host numpy packing of the sensor frame(s)
  upload_dispatch  jnp.asarray of the packed buffer (H2D initiation) +
                   fused_step_inputs bookkeeping
  program_dispatch the fused program dispatch call (async; returns before
                   device executes)
  pull_wait        blocking wait on the lagged bundle's D2H future — the
                   only stage that stalls on the device/tunnel
  bundle_host      numpy bundle processing (associations, stats, KF vote)
  kf_create        keyframe creation incl. the packed feature pull
  backend_kf       retrieval add + local mapping + loop closing per KF
  other            loop time not covered by the stages above (renderer
                   quantization excluded; this is idle/interpreter glue)

Run on the real TPU: `python tools/_profile_frame_budget.py [N_FRAMES]`.
"""

import dataclasses
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def run_mode(frames, timestamps, cfg, label):
    from planarslam_tpu.slam.system import System

    slam = System(config=cfg)
    slam.tracker.prof = defaultdict(list)
    times = []
    t_all0 = time.perf_counter()
    for i, (g, d) in enumerate(frames):
        t0 = time.perf_counter()
        slam.track_rgbd(g, d, timestamps[i])
        times.append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_all0
    prof = slam.tracker.prof
    slam.tracker.prof = None
    slam.shutdown()
    n = len(frames)
    warm = 5
    t = np.asarray(times[warm:])
    stage_ms = {k: float(np.sum(v) / n * 1e3) for k, v in sorted(
        prof.items())}
    covered = sum(float(np.sum(v)) for v in prof.values())
    report = {
        "mode": label,
        "wall_fps": round(n / wall, 2),
        "median_ms": round(float(np.median(t)) * 1e3, 3),
        "mean_ms": round(float(t.mean()) * 1e3, 3),
        "p95_ms": round(float(np.percentile(t, 95)) * 1e3, 3),
        "stage_ms_per_frame": {k: round(v, 3) for k, v in stage_ms.items()},
        "stage_counts": {k: len(v) for k, v in sorted(prof.items())},
        "uncovered_ms_per_frame": round(
            (wall - covered) / n * 1e3, 3),
        "keyframes": int(slam.map.n_kf),
    }
    return report


def main():
    from planarslam_tpu.config import SystemConfig
    from planarslam_tpu.io import synthetic

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = SystemConfig()
    seq = synthetic.make_sequence(n_frames=n_frames, width=cfg.camera.width,
                                  height=cfg.camera.height)
    factor = cfg.camera.depth_map_factor
    frames = []
    for i in range(n_frames):
        g, d = seq.render(i)
        frames.append((np.clip(np.round(g), 0, 255).astype(np.uint8),
                       np.clip(np.round(d * factor), 0,
                               65535).astype(np.uint16)))

    cfg_s = cfg.replace(tracking=dataclasses.replace(cfg.tracking,
                                                     pipeline_depth=4))
    # warm the compile cache with a short run first so stage numbers are
    # steady-state
    r0 = run_mode(frames[:16], seq.timestamps, cfg_s, "warmup")
    print("warmup done", flush=True)
    rs = run_mode(frames, seq.timestamps, cfg_s, "streaming depth-4")
    print(json.dumps(rs, indent=1), flush=True)

    cfg_c = cfg.replace(tracking=dataclasses.replace(cfg.tracking,
                                                     chunk_size=8))
    r0 = run_mode(frames[:32], seq.timestamps, cfg_c, "warmup-chunk")
    print("chunk warmup done", flush=True)
    rc = run_mode(frames, seq.timestamps, cfg_c, "chunked C=8 depth-2")
    print(json.dumps(rc, indent=1), flush=True)


if __name__ == "__main__":
    main()
