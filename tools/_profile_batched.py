"""Aggregate frames/s/chip of BatchedSLAM (B complete SLAM systems, one
vmapped fused step) on the single real chip — the designed answer to a
transaction-bound tunnel is frames-per-transaction, and the batch multiplies
that by B (BASELINE config 5; round-4 VERDICT next-step #5: this axis was
never measured on hardware).

Usage: python tools/_profile_batched.py [B ...]   (default: 4 8)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def run_batched(B: int, n_frames: int = 96):
    from planarslam_tpu.config import SystemConfig
    from planarslam_tpu.evaluation.ate import ate_rmse
    from planarslam_tpu.io import synthetic
    from planarslam_tpu.parallel.replay import BatchedSLAM

    cfg = SystemConfig()
    # B distinct sequences (different seeds/phases of the same scene class)
    seqs = [synthetic.make_sequence(n_frames=n_frames, width=cfg.camera.width,
                                    height=cfg.camera.height, seed=11 + b)
            for b in range(B)]
    factor = cfg.camera.depth_map_factor

    def quantize(gray, depth):
        g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(depth * factor), 0, 65535).astype(np.uint16)
        return g8, d16

    frames = [[quantize(*s.render(i)) for i in range(n_frames)]
              for s in seqs]

    bs = BatchedSLAM(cfg, B)
    t_frames = []
    for i in range(n_frames):
        grays = [frames[b][i][0] for b in range(B)]
        depths = [frames[b][i][1] for b in range(B)]
        ts = np.full(B, float(i) / 30.0)
        t0 = time.perf_counter()
        bs.track(grays, depths, ts)
        t_frames.append(time.perf_counter() - t0)
    # per-sequence trajectories/ATE before shutdown
    ates = []
    for b, s in enumerate(bs.systems):
        est = s.frame_poses_wc()
        ates.append(float(ate_rmse(est[:, :3, 3],
                                   seqs[b].poses_wc[:len(est), :3, 3])))
        s.shutdown()
    warm = 8
    t = np.asarray(t_frames[warm:])
    wall = float(t.sum())
    agg_fps = B * len(t) / wall
    return {
        "B": B,
        "batched_fps_per_chip": round(agg_fps, 2),
        "per_seq_fps": round(agg_fps / B, 2),
        "median_step_ms": round(float(np.median(t)) * 1e3, 3),
        "p95_step_ms": round(float(np.percentile(t, 95)) * 1e3, 3),
        "ate_rmse_m_per_seq": [round(a, 5) for a in ates],
        "lane_stats": bs.stats,
        "n_frames": n_frames,
    }


def main():
    bs = [int(x) for x in sys.argv[1:]] or [4, 8]
    for B in bs:
        r = run_batched(B)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
