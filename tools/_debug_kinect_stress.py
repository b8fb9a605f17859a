"""Reproduce + bisect the 640x480 Kinect-noise stress failure
(BENCH_r03: kinect_noise_ate_m 0.264, 18 lost of 48 — round-3 VERDICT
weak #2 / next-step #2).

Runs the bench's exact stress configuration with per-frame diagnostics:
tracking state, inlier counts, Manhattan success, KF cadence. Optional
resolution override to find the smallest frame size that reproduces.

  python tools/_debug_kinect_stress.py [--res 640x480] [--frames 48]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="640x480")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import os

        os.environ["JAX_PLATFORMS"] = args.platform

    from planarslam_tpu.config import SystemConfig
    from planarslam_tpu.evaluation.ate import ate_rmse
    from planarslam_tpu.io import synthetic
    from planarslam_tpu.slam.system import System

    w, h = (int(x) for x in args.res.split("x"))
    if (w, h) == (640, 480):
        cfg = SystemConfig()
    else:
        cfg = SystemConfig.tiny(height=h, width=w)
    seq = synthetic.make_sequence(n_frames=args.frames, width=w, height=h,
                                  depth_noise=1.0, noise_model="kinect")
    factor = cfg.camera.depth_map_factor

    slam = System(config=cfg)
    tr = slam.tracker
    for i in range(len(seq)):
        g, d = seq.render(i)
        g8 = np.clip(np.round(g), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(d * factor), 0, 65535).astype(np.uint16)
        slam.track_rgbd(g8, d16, seq.timestamps[i])
        print(f"f{i:03d} state={tr.state.name:8s} inl={tr.n_inliers:4d} "
              f"manh={int(tr.manhattan_ok)} kfs={slam.map.n_kf} "
              f"pts={int(slam.map.pt_valid.sum())} "
              f"pls={int(slam.map.pl_valid.sum())}", flush=True)
    slam.shutdown()
    est = slam.frame_poses_wc()
    ate = ate_rmse(est[:, :3, 3], seq.poses_wc[:len(est), :3, 3])
    print(f"ATE {float(ate):.4f} m  lost={tr.stats['lost']} "
          f"reloc={tr.stats.get('relocalizations', 0)}")


if __name__ == "__main__":
    main()
