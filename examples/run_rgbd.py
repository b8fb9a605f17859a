#!/usr/bin/env python
"""RGB-D SLAM driver — the reference CLI (`Examples/RGB-D/main.cc:15-124`).

Usage (TUM/ICL dataset):
    python examples/run_rgbd.py --settings examples/settings/TUM3.yaml \
        --sequence /data/rgbd_dataset_freiburg3_structure_texture_far \
        --associations associations.txt

Usage (offline synthetic benchmark scene):
    python examples/run_rgbd.py --synthetic 120

Like the reference it loads an association file, feeds RGB-D pairs, prints
median/mean tracking time at exit (`main.cc:108-116`), writes per-stage
timing logs (`total_plp.txt` etc., `src/Tracking.cc:189-198` protocol) and
saves CameraTrajectory.txt / KeyFrameTrajectory.txt / mesh.ply.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", help="reference-style YAML settings file")
    ap.add_argument("--sequence", help="dataset root directory")
    ap.add_argument("--associations", help="TUM associations.txt path")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a dataset")
    ap.add_argument("--realtime", action="store_true",
                    help="sleep to sensor rate like the reference main loop")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--save-mesh", action="store_true")
    ap.add_argument("--save-html", action="store_true",
                    help="write map.html, the self-contained interactive "
                         "3D map viewer (Pangolin-viewer role)")
    ap.add_argument("--view", nargs="?", const=8765, type=int, default=None,
                    metavar="PORT",
                    help="LIVE viewer: serve the interactive map at "
                         "http://127.0.0.1:PORT/ and refresh it as the map "
                         "grows (the reference Viewer's runtime-window role, "
                         "src/Viewer.cc:37-165)")
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device program (throughput mode; "
                         "pose output lags up to 2*chunk frames)")
    ap.add_argument("--scene", default="room", choices=["room", "corridor"],
                    help="synthetic scene (corridor = texture-poor stress)")
    ap.add_argument("--depth-noise", type=float, default=0.0,
                    help="synthetic Kinect noise scale (1.0 = the reference"
                         " sigma(z) model, src/LineExtractor.cpp:1182)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX backend (e.g. cpu to run without "
                         "an accelerator; must be set before first use)")
    ap.add_argument("--save-map", metavar="PATH",
                    help="serialize the final map checkpoint (the "
                         "reference's System::SaveMap TODO)")
    ap.add_argument("--load-map", metavar="PATH",
                    help="start from a map checkpoint (kidnapped-robot "
                         "start: tracker begins LOST and relocalizes)")
    ap.add_argument("--localization", action="store_true",
                    help="localization-only mode: track against the map "
                         "without mutating it (System::ActivateLocalizationMode)")
    args = ap.parse_args()

    if args.platform:
        # must land before any jax backend init; env vars alone are not
        # reliable under site customizations that pre-set jax_platforms
        import jax

        jax.config.update("jax_platforms", args.platform)

    from planarslam_tpu.config import SystemConfig, load_yaml_config
    from planarslam_tpu.slam.system import System

    cfg = load_yaml_config(args.settings) if args.settings else SystemConfig()
    if args.chunk > 1:
        import dataclasses

        cfg = cfg.replace(tracking=dataclasses.replace(
            cfg.tracking, chunk_size=args.chunk))
    slam = System(config=cfg)
    if args.load_map:
        slam.load_map(args.load_map)
    if args.localization:
        slam.activate_localization_mode()

    os.makedirs(args.out_dir, exist_ok=True)
    feature_log = open(os.path.join(args.out_dir, "Feature_plp.txt"), "a")
    track_log = open(os.path.join(args.out_dir, "Track_plp.txt"), "a")
    total_log = open(os.path.join(args.out_dir, "total_plp.txt"), "a")
    # column semantics header (the reference writes bare numbers,
    # `src/Tracking.cc:189-198`; this build's fused pipeline cannot time the
    # split inline every frame, so the Feature column is a SAMPLED blocking
    # extraction measurement re-taken every N frames and replayed between
    # samples — stated here so nobody reads it as a per-frame span)
    feature_log.write(
        f"# extraction-only ms, blocking re-sample every "
        f"{slam.tracker.feature_sample_interval} frames (fused pipeline: "
        f"extraction+tracking is one device program)\n")
    track_log.write("# per-frame tracking dispatch+host ms (measured)\n")
    total_log.write("# per-frame wall ms incl. mapping/loop work (measured)\n")

    if args.synthetic:
        from planarslam_tpu.io import synthetic

        seq = synthetic.make_sequence(
            n_frames=args.synthetic, width=cfg.camera.width,
            height=cfg.camera.height, scene=args.scene,
            kind="corridor" if args.scene == "corridor" else "arc",
            depth_noise=args.depth_noise,
            noise_model="kinect" if args.depth_noise > 0 else "scaled")
        loader = ((seq.timestamps[i],) + seq.render(i)
                  for i in range(len(seq)))
        n_total = len(seq)
        gt = seq.poses_wc
    else:
        if not (args.sequence and args.associations):
            ap.error("need --sequence and --associations (or --synthetic N)")
        from planarslam_tpu.io.tum import load_associations, load_rgbd_frame

        assoc = load_associations(args.associations, root=args.sequence)
        n_total = len(assoc)
        gt = None

        def gen():
            for t, rp, dp in zip(assoc.timestamps, assoc.rgb_paths,
                                 assoc.depth_paths):
                gray, depth = load_rgbd_frame(rp, dp,
                                              cfg.camera.depth_map_factor)
                yield t, gray, depth

        loader = gen()

    viewer = None
    if args.view is not None:
        from planarslam_tpu.viz.live_viewer import LiveViewer

        viewer = LiveViewer(port=args.view)
        print(f"live viewer: {viewer.url}")

    times = []
    last_view_kf = -1
    for i, (t, gray, depth) in enumerate(loader):
        t0 = time.perf_counter()
        slam.track_rgbd(gray, depth, t)
        dt = time.perf_counter() - t0
        times.append(dt)
        total_log.write(f"{dt * 1e3:.3f}\n")
        track_log.write(f"{slam.tracker.last_track_time * 1e3:.3f}\n")
        feature_log.write(f"{slam.tracker.last_feature_time * 1e3:.3f}\n")
        if viewer is not None and slam.map.n_kf != last_view_kf:
            # keyframe cadence: the granularity at which new map content
            # exists (same as the reference MapDrawer's effective refresh).
            # flush=False: a mid-run observer must not drain the pipeline.
            last_view_kf = slam.map.n_kf
            viewer.update(slam.map, trajectory=slam.frame_poses_wc(
                flush=False)[:, :3, 3])
        if i % 30 == 0:
            print(f"frame {i}/{n_total}  {dt * 1e3:.1f} ms  "
                  f"state={slam.get_tracking_state().name}")
        if args.realtime:
            budget = 1.0 / cfg.camera.fps
            if dt < budget:
                time.sleep(budget - dt)

    slam.shutdown()
    if viewer is not None:
        viewer.update(slam.map, trajectory=slam.frame_poses_wc()[:, :3, 3])
    for f in (feature_log, track_log, total_log):
        f.close()

    t = np.asarray(times[1:]) if len(times) > 1 else np.asarray(times)
    print("-------")
    print(f"median tracking time: {np.median(t) * 1e3:.2f} ms")
    print(f"mean tracking time:   {t.mean() * 1e3:.2f} ms")
    st = slam.tracker.stats
    print(f"frames: {st['frames']}  keyframes: {st['kfs']}  "
          f"lost: {st['lost']}  compactions: {slam.compactions}")

    slam.save_trajectory_tum(os.path.join(args.out_dir, cfg.save_path_frame))
    slam.save_keyframe_trajectory_tum(
        os.path.join(args.out_dir, cfg.save_path_keyframe))
    if args.save_mesh:
        slam.save_mesh(os.path.join(args.out_dir, "mesh.ply"))
    if args.save_map:
        slam.save_map(args.save_map)
    if args.save_html:
        from planarslam_tpu.viz.html_viewer import export_map_html

        export_map_html(os.path.join(args.out_dir, "map.html"), slam.map,
                        trajectory=slam.frame_poses_wc()[:, :3, 3])

    if gt is not None:
        from planarslam_tpu.evaluation.ate import ate_rmse

        est = slam.frame_poses_wc()
        n = min(len(est), len(gt))
        print(f"ATE RMSE vs ground truth: "
              f"{ate_rmse(est[:n, :3, 3], gt[:n, :3, 3]):.4f} m")
    if viewer is not None:
        if sys.stdin.isatty():
            print(f"live viewer serving the final map at {viewer.url} — "
                  "Ctrl-C to exit")
            try:
                while True:
                    time.sleep(1)
            except KeyboardInterrupt:
                pass
        viewer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
