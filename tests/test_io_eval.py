"""Tests for config loading, TUM IO, ATE evaluation, synthetic renderer."""

import numpy as np

from planarslam_tpu.config import SystemConfig, load_yaml_config
from planarslam_tpu.evaluation.ate import ate_rmse, align_umeyama
from planarslam_tpu.io import synthetic
from planarslam_tpu.io.tum import (load_associations, read_trajectory_tum,
                                   write_trajectory_tum)


def test_yaml_config_reference_keys(tmp_path):
    yaml = """%YAML:1.0
Camera.fx: 535.4
Camera.fy: 539.2
Camera.cx: 320.1
Camera.cy: 247.6
Camera.width: 640
Camera.height: 480
Camera.bf: 40.0
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
Plane.MinSize: 2000
Plane.AssociationAngRef: 0.985 # 10 degree
Plane.Chi: 100
"""
    p = tmp_path / "settings.yaml"
    p.write_text(yaml)
    cfg = load_yaml_config(str(p))
    assert cfg.camera.fx == 535.4
    assert cfg.orb.n_features == 1000
    assert cfg.planes.min_size == 2000
    assert cfg.planes.assoc_angle == 0.985
    assert cfg.planes.chi == 100.0
    assert abs(cfg.camera.depth_threshold - 40.0 * 40.0 / 535.4) < 1e-6


def test_association_parse(tmp_path):
    txt = "# comment\n1.0 rgb/1.png 1.01 depth/1.png\n2.0 rgb/2.png 2.01 depth/2.png\n"
    p = tmp_path / "assoc.txt"
    p.write_text(txt)
    a = load_associations(str(p))
    assert len(a) == 2
    assert a.rgb_paths[0].endswith("rgb/1.png")
    assert a.timestamps[1] == 2.0


def test_trajectory_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    n = 10
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = Rotation.from_rotvec(rng.normal(0, 0.5, (n, 3))).as_matrix()
    poses[:, :3, 3] = rng.normal(0, 2, (n, 3))
    ts = np.arange(n) * 0.1
    path = str(tmp_path / "traj.txt")
    write_trajectory_tum(path, ts, poses)
    ts2, poses2 = read_trajectory_tum(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(poses2, poses, atol=1e-4)


def test_ate_alignment_invariance(rng):
    from scipy.spatial.transform import Rotation

    gt = rng.normal(0, 2, (50, 3))
    R = Rotation.from_rotvec([0.1, 0.4, -0.2]).as_matrix()
    est = (R @ gt.T).T + np.array([1.0, -2.0, 0.5])
    assert ate_rmse(est, gt) < 1e-6
    noisy = est + rng.normal(0, 0.01, est.shape)
    e = ate_rmse(noisy, gt)
    assert 0.005 < e < 0.02


def test_umeyama_scale(rng):
    gt = rng.normal(0, 1, (40, 3))
    est = gt * 2.0
    R, t, s = align_umeyama(est, gt, with_scale=True)
    assert abs(s - 0.5) < 1e-6


def test_synthetic_render_basic():
    seq = synthetic.make_sequence(n_frames=3, width=160, height=120)
    gray, depth = seq.render(0)
    assert gray.shape == (120, 160) and depth.shape == (120, 160)
    # the room closes around the camera: almost every pixel hits a plane
    assert (depth > 0).mean() > 0.98
    assert 0.3 < depth[depth > 0].min() < depth.max() < 8.0
    # texture has real contrast (FAST needs corners)
    assert gray.std() > 20.0


def test_synthetic_depth_consistency():
    """Back-projected depth from frame i, transformed to world, must lie on
    the known planes (validates renderer geometry end to end)."""
    seq = synthetic.make_sequence(n_frames=2, width=160, height=120)
    gray, depth = seq.render(1)
    fx, fy, cx, cy = seq.fx, seq.fy, seq.cx, seq.cy
    v, u = np.mgrid[0:seq.height:7, 0:seq.width:7]
    z = depth[v, u]
    ok = z > 0
    x = (u[ok] - cx) / fx * z[ok]
    y = (v[ok] - cy) / fy * z[ok]
    pts_c = np.stack([x, y, z[ok]], axis=-1)
    T = seq.poses_wc[1]
    pts_w = (T[:3, :3] @ pts_c.T).T + T[:3, 3]
    # each point should be within 2mm of at least one scene plane
    dists = []
    for pl in seq.planes:
        dists.append(np.abs(pts_w @ pl.normal + pl.d))
    min_dist = np.min(np.stack(dists), axis=0)
    assert np.percentile(min_dist, 99) < 2e-3


def test_tiny_config_shapes():
    cfg = SystemConfig.tiny()
    assert cfg.camera.width == 160 and cfg.camera.height == 120
    assert cfg.orb.max_keypoints == 256


def test_real_dataset_path_end_to_end():
    """load_associations -> load_rgbd_frame -> track_rgbd over the
    checked-in PNG fixture (TUM on-disk formats: 8-bit gray RGB, 16-bit
    depth PNG, reference `Examples/RGB-D/main.cc:75,126-151`): the loader
    must return the native dtypes so the tracker's single-packed-upload
    fast path engages, and tracking must follow the fixture's ground-truth
    trajectory."""
    import os

    from planarslam_tpu.io.tum import load_rgbd_frame
    from planarslam_tpu.slam.device_tracker import pack_frame
    from planarslam_tpu.slam.system import System

    root = os.path.join(os.path.dirname(__file__), "fixtures", "mini_tum")
    assoc = load_associations(os.path.join(root, "associations.txt"))
    assert len(assoc) == 6
    cfg = SystemConfig.tiny()
    gt = np.load(os.path.join(root, "poses_wc.npy"))

    slam = System(config=cfg)
    for t, rp, dp in zip(assoc.timestamps, assoc.rgb_paths,
                         assoc.depth_paths):
        gray, depth = load_rgbd_frame(rp, dp, cfg.camera.depth_map_factor)
        # native dtypes engage the packed single-upload path
        assert gray.dtype == np.uint8 and depth.dtype == np.uint16
        assert pack_frame(gray, depth) is not None
        slam.track_rgbd(gray, depth, t)
    slam.shutdown()
    est = slam.frame_poses_wc()
    assert len(est) == 6
    assert not any(r.lost for r in slam.tracker.records)
    assert ate_rmse(est[:, :3, 3], gt[:len(est), :3, 3]) < 0.05
    # float fallback option still exists for non-standard encodings
    g_f, d_f = load_rgbd_frame(assoc.rgb_paths[0], assoc.depth_paths[0],
                               cfg.camera.depth_map_factor, native=False)
    assert g_f.dtype == np.float32 and d_f.dtype == np.float32
    assert 0.0 < d_f[d_f > 0].min() < d_f.max() < 10.0  # metres


def test_shipped_settings_files_load():
    """The five dataset settings files under examples/settings/ parse and
    carry the published calibrations (reference Examples/RGB-D/*.yaml
    roles): TUM1/2 with real distortion, TUM3 rectified, ICL's negative fy,
    TAMU; per-dataset plane thresholds (ICL MinSize 500 / dist 0.03)."""
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "settings")
    cfgs = {n: load_yaml_config(os.path.join(root, f"{n}.yaml"))
            for n in ("TUM1", "TUM2", "TUM3", "ICL", "TAMU")}
    assert cfgs["TUM1"].camera.k1 != 0.0 and cfgs["TUM1"].camera.k3 != 0.0
    assert cfgs["TUM2"].camera.depth_map_factor == 5208.0
    assert cfgs["TUM3"].camera.fx == 535.4 and cfgs["TUM3"].camera.k1 == 0.0
    assert cfgs["ICL"].camera.fy == -480.0
    assert cfgs["ICL"].planes.min_size == 500
    assert cfgs["ICL"].planes.distance_threshold == 0.03
    assert cfgs["TAMU"].camera.fx == 525.0
    for c in cfgs.values():
        assert c.orb.n_features == 1000 and c.orb.n_levels == 8
        assert c.planes.chi == 100.0
