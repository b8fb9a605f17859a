"""Native mapcore: C++ library builds, matches the numpy fallbacks."""

import numpy as np
import pytest

from planarslam_tpu import native


def test_native_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of mapcore.so failed"


def test_covis_update_matches_numpy(rng):
    n_kf, kp, n_pts = 6, 64, 500
    kf_pt_idx = rng.integers(-1, n_pts, (8, kp)).astype(np.int32)
    kf_valid = np.zeros(8, bool)
    kf_valid[:n_kf] = True
    kf_valid[2] = False
    pt_valid = (rng.uniform(size=n_pts) > 0.2)
    out = native.covis_update(kf_pt_idx, kf_valid, pt_valid, n_kf, 3)
    # independent oracle
    own = kf_pt_idx[3]
    own = own[own >= 0]
    own = np.unique(own[pt_valid[own]])
    for other in range(n_kf):
        if other == 3 or not kf_valid[other]:
            assert out[other] == 0
            continue
        o = kf_pt_idx[other]
        o = o[o >= 0]
        expect = len(np.intersect1d(own, o))
        assert out[other] == expect, (other, out[other], expect)


def test_voxel_merge(rng):
    cap = 128
    cloud = np.zeros((cap, 3), np.float32)
    pts = rng.uniform(0, 1.0, (500, 3)).astype(np.float32)
    n = native.voxel_merge(cloud, 0, pts, leaf=0.25, cap=cap)
    # 4x4x4 voxel grid of unit cube -> at most 64 occupied voxels
    assert 20 <= n <= 64
    # merging the same points again adds nothing new
    n2 = native.voxel_merge(cloud, n, pts, leaf=0.25, cap=cap)
    assert n2 == n


def test_plane_cloud_min_dist(rng):
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    pts[:, 2] = 2.0  # all on plane z = 2
    coeffs = np.array([0.0, 0.0, 1.0, -1.9], np.float64)
    d = native.plane_cloud_min_dist(pts, 200, coeffs)
    assert abs(d - 0.1) < 1e-5


def test_associate_planes_direct_and_tags():
    map_coeffs = np.array([[0, 0, 1, -2.0], [1, 0, 0, -1.0]], np.float64)
    map_valid = np.ones(2, np.uint8).astype(bool)
    clouds = np.zeros((2, 64, 3), np.float32)
    clouds[0, :, 2] = 2.0  # plane 0 cloud at z=2
    clouds[1, :, 0] = 1.0
    cloud_n = np.array([64, 64], np.int32)
    frame = np.array([
        [0, 0, 1, -2.01],   # direct match to plane 0
        [0, 0, 1, -5.0],    # parallel to plane 0, too far for direct
        [0, 1, 0, -3.0],    # perpendicular to both -> vertical tag
    ], np.float64)
    d, p, v = native.associate_planes(frame, map_coeffs, map_valid, clouds,
                                      cloud_n, 0.985, 0.05, 0.087, 0.9962)
    assert d[0] == 0 and p[0] == -1
    assert d[1] == -1 and p[1] == 0
    assert d[2] == -1 and v[2] >= 0
