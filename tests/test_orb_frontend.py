"""Tests for FAST scores, keypoint selection, orientation, and rBRIEF."""

import numpy as np
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.ops import fast, image, orb
from planarslam_tpu.ops.frontend import extract_point_features, level_quotas


def naive_fast_score(img: np.ndarray) -> np.ndarray:
    """Reference implementation of the FAST-9/16 'V' score, O(HW*16*9)."""
    h, w = img.shape
    offs = fast.CIRCLE_OFFSETS
    score = np.zeros((h, w), np.float32)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            d = np.array([img[y + dy, x + dx] - c for dy, dx in offs])
            best = 0.0
            ring = np.concatenate([d, d[:8]])
            for s in range(16):
                arc = ring[s:s + 9]
                best = max(best, arc.min(), (-arc).min())
            score[y, x] = max(best, 0.0)
    return score


def test_fast_score_matches_naive(rng):
    img = rng.uniform(0, 255, (24, 24)).astype(np.float32)
    ours = np.asarray(fast.fast_score(jnp.asarray(img)))
    ref = naive_fast_score(img)
    np.testing.assert_allclose(ours[3:-3, 3:-3], ref[3:-3, 3:-3], atol=1e-4)


def test_fast_detects_synthetic_corner():
    img = np.full((32, 32), 50.0, np.float32)
    img[10:, 12:] = 200.0  # L-corner at (10, 12)
    score = np.asarray(fast.fast_score(jnp.asarray(img)))
    y, x = np.unravel_index(score.argmax(), score.shape)
    assert abs(y - 10) <= 2 and abs(x - 12) <= 2
    assert score.max() > 100


def test_select_keypoints_uniform_and_ranked(rng):
    score = np.zeros((64, 96), np.float32)
    # plant corners in three tiles with distinct strengths
    pts = [(30, 30, 50.0), (30, 70, 80.0), (50, 40, 60.0), (40, 80, 70.0)]
    for y, x, s in pts:
        score[y, x] = s
    uv, resp, valid = fast.select_keypoints(jnp.asarray(score), tile=32,
                                            k_total=8, min_score=7.0, border=3)
    uv, resp, valid = map(np.asarray, (uv, resp, valid))
    assert valid.sum() == 4
    got = {(int(v), int(u)) for (u, v) in uv[valid]}
    assert got == {(y, x) for y, x, _ in pts}
    # ranked by response
    assert resp[0] == 80.0


def test_level_quotas_sum():
    q = level_quotas(1000, 8, 1.2)
    assert sum(q) == 1000
    assert q[0] > q[-1] > 0


def test_orientation_rotates(rng):
    """A patch with a strong gradient direction: rotating the image by 90°
    must rotate the measured orientation by ~90°."""
    img = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (64, 1))  # grad +x
    uv = jnp.asarray(np.array([[32.0, 32.0]], np.float32))
    valid = jnp.asarray(np.array([True]))
    a1 = float(np.asarray(orb.orientations(jnp.asarray(img), uv, valid))[0])
    a2 = float(np.asarray(orb.orientations(jnp.asarray(img.T.copy()), uv, valid))[0])
    assert abs(a1 - 0.0) < 0.05  # centroid along +x
    assert abs(a2 - np.pi / 2) < 0.05


def test_descriptor_rotation_invariance():
    """Same texture rotated 90°: steered BRIEF distance must be much smaller
    than the random-descriptor baseline (~128)."""
    rng = np.random.default_rng(0)
    base = np.kron(rng.uniform(0, 255, (16, 16)), np.ones((4, 4))).astype(np.float32)
    img = np.pad(base, 32, mode="edge")
    rot = np.rot90(img).copy()  # 90° CCW
    h, w = img.shape
    uv1 = jnp.asarray(np.array([[w / 2.0, h / 2.0]], np.float32))
    valid = jnp.asarray(np.array([True]))

    b1 = image.blur(jnp.asarray(img))
    b2 = image.blur(jnp.asarray(rot))
    a1 = orb.orientations(jnp.asarray(img), uv1, valid)
    a2 = orb.orientations(jnp.asarray(rot), uv1, valid)
    d1 = orb.descriptors(b1, uv1, a1, valid)
    d2 = orb.descriptors(b2, uv1, a2, valid)
    dist_rot = int(np.asarray(orb.hamming_distance(d1, d2))[0, 0])

    rng2 = np.random.default_rng(1)
    other = np.pad(np.kron(rng2.uniform(0, 255, (16, 16)),
                           np.ones((4, 4))).astype(np.float32), 32, mode="edge")
    d3 = orb.descriptors(image.blur(jnp.asarray(other)), uv1,
                         orb.orientations(jnp.asarray(other), uv1, valid), valid)
    dist_rand = int(np.asarray(orb.hamming_distance(d1, d3))[0, 0])
    assert dist_rot < 60 < dist_rand


def test_pack_bits_roundtrip(rng):
    bits = rng.integers(0, 2, (5, 256)).astype(bool)
    packed = np.asarray(orb.pack_bits(jnp.asarray(bits)))
    unpacked = np.zeros((5, 256), bool)
    for k in range(8):
        for j in range(32):
            unpacked[:, 32 * k + j] = (packed[:, k] >> j) & 1
    np.testing.assert_array_equal(unpacked, bits)


def test_hamming_distance_oracle(rng):
    a = rng.integers(0, 2 ** 32, (7, 8), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, (9, 8), dtype=np.uint32)
    ours = np.asarray(orb.hamming_distance(jnp.asarray(a), jnp.asarray(b)))
    ref = np.zeros((7, 9), np.int32)
    for i in range(7):
        for j in range(9):
            ref[i, j] = sum(bin(int(x) ^ int(y)).count("1")
                            for x, y in zip(a[i], b[j]))
    np.testing.assert_array_equal(ours, ref)


def test_frontend_end_to_end_synthetic():
    cfg = SystemConfig.tiny()
    seq = synthetic.make_sequence(n_frames=1, width=cfg.camera.width,
                                  height=cfg.camera.height)
    gray, depth = seq.render(0)
    feats = extract_point_features(jnp.asarray(gray), jnp.asarray(depth),
                                   cfg.camera, cfg.orb)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 60  # corner-rich scene yields plenty of keypoints
    uv = np.asarray(feats.uv)[valid]
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] < cfg.camera.width).all()
    d = np.asarray(feats.depth)[valid]
    assert (d > 0).mean() > 0.9  # synthetic depth is dense
    ur = np.asarray(feats.u_right)[valid]
    has = d > 0
    np.testing.assert_allclose(ur[has], uv[has, 0] - cfg.camera.bf / d[has],
                               atol=1e-3)
    # determinism
    feats2 = extract_point_features(jnp.asarray(gray), jnp.asarray(depth),
                                    cfg.camera, cfg.orb)
    np.testing.assert_array_equal(np.asarray(feats.desc), np.asarray(feats2.desc))


def test_frontend_depth_unprojection_consistency():
    """Unprojected keypoints must lie on the scene planes (front end geometry
    is metrically correct)."""
    cfg = SystemConfig.tiny()
    seq = synthetic.make_sequence(n_frames=1, width=cfg.camera.width,
                                  height=cfg.camera.height)
    gray, depth = seq.render(0)
    feats = extract_point_features(jnp.asarray(gray), jnp.asarray(depth),
                                   cfg.camera, cfg.orb)
    valid = np.asarray(feats.valid) & (np.asarray(feats.depth) > 0)
    uv = np.asarray(feats.uv)[valid]
    z = np.asarray(feats.depth)[valid]
    cam = cfg.camera
    x = (uv[:, 0] - cam.cx) / cam.fx * z
    y = (uv[:, 1] - cam.cy) / cam.fy * z
    pts = np.stack([x, y, z], -1)  # camera frame == world frame at frame 0
    dists = np.min(np.stack([np.abs(pts @ p.normal + p.d)
                             for p in seq.planes]), axis=0)
    assert np.percentile(dists, 90) < 0.02
