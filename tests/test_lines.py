"""Tests for line detection, descriptors, 3D lifting, and matching."""

import numpy as np
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.ops import lines


def _draw_segment(img, p0, p1, value):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) * 2 + 1
    for t in np.linspace(0, 1, n):
        x = p0[0] + t * (p1[0] - p0[0])
        y = p0[1] + t * (p1[1] - p0[1])
        xi, yi = int(round(x)), int(round(y))
        img[max(yi - 1, 0):yi + 2, max(xi - 1, 0):xi + 2] = value


def _point_line_dist(p, a, b):
    d = b - a
    t = np.clip(np.dot(p - a, d) / np.dot(d, d), 0, 1)
    return np.linalg.norm(p - (a + t * d))


def test_detect_lines_synthetic_segments():
    cfg = SystemConfig.tiny()
    img = np.full((120, 160), 40.0, np.float32)
    segs = [((20.0, 20.0), (140.0, 30.0)),
            ((30.0, 100.0), (120.0, 60.0)),
            ((80.0, 15.0), (85.0, 110.0))]
    for p0, p1 in segs:
        _draw_segment(img, p0, p1, 220.0)
    uv_s, uv_e, l_eq, ang, resp, valid = lines.detect_lines(
        jnp.asarray(img), cfg.lines)
    uv_s, uv_e, valid = map(np.asarray, (uv_s, uv_e, valid))
    found = 0
    for p0, p1 in segs:
        a, b = np.array(p0), np.array(p1)
        for i in np.where(valid)[0]:
            s, e = uv_s[i], uv_e[i]
            # both detected endpoints near the gt segment, similar length
            if (_point_line_dist(s, a, b) < 6 and _point_line_dist(e, a, b) < 6
                    and abs(np.linalg.norm(e - s) - np.linalg.norm(b - a)) < 0.45 * np.linalg.norm(b - a)):
                found += 1
                break
    assert found == len(segs), f"only {found}/{len(segs)} segments recovered"
    # line equation sanity: endpoints lie on their own line
    for i in np.where(valid)[0]:
        le = np.asarray(l_eq)[i]
        for p in (uv_s[i], uv_e[i]):
            assert abs(le[0] * p[0] + le[1] * p[1] + le[2]) < 1e-3


def test_line_descriptors_discriminative():
    """Structurally different lines (step edge up, step edge down, ridge)
    must produce distinguishable band descriptors; identical structure must
    match. (Amplitude alone is intentionally not discriminative — L2
    normalization — matching real LBD behavior.)"""
    img = np.full((120, 160), 40.0, np.float32)
    img[:30, :] = 200.0       # step edge at y=30 (bright above)
    img[90:, :] = 200.0       # step edge at y=90 (bright below)
    _draw_segment(img, (10.0, 60.0), (150.0, 60.0), 220.0)  # ridge at y=60
    uv_s = jnp.asarray(np.array([[10, 30], [10, 90], [10, 60]], np.float32))
    uv_e = jnp.asarray(np.array([[150, 30], [150, 90], [150, 60]], np.float32))
    valid = jnp.asarray(np.ones(3, bool))
    d = np.asarray(lines.line_descriptors(jnp.asarray(img), uv_s, uv_e, valid))
    sim = d @ d.T
    assert sim[0, 0] > 0.99
    assert sim[0, 1] < 0.9  # opposite-polarity edges differ
    assert sim[0, 2] < 0.95 and sim[1, 2] < 0.95  # edge vs ridge differ


def test_lift_lines_3d_straightness():
    """Lines on the synthetic planes must lift to straight 3D segments on
    the planes."""
    cfg = SystemConfig.tiny()
    seq = synthetic.make_sequence(n_frames=1, width=cfg.camera.width,
                                  height=cfg.camera.height)
    gray, depth = seq.render(0)
    feats = lines.extract_line_features(jnp.asarray(gray), jnp.asarray(depth),
                                        cfg.camera, cfg.lines)
    valid = np.asarray(feats.valid)
    has3d = np.asarray(feats.has_3d)
    assert valid.sum() >= 4  # blocky texture yields many segments
    assert (has3d & valid).sum() >= 3
    ps = np.asarray(feats.p3d_s)
    pe = np.asarray(feats.p3d_e)
    for i in np.where(has3d & valid)[0]:
        a, b = ps[i], pe[i]
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert 0.2 < a[2] < 10 and 0.2 < b[2] < 10
        # 3D endpoints must reproject onto the *infinite* 2D line (the 3D
        # segment may be a sub-extent of the 2D one where depth was rejected);
        # this is exactly the EdgeLine residual property the optimizer uses
        le = np.asarray(feats.line2d)[i]
        for p in (a, b):
            u = cfg.camera.fx * p[0] / p[2] + cfg.camera.cx
            v = cfg.camera.fy * p[1] / p[2] + cfg.camera.cy
            assert abs(le[0] * u + le[1] * v + le[2]) < 4.0


def test_match_lines_across_frames():
    cfg = SystemConfig.tiny()
    seq = synthetic.make_sequence(n_frames=30, width=cfg.camera.width,
                                  height=cfg.camera.height)
    g0, d0 = seq.render(0)
    g1, d1 = seq.render(1)
    f0 = lines.extract_line_features(jnp.asarray(g0), jnp.asarray(d0),
                                     cfg.camera, cfg.lines)
    f1 = lines.extract_line_features(jnp.asarray(g1), jnp.asarray(d1),
                                     cfg.camera, cfg.lines)
    idx, sim = lines.match_lines(f0.desc, f1.desc, f0.valid, f1.valid,
                                 f0.angle, f1.angle)
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() >= 3
    # matched segments should be nearby in the image (small motion)
    m0 = 0.5 * (np.asarray(f0.uv_s) + np.asarray(f0.uv_e))
    m1 = 0.5 * (np.asarray(f1.uv_s) + np.asarray(f1.uv_e))
    d = np.linalg.norm(m0[matched] - m1[idx[matched]], axis=1)
    assert np.median(d) < 20.0
