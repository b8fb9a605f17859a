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


def test_match_lines_mad_adaptive_gate():
    """Globally-shifted texture statistics (contrast compression, blur,
    gain) move EVERY descriptor similarity down together; a fixed 0.75
    gate then starves while the reference's per-frame MAD-derived
    threshold keeps matching (`src/Frame.cc:269-293` lineDescriptorMAD,
    consumed at `src/LSDmatcher.cpp:224-233`). Construct a frame pair
    whose true-pair sims sit at ~0.6 with tight dispersion: the fixed
    gate rejects all of them, the adaptive gate retains them."""
    rng = np.random.default_rng(5)
    n, D = 24, 72
    base = rng.normal(size=(n, D))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.normal(size=(n, D))
    noise -= (noise * base).sum(1, keepdims=True) * base  # orthogonal
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    target_sim = 0.60 + rng.uniform(-0.02, 0.02, n)  # tight cluster < 0.75
    shifted = (target_sim[:, None] * base
               + np.sqrt(1 - target_sim[:, None] ** 2) * noise)
    angles = rng.uniform(0, np.pi, n)
    valid = np.ones(n, bool)

    idx, sim = lines.match_lines(
        jnp.asarray(base, jnp.float32), jnp.asarray(shifted, jnp.float32),
        jnp.asarray(valid), jnp.asarray(valid),
        jnp.asarray(angles, jnp.float32), jnp.asarray(angles, jnp.float32))
    idx = np.asarray(idx)
    hit = idx == np.arange(n)
    assert hit.sum() >= n - 4, f"adaptive gate retained only {hit.sum()}/{n}"
    # sanity: every accepted sim really is below the old fixed gate
    assert float(np.asarray(sim)[hit].max()) < 0.75

    # the projection search applies the same adaptive rule: identical
    # geometry (map lines == frame segments), globally compressed sims
    sw = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sw[:, 2] = rng.uniform(2.0, 3.0, n)
    ew = sw + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    ew[:, 2] = sw[:, 2]
    K = (300.0, 300.0, 80.0, 60.0)
    fx, fy, cx, cy = K

    def project(p):
        return np.stack([fx * p[:, 0] / p[:, 2] + cx,
                         fy * p[:, 1] / p[:, 2] + cy], -1)

    uv_s, uv_e = project(sw), project(ew)
    ang = np.mod(np.arctan2(uv_e[:, 1] - uv_s[:, 1],
                            uv_e[:, 0] - uv_s[:, 0]), np.pi)
    on = ((uv_s > 0) & (uv_s < [160, 120])).all(1) \
        & ((uv_e > 0) & (uv_e < [160, 120])).all(1)
    midx, msim = lines.search_lines_by_projection(
        jnp.asarray(sw), jnp.asarray(ew),
        jnp.asarray(base, jnp.float32), jnp.asarray(valid),
        jnp.asarray(np.eye(4, dtype=np.float32)),
        jnp.asarray(uv_s.astype(np.float32)),
        jnp.asarray(uv_e.astype(np.float32)),
        jnp.asarray(ang.astype(np.float32)),
        jnp.asarray(shifted, jnp.float32), jnp.asarray(valid),
        K=K, image_wh=(160.0, 120.0))
    midx = np.asarray(midx)
    got = (midx == np.arange(n)) & on
    assert got.sum() >= 0.8 * on.sum()


def test_line_triangulation_two_view():
    """mapping_step's line triangulation (CreateNewMapLines2,
    `src/LocalMapping.cc:800`): a 3D segment observed in two views with NO
    depth lift is recovered by intersecting the first view's endpoint rays
    with the second view's back-projection plane."""
    import jax.numpy as jnp

    from planarslam_tpu.config import SystemConfig
    from planarslam_tpu.geometry import se3
    from planarslam_tpu.slam.device_mapper import (MappingLayout, N_NEIGHBORS,
                                                   mapping_step)

    cfg = SystemConfig.tiny()
    cam = cfg.camera
    Kp = cfg.orb.max_keypoints
    L = cfg.lines.max_lines
    D = cfg.lines.desc_dim
    rng = np.random.default_rng(3)

    # ground-truth 3D segments in front of both cameras
    n_ln = 4
    sw = np.stack([rng.uniform(-0.6, 0.6, n_ln), rng.uniform(-0.4, 0.4, n_ln),
                   rng.uniform(2.5, 4.0, n_ln)], axis=1).astype(np.float32)
    d = rng.normal(0, 1, (n_ln, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ew = sw + 0.8 * d

    T1 = np.eye(4, dtype=np.float32)
    xi = np.array([0.25, 0.02, 0.0, 0.0, 0.06, 0.0], np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray(xi))).astype(np.float32)

    def project(T, X):
        pc = X @ T[:3, :3].T + T[:3, 3]
        u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
        v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
        return np.stack([u, v], axis=1)

    def line_eq(uv_s, uv_e):
        h1 = np.concatenate([uv_s, np.ones((len(uv_s), 1))], axis=1)
        h2 = np.concatenate([uv_e, np.ones((len(uv_e), 1))], axis=1)
        l = np.cross(h1, h2)
        return (l / np.linalg.norm(l[:, :2], axis=1, keepdims=True)
                ).astype(np.float32)

    uvs1, uve1 = project(T1, sw), project(T1, ew)
    uvs2, uve2 = project(T2, sw), project(T2, ew)

    def pad_lines(uv_s, uv_e):
        o_uvs = np.zeros((L, 2), np.float32)
        o_uve = np.zeros((L, 2), np.float32)
        o_l2d = np.zeros((L, 3), np.float32)
        o_ang = np.zeros(L, np.float32)
        o_desc = np.zeros((L, D), np.float32)
        o_free = np.zeros(L, bool)
        o_uvs[:n_ln] = uv_s
        o_uve[:n_ln] = uv_e
        o_l2d[:n_ln] = line_eq(uv_s, uv_e)
        o_ang[:n_ln] = np.mod(np.arctan2(uv_e[:, 1] - uv_s[:, 1],
                                         uv_e[:, 0] - uv_s[:, 0]), np.pi)
        # shared random unit descriptors -> perfect matches
        o_free[:n_ln] = True
        return o_uvs, o_uve, o_l2d, o_ang, o_desc, o_free

    o1 = pad_lines(uvs1, uve1)
    o2 = pad_lines(uvs2, uve2)
    descs = rng.normal(0, 1, (n_ln, D)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    o1[4][:n_ln] = descs
    o2[4][:n_ln] = descs

    NB = N_NEIGHBORS
    z_uv = np.zeros((Kp, 2), np.float32)
    z_desc = np.zeros((Kp, 8), np.uint32)
    z_lvl = np.zeros(Kp, np.int32)
    z_b = np.zeros(Kp, bool)
    nb_T = np.tile(np.eye(4, dtype=np.float32), (NB, 1, 1))
    nb_T[0] = T2
    nb_ok = np.zeros(NB, bool)
    nb_ok[0] = True
    nb_l2d = np.zeros((NB, L, 3), np.float32)
    nb_desc = np.zeros((NB, L, D), np.float32)
    nb_ang = np.zeros((NB, L), np.float32)
    nb_free = np.zeros((NB, L), bool)
    nb_l2d[0], nb_desc[0], nb_ang[0], nb_free[0] = o2[2], o2[4], o2[3], o2[5]

    packed = mapping_step(
        jnp.asarray(T1), jnp.asarray(z_uv), jnp.asarray(z_desc),
        jnp.asarray(z_lvl), jnp.asarray(z_b),
        jnp.zeros((Kp, 3), jnp.float32), jnp.asarray(z_desc),
        jnp.asarray(z_b),
        jnp.asarray(nb_T), jnp.asarray(np.tile(z_uv, (NB, 1, 1))),
        jnp.asarray(np.tile(z_desc, (NB, 1, 1))),
        jnp.asarray(np.tile(z_lvl, (NB, 1))),
        jnp.asarray(np.tile(z_b, (NB, 1))),
        jnp.zeros((NB, Kp), jnp.float32), jnp.asarray(np.tile(z_b, (NB, 1))),
        jnp.asarray(nb_ok),
        jnp.asarray(o1[0]), jnp.asarray(o1[1]), jnp.asarray(o1[2]),
        jnp.asarray(o1[4]), jnp.asarray(o1[3]), jnp.asarray(o1[5]),
        jnp.asarray(nb_l2d), jnp.asarray(nb_desc), jnp.asarray(nb_ang),
        jnp.asarray(nb_free), cfg)
    out = MappingLayout(cfg).unpack(np.asarray(packed))

    good = out["ln_tri_good"][0, :n_ln] > 0
    # random lines near the epipolar plane are CORRECTLY rejected by the
    # parallax gate (plane-plane intersection is degenerate there); the
    # well-conditioned ones must triangulate accurately
    assert good.sum() >= 2, f"only {good.sum()} lines triangulated"
    for i in np.flatnonzero(good):
        assert out["ln_tri_idx"][0, i] == i
        # endpoints land on the GT infinite line (ray-plane cut recovers the
        # line, endpoint parameterization follows view 1's segment extent)
        for ep in (out["ln_tri_s"][0, i], out["ln_tri_e"][0, i]):
            rel = ep - sw[i]
            perp = rel - (rel @ d[i]) * d[i]
            assert np.linalg.norm(perp) < 0.03, \
                f"line {i} endpoint off by {np.linalg.norm(perp)}"
