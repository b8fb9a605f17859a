"""Tests for plane segmentation, surface normals, Manhattan tracking."""

import numpy as np
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.geometry import se3
from planarslam_tpu.io import synthetic
from planarslam_tpu.ops import manhattan, planes


def _render(frame=0, kind="arc", n=2):
    cfg = SystemConfig.tiny()
    seq = synthetic.make_sequence(n_frames=n, width=cfg.camera.width,
                                  height=cfg.camera.height, kind=kind)
    gray, depth = seq.render(frame)
    return cfg, seq, gray, depth


def test_backproject_depth():
    cfg, seq, gray, depth = _render()
    pts = np.asarray(planes.backproject_depth(jnp.asarray(depth), cfg.camera))
    v, u = 60, 80
    z = depth[v, u]
    assert abs(pts[v, u, 2] - z) < 1e-6
    assert abs(pts[v, u, 0] - (u - cfg.camera.cx) / cfg.camera.fx * z) < 1e-5


def test_surface_normals_axis_aligned():
    cfg, seq, gray, depth = _render()
    pts = planes.backproject_depth(jnp.asarray(depth), cfg.camera)
    n, valid = planes.surface_normals(pts, stride=2)
    n, valid = np.asarray(n), np.asarray(valid)
    assert valid.mean() > 0.7
    # frame 0: camera aligned with world; scene normals are ±x, ±y, ±z
    nv = n[valid]
    best = np.max(np.abs(nv), axis=-1)
    assert (best > 0.95).mean() > 0.9


def test_extract_planes_recovers_scene():
    cfg, seq, gray, depth = _render()
    feats = planes.extract_planes(jnp.asarray(depth), cfg.camera, cfg.planes)
    valid = np.asarray(feats.valid)
    coeffs = np.asarray(feats.coeffs)[valid]
    counts = np.asarray(feats.count)[valid]
    assert valid.sum() >= 3  # back wall, floor/ceiling/side walls visible
    # every extracted plane must match a ground-truth scene plane
    for c in coeffs:
        n_est, d_est = c[:3], c[3]
        errs = []
        for p in seq.planes:
            gt = np.r_[p.normal, p.d]
            gt = gt / np.linalg.norm(gt[:3])
            if gt[3] < 0:
                gt = -gt
            errs.append(min(np.abs(1 - abs(n_est @ gt[:3])) + abs(d_est - gt[3]),
                            np.abs(1 - abs(n_est @ gt[:3])) + abs(d_est + gt[3])))
        assert min(errs) < 0.05, f"plane {c} unmatched (errs {errs})"
    # pixel labels: labelled pixels dominate the structured scene
    lbl = np.asarray(feats.pixel_label)
    assert (lbl >= 0).mean() > 0.5


def test_extract_planes_counts_min_size():
    cfg, seq, gray, depth = _render()
    feats = planes.extract_planes(jnp.asarray(depth), cfg.camera, cfg.planes)
    valid = np.asarray(feats.valid)
    counts = np.asarray(feats.count)
    assert (counts[valid] >= cfg.planes.min_size).all()


def test_manhattan_tracking_recovers_rotation(rng):
    cfg, seq, gray, depth = _render(frame=1)
    T_wc = seq.poses_wc[1]
    R_cw = T_wc[:3, :3].T.astype(np.float32)  # world axes in camera frame
    pts = planes.backproject_depth(jnp.asarray(depth), cfg.camera)
    n, valid = planes.surface_normals(pts, stride=2)
    n = np.asarray(n).reshape(-1, 3)
    v = np.asarray(valid).reshape(-1)
    # subsample to the normal budget
    idx = rng.choice(len(n), size=min(cfg.manhattan.max_normals, len(n)),
                     replace=False)
    n_sub, v_sub = n[idx], v[idx]

    # start from a perturbed estimate (~4 degrees off)
    dR = np.asarray(se3.so3_exp(jnp.asarray(
        np.array([0.03, -0.04, 0.03], np.float32))))
    R_init = (R_cw @ dR).astype(np.float32)
    res = manhattan.track_manhattan_frame(jnp.asarray(R_init),
                                          jnp.asarray(n_sub),
                                          jnp.asarray(v_sub))
    assert bool(res.success)
    R_est = np.asarray(res.R_cm)
    # compare up to axis permutation/sign: R_est^T R_cw must be near a
    # signed permutation matrix; here init is close, so direct comparison
    err = np.asarray(se3.so3_log(jnp.asarray(R_est.T @ R_cw)))
    assert np.linalg.norm(err) < 0.01, f"residual rotation {err}"


def test_manhattan_seed_from_planes():
    cfg, seq, gray, depth = _render()
    feats = planes.extract_planes(jnp.asarray(depth), cfg.camera, cfg.planes)
    R, ok = manhattan.seed_from_plane_normals(
        feats.coeffs[:, :3], feats.count, feats.valid)
    assert bool(ok)
    R = np.asarray(R)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # frame 0: camera == world; MF axes must be near ±ex/±ey/±ez
    assert (np.max(np.abs(R), axis=0) > 0.99).all()


def test_manhattan_lines_rescue_plane_poor_scene(rng):
    """VERDICT round-1 item 7 acceptance: in a one-plane corridor the
    normals constrain only ONE axis and normals-only tracking loses the
    rotation; mixing detected line directions into the observation set
    (reference appends vVanishingDirection to the surface normals,
    `src/Tracking.cc:660-668`) recovers all three axes."""
    import jax.numpy as jnp

    from planarslam_tpu.ops import manhattan as manhattan_ops

    # ground-truth Manhattan frame = identity; the single visible plane
    # (corridor floor) contributes normals along +y only
    n_n = 400
    normals = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n_n, 1))
    normals += rng.normal(0, 0.01, normals.shape).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    nv = np.ones(n_n, bool)

    # corridor edge lines run along x and z (sign-ambiguous directions)
    n_l = 60
    dirs = []
    for i in range(n_l):
        ax = np.array([1.0, 0, 0], np.float32) if i % 2 == 0 \
            else np.array([0, 0, 1.0], np.float32)
        d = ax * (1 if i % 4 < 2 else -1) \
            + rng.normal(0, 0.01, 3).astype(np.float32)
        dirs.append(d / np.linalg.norm(d))
    dirs = np.stack(dirs)
    lv = np.ones(n_l, bool)

    # perturbed initial estimate (a few degrees off)
    from planarslam_tpu.geometry import se3
    R0 = np.asarray(se3.so3_exp(jnp.asarray(
        np.array([0.05, -0.04, 0.06], np.float32))))

    def err_deg(R):
        c = (np.trace(np.asarray(R)) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    res_n = manhattan_ops.track_manhattan_frame(
        jnp.asarray(R0), jnp.asarray(normals), jnp.asarray(nv),
        min_support=20)
    # normals-only: only one axis supported -> tracking must NOT succeed
    assert not bool(res_n.success), "one plane cannot fix three axes"

    res_l = manhattan_ops.track_manhattan_frame(
        jnp.asarray(R0),
        jnp.asarray(np.concatenate([normals, dirs])),
        jnp.asarray(np.concatenate([nv, lv])),
        min_support=20)
    assert bool(res_l.success), "line directions should complete the frame"
    assert err_deg(res_l.R_cm) < 1.0, f"rotation err {err_deg(res_l.R_cm)}"
