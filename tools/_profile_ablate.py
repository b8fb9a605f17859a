"""Ablate the REAL fused_track_step by monkeypatching components to no-ops,
measuring block time of the full program each time."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam import device_tracker as dt
from planarslam_tpu.slam.map import SlamMap
from planarslam_tpu.solvers import pose_opt

cfg = SystemConfig()
cam = cfg.camera
seq = synthetic.make_sequence(n_frames=2, width=cam.width, height=cam.height)
g_np, d_np = seq.render(0)
gray = jnp.asarray(g_np, jnp.float32)
depth = jnp.asarray(d_np, jnp.float32)
weights = pose_opt.PoseOptWeights.from_config(cfg.planes)
m = SlamMap(cfg)
m.kf_valid[0] = True
m.n_kf = 1
win, _, _ = dt.build_window(m, np.asarray([0]), cfg)

T = jnp.eye(4)
F = jnp.asarray(False)
Tr = jnp.asarray(True)
R = jnp.eye(3)


def run(tag, n=6):
    dt.fused_track_step.clear_cache()
    state = dt.make_last_state(gray, depth, jnp.eye(4), jnp.eye(4), cfg)
    jax.block_until_ready(state)
    r = dt.fused_track_step(gray, depth, T, F, R, Tr, state, win, weights,
                            cfg)
    np.asarray(r.packed)
    t0 = time.perf_counter()
    for _ in range(n):
        r = dt.fused_track_step(gray, depth, T, F, R, Tr, state, win,
                                weights, cfg)
        np.asarray(r.packed)
    print(f"{tag:32s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms")


run("FULL")

# ablate pose_optimize -> identity
orig_po = pose_opt.pose_optimize
def fake_po(T_cw_init, K, bf, points=None, lines=None, planes=None,
            par_planes=None, ver_planes=None, weights=None,
            rotation_fixed=False, n_rounds=4, n_iters=10):
    pts = points if points is not None else pose_opt._empty_points()
    lns = lines if lines is not None else pose_opt._empty_lines()
    pls = planes if planes is not None else pose_opt._empty_planes()
    pars = par_planes if par_planes is not None else pose_opt._empty_planes()
    vers = ver_planes if ver_planes is not None else pose_opt._empty_planes()
    return pose_opt.PoseOptResult(
        T_cw_init, pts.valid, lns.valid, pls.valid, pars.valid, vers.valid,
        jnp.sum(pts.valid.astype(jnp.int32)), jnp.float32(0))
dt.pose_opt.pose_optimize = fake_po
run("no pose_optimize")
dt.pose_opt.pose_optimize = orig_po

# ablate manhattan
from planarslam_tpu.ops import manhattan as manh_mod
orig_manh = manh_mod.track_manhattan_frame
class FakeRes:
    pass
def fake_manh(R_pred, normals, nvalid, **kw):
    r = orig_manh.__wrapped__ if hasattr(orig_manh, "__wrapped__") else None
    import types
    out = types.SimpleNamespace()
    out.R_cm = R_pred
    out.success = jnp.asarray(True)
    return out
dt.manhattan_ops.track_manhattan_frame = fake_manh
run("no manhattan")
dt.manhattan_ops.track_manhattan_frame = orig_manh

# ablate frame-to-frame matching
orig_sp = dt.matching.search_by_projection
orig_md = dt.matching.match_descriptors
def fake_sp(pts_w, descs, valid, T_cw, feat_uv, feat_desc, feat_level,
            feat_valid, feat_ur, **kw):
    n = pts_w.shape[0]
    return dt.matching.MatchResult(jnp.full((n,), -1, jnp.int32),
                                   jnp.full((n,), 10000, jnp.int32))
def fake_md(da, db, va, vb, **kw):
    n = da.shape[0]
    return dt.matching.MatchResult(jnp.full((n,), -1, jnp.int32),
                                   jnp.full((n,), 10000, jnp.int32))
dt.matching.search_by_projection = fake_sp
dt.matching.match_descriptors = fake_md
run("no matching")
dt.matching.search_by_projection = orig_sp
dt.matching.match_descriptors = orig_md

# ablate plane association
orig_assoc = dt._associate_planes_device
def fake_assoc(feats, T, win_, cfg_):
    P = cfg_.planes.max_planes
    z = jnp.full((P,), -1, jnp.int32)
    return z, z, z, feats.planes.coeffs
dt._associate_planes_device = fake_assoc
run("no plane assoc")
dt._associate_planes_device = orig_assoc

# ablate extraction pieces via frame module
import planarslam_tpu.slam.frame as frame_mod
orig_extract = dt.extract_frame


def make_fake_extract(no_lines=False, no_planes=False, no_orb=False):
    def fake(gray, depth, cfg_):
        feats = orig_extract(gray, depth, cfg_)
        return feats
    return fake

# measure extraction-less: replace with constant features
state0 = dt.make_last_state(gray, depth, jnp.eye(4), jnp.eye(4), cfg)
const_feats = jax.tree.map(lambda x: jax.device_get(x), state0.feats)
def fake_extract(g, d, c):
    return jax.tree.map(lambda x: jnp.asarray(x), const_feats)
dt.extract_frame = fake_extract
run("no extraction (const feats)")
dt.extract_frame = orig_extract
