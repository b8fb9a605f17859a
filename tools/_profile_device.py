"""Micro-benchmark the fused-step components on the TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.frame import extract_frame
from planarslam_tpu.ops import manhattan as manhattan_ops
from planarslam_tpu.ops import matching
from planarslam_tpu.solvers import pose_opt

cfg = SystemConfig()
seq = synthetic.make_sequence(n_frames=2, width=cfg.camera.width,
                              height=cfg.camera.height)
gray, depth = seq.render(0)
gray = jnp.asarray(gray, jnp.float32)
depth = jnp.asarray(depth, jnp.float32)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return out


ext = jax.jit(lambda g, d: extract_frame(g, d, cfg))
feats = timeit("extract_frame(full)", ext, gray, depth)

# break extraction into parts
from planarslam_tpu.ops import frontend, lines as lines_ops, planes as planes_ops

orb = jax.jit(lambda g: frontend.extract_orb(g, cfg.orb, cfg.camera))
try:
    timeit("  orb_frontend", orb, gray)
except Exception as e:
    print("  orb_frontend FAIL", e)

lin = jax.jit(lambda g, d: lines_ops.detect_lines(g, cfg.lines))
try:
    timeit("  detect_lines", lin, gray, depth)
except Exception as e:
    print("  detect_lines FAIL", type(e).__name__, str(e)[:100])

pl = jax.jit(lambda d: planes_ops.detect_planes(d, cfg.planes, cfg.camera))
try:
    timeit("  detect_planes", pl, depth)
except Exception as e:
    print("  detect_planes FAIL", type(e).__name__, str(e)[:100])

nrm = jax.jit(lambda d: planes_ops.surface_normals(d, cfg.camera))
try:
    timeit("  surface_normals", nrm, depth)
except Exception as e:
    print("  surface_normals FAIL", type(e).__name__, str(e)[:100])

manh = jax.jit(lambda R, n, v: manhattan_ops.track_manhattan_frame(
    R, n, v, cone_sin=cfg.manhattan.cone_sin_track,
    kernel=cfg.manhattan.mean_shift_kernel,
    min_support=cfg.manhattan.min_axis_support))
timeit("manhattan", manh, jnp.eye(3), feats.normals, feats.normals_valid)

cam = cfg.camera
K = (cam.fx, cam.fy, cam.cx, cam.cy)
pts_w = jnp.zeros((4096, 3), jnp.float32)
descs = jnp.zeros((4096, 8), jnp.uint32)
validp = jnp.ones((4096,), bool)
sp = jax.jit(lambda *a: matching.search_by_projection(
    *a, K=K, image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
    scale_factor=cfg.orb.scale_factor, radius=4.0,
    max_dist=cfg.matcher.th_high, level_window=1))
timeit("search_by_projection 4096", sp, pts_w, descs, validp, jnp.eye(4),
       feats.points.uv, feats.points.desc, feats.points.level,
       feats.points.valid, feats.points.u_right)

md = jax.jit(lambda *a: matching.match_descriptors(
    *a, max_dist=cfg.matcher.th_low, ratio=0.9))
timeit("match_descriptors 1024", md, feats.points.desc, feats.points.desc,
       feats.points.valid, feats.points.valid)

w = pose_opt.PoseOptWeights.from_config(cfg.planes)
Kp = cfg.orb.max_keypoints
obs = pose_opt.PointObs(xw=jnp.zeros((Kp, 3)), uv=feats.points.uv,
                        u_right=feats.points.u_right,
                        inv_sigma2=jnp.ones((Kp,)), valid=feats.points.valid)
po = jax.jit(lambda T, o: pose_opt.pose_optimize(
    T, K, cam.bf, points=o, weights=w))
timeit("pose_optimize pts-only", po, jnp.eye(4), obs)
