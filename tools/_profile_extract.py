"""Fine-grained extraction profiling with RTT subtraction."""
import sys; sys.path.insert(0, ".")
import time
import numpy as np
import jax
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.ops import fast, image, orb
from planarslam_tpu.ops import lines as lines_ops
from planarslam_tpu.ops import planes as planes_ops
from planarslam_tpu.ops.frontend import EDGE_BORDER, level_quotas

cfg = SystemConfig()
cam = cfg.camera
seq = synthetic.make_sequence(n_frames=2, width=cam.width, height=cam.height)
g_np, d_np = seq.render(0)
gray = jnp.asarray(g_np, jnp.float32)
depth = jnp.asarray(d_np, jnp.float32)

base = jax.jit(lambda x: jnp.sum(x))
np.asarray(base(gray))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(base(gray))
RTT = (time.perf_counter() - t0) / 20 * 1e3
print(f"RTT {RTT:.1f} ms")


def tsum(x):
    return jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), x))


def timeit(name, f, *args, n=10):
    jf = jax.jit(lambda *a: tsum(f(*a)))
    np.asarray(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(jf(*args))
    print(f"{name:38s} {(time.perf_counter()-t0)/n*1e3 - RTT:8.2f} ms")


quotas = level_quotas(cfg.orb.n_features, cfg.orb.n_levels,
                      cfg.orb.scale_factor)


def all_scores(g):
    levels = image.build_pyramid(g, cfg.orb.n_levels, cfg.orb.scale_factor)
    return [fast.fast_score(l) for l in levels]

timeit("fast_score all levels", all_scores, gray)


def all_select(g):
    levels = image.build_pyramid(g, cfg.orb.n_levels, cfg.orb.scale_factor)
    outs = []
    for l, img_l in enumerate(levels):
        tile = max(8, int(round(cfg.orb.tile / (cfg.orb.scale_factor ** l))))
        score = fast.fast_score(img_l)
        outs.append(fast.select_keypoints(score, tile=tile,
                                          k_total=quotas[l],
                                          min_score=float(cfg.orb.min_th_fast),
                                          border=EDGE_BORDER))
    return outs

timeit("  + select_keypoints", all_select, gray)


def all_orient(g):
    levels = image.build_pyramid(g, cfg.orb.n_levels, cfg.orb.scale_factor)
    outs = []
    for l, img_l in enumerate(levels):
        tile = max(8, int(round(cfg.orb.tile / (cfg.orb.scale_factor ** l))))
        score = fast.fast_score(img_l)
        uv, r, v = fast.select_keypoints(score, tile=tile, k_total=quotas[l],
                                         min_score=float(cfg.orb.min_th_fast),
                                         border=EDGE_BORDER)
        outs.append(orb.orientations(img_l, uv, v))
    return outs

timeit("  + orientations", all_orient, gray)


def all_desc(g):
    levels = image.build_pyramid(g, cfg.orb.n_levels, cfg.orb.scale_factor)
    outs = []
    for l, img_l in enumerate(levels):
        tile = max(8, int(round(cfg.orb.tile / (cfg.orb.scale_factor ** l))))
        score = fast.fast_score(img_l)
        uv, r, v = fast.select_keypoints(score, tile=tile, k_total=quotas[l],
                                         min_score=float(cfg.orb.min_th_fast),
                                         border=EDGE_BORDER)
        ang = orb.orientations(img_l, uv, v)
        blur = image.blur(img_l, ksize=7, sigma=2.0)
        outs.append(orb.descriptors(blur, uv, ang, v))
    return outs

timeit("  + blur + descriptors (full orb)", all_desc, gray)

timeit("detect_lines", lambda g: lines_ops.detect_lines(g, cfg.lines), gray)
timeit("line_descriptors", lambda g: lines_ops.line_descriptors(
    g, *lines_ops.detect_lines(g, cfg.lines)[:2],
    lines_ops.detect_lines(g, cfg.lines)[5]), gray)
timeit("lift_lines_3d", lambda g, d: lines_ops.lift_lines_3d(
    d, cam, cfg.lines, *[lines_ops.detect_lines(g, cfg.lines)[i]
                         for i in (0, 1, 5)]), gray, depth)
timeit("extract_planes", lambda d: planes_ops.extract_planes(
    d, cam, cfg.planes), depth)
timeit("surface_normals", lambda d: planes_ops.surface_normals(
    planes_ops.backproject_depth(d, cam), stride=2), depth)

from planarslam_tpu.slam.frame import extract_frame
timeit("extract_frame FULL", lambda g, d: extract_frame(g, d, cfg), gray,
       depth)
