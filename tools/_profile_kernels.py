"""Reliable per-kernel timings: force a tiny pull, subtract RTT baseline."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.ops import fast, image, orb
from planarslam_tpu.ops import lines as lines_ops
from planarslam_tpu.ops import planes as planes_ops

cfg = SystemConfig()
cam = cfg.camera
seq = synthetic.make_sequence(n_frames=2, width=cam.width, height=cam.height)
g_np, d_np = seq.render(0)
gray = jnp.asarray(g_np, jnp.float32)
depth = jnp.asarray(d_np, jnp.float32)

# RTT baseline
base_fn = jax.jit(lambda x: jnp.sum(x))
np.asarray(base_fn(gray))
t0 = time.perf_counter()
for _ in range(10):
    np.asarray(base_fn(gray))
RTT = (time.perf_counter() - t0) / 10 * 1e3
print(f"RTT baseline: {RTT:.1f} ms")


def tsum(x):
    return jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), x))


def timeit(name, fn, *args, n=5):
    f = jax.jit(lambda *a: tsum(fn(*a)))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / n * 1e3 - RTT
    print(f"{name:36s} {dt:8.2f} ms")


from planarslam_tpu.ops.frontend import (EDGE_BORDER, extract_point_features,
                                         level_quotas)

timeit("extract_point_features", lambda g, d: extract_point_features(g, d, cam, cfg.orb), gray, depth)

levels = image.build_pyramid(gray, cfg.orb.n_levels, cfg.orb.scale_factor)
timeit("build_pyramid", lambda g: image.build_pyramid(
    g, cfg.orb.n_levels, cfg.orb.scale_factor), gray)
timeit("fast_score L0", fast.fast_score, gray)
quotas = level_quotas(cfg.orb.n_features, cfg.orb.n_levels,
                      cfg.orb.scale_factor)
score0 = fast.fast_score(gray)
timeit("select_keypoints L0",
       lambda s: fast.select_keypoints(s, tile=cfg.orb.tile,
                                       k_total=quotas[0],
                                       min_score=float(cfg.orb.min_th_fast),
                                       border=EDGE_BORDER), score0)
uv0, _, val0 = fast.select_keypoints(score0, tile=cfg.orb.tile,
                                     k_total=quotas[0],
                                     min_score=float(cfg.orb.min_th_fast),
                                     border=EDGE_BORDER)
timeit("orientations L0", orb.orientations, gray, uv0, val0)
timeit("blur L0", lambda g: image.blur(g, ksize=7, sigma=2.0), gray)
blur0 = image.blur(gray, ksize=7, sigma=2.0)
ang0 = orb.orientations(gray, uv0, val0)
timeit("descriptors L0", orb.descriptors, blur0, uv0, ang0, val0)

# full per-level loop cost estimate: sum over levels of score+select+orient+desc
timeit("detect_lines", lambda g, d: lines_ops.detect_lines(g, cfg.lines),
       gray, depth)
try:
    timeit("lift_lines_3d", lambda g, d: lines_ops.lift_lines_3d(
        lines_ops.detect_lines(g, cfg.lines), d, cam), gray, depth)
except Exception as e:
    print("lift_lines_3d fail:", str(e)[:120])

# planes: find actual entry points
import inspect
fns = [n for n, f in inspect.getmembers(planes_ops, inspect.isfunction)]
print("planes fns:", fns)
from planarslam_tpu.slam.frame import extract_frame
timeit("extract_frame FULL", lambda g, d: extract_frame(g, d, cfg), gray,
       depth)
