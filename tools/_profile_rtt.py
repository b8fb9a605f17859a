"""Measure the fused step round-trip: upload, dispatch, pull."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.device_tracker import (
    BundleLayout, build_window, fused_track_step, make_last_state)
from planarslam_tpu.slam.map import SlamMap
from planarslam_tpu.solvers import pose_opt

cfg = SystemConfig()
seq = synthetic.make_sequence(n_frames=5, width=cfg.camera.width,
                              height=cfg.camera.height)
frames = [seq.render(i) for i in range(5)]
layout = BundleLayout(cfg)
weights = pose_opt.PoseOptWeights.from_config(cfg.planes)

m = SlamMap(cfg)
# fake one valid kf so window builds
m.kf_valid[0] = True
m.n_kf = 1
win, _, _ = build_window(m, np.asarray([0]), cfg)

gray0 = jnp.asarray(frames[0][0], jnp.float32)
depth0 = jnp.asarray(frames[0][1], jnp.float32)
state = make_last_state(gray0, depth0, jnp.eye(4), cfg)

T = jnp.eye(4)
V = jnp.eye(4)
R = jnp.eye(3)
en = jnp.asarray(True)

# warmup/compile
r = fused_track_step(gray0, depth0, T, V, R, en, state, win, weights, cfg)
_ = np.asarray(r.packed)

for it in range(6):
    t0 = time.perf_counter()
    g = jnp.asarray(frames[it % 5][0], jnp.float32)
    d = jnp.asarray(frames[it % 5][1], jnp.float32)
    t1 = time.perf_counter()
    r = fused_track_step(g, d, T, V, R, en, state, win, weights, cfg)
    t2 = time.perf_counter()
    jax.block_until_ready(r.packed)
    t3 = time.perf_counter()
    packed = np.asarray(r.packed)
    t4 = time.perf_counter()
    state = r.new_state
    print(f"upload={1e3*(t1-t0):7.1f}ms dispatch={1e3*(t2-t1):7.1f}ms "
          f"block={1e3*(t3-t2):7.1f}ms pull={1e3*(t4-t3):7.1f}ms "
          f"total={1e3*(t4-t0):7.1f}ms packed={packed.nbytes}B")

# how long does just a tiny pull take?
x = jnp.zeros((4,))
jax.block_until_ready(x)
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(x + 1)
    print(f"tiny roundtrip: {1e3*(time.perf_counter()-t0):7.1f}ms")

# upload cost alone (2.4MB)
a = np.random.rand(480, 640).astype(np.float32)
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(a))
    print(f"640x480 upload sync: {1e3*(time.perf_counter()-t0):7.1f}ms")
