"""Pin down the PURE device execute time of fused_track_step at 640x480.

Method: enqueue N steps back-to-back, each consuming the previous step's
state (true data dependency -> device executes them sequentially), pulling
NOTHING until the end. With async dispatch the host runs ahead, so
   total_wall ~= N * device_exec + 1 RTT
which isolates device compute from the tunnel's per-transaction service
time. Compare against the blocking per-call time (1 RTT each).
"""
import time

import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.device_tracker import fused_track_step
from planarslam_tpu.slam.system import System


def main():
    cfg = SystemConfig()
    seq = synthetic.make_sequence(n_frames=32, width=cfg.camera.width,
                                  height=cfg.camera.height)
    factor = cfg.camera.depth_map_factor
    frames = []
    for i in range(32):
        g, d = seq.render(i)
        frames.append((np.clip(np.round(g), 0, 255).astype(np.uint8),
                       np.clip(np.round(d * factor), 0, 65535)
                       .astype(np.uint16)))

    slam = System(config=cfg)
    for i in range(10):
        slam.track_rgbd(*frames[i], float(i) / 30.0)
    slam.tracker.flush_pending()
    tr = slam.tracker
    assert tr._fused_state is not None
    tr._refresh_window()

    # warmup / compile
    for k in range(3):
        g, d = frames[10 + k]
        res = fused_track_step(*tr.fused_step_inputs(g, d), cfg)
        tr._fused_state = res.new_state
        np.asarray(res.packed)

    # ---- A: chained enqueue, no intermediate pulls ----
    for N in (8, 16, 32):
        t0 = time.perf_counter()
        last = None
        for k in range(N):
            g, d = frames[10 + (k % 16)]
            res = fused_track_step(*tr.fused_step_inputs(g, d), cfg)
            tr._fused_state = res.new_state
            last = res.packed
        np.asarray(last)  # one sync at the end
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"chained  N={N:3d}: {dt:7.2f} ms/step")

    # ---- B: blocking per call (1 RTT each) ----
    ts = []
    for k in range(16):
        g, d = frames[10 + (k % 16)]
        t0 = time.perf_counter()
        res = fused_track_step(*tr.fused_step_inputs(g, d), cfg)
        tr._fused_state = res.new_state
        np.asarray(res.packed)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"blocking per-call: median {np.median(ts):.2f} ms  "
          f"min {min(ts):.2f}  max {max(ts):.2f}")

    # ---- C: host-side enqueue cost alone (no sync at all) ----
    t0 = time.perf_counter()
    for k in range(16):
        g, d = frames[10 + (k % 16)]
        res = fused_track_step(*tr.fused_step_inputs(g, d), cfg)
        tr._fused_state = res.new_state
    enq = (time.perf_counter() - t0) / 16 * 1e3
    np.asarray(res.packed)
    print(f"enqueue-only: {enq:.2f} ms/step (host dispatch cost)")

    # ---- D: the CHUNK program's own cadence (C=8 frames per program) ----
    import dataclasses

    from planarslam_tpu.slam.device_tracker import (fused_track_chunk_packed,
                                                    pack_chunk_frames)

    C = 8
    cfg_c = cfg.replace(tracking=dataclasses.replace(cfg.tracking,
                                                     chunk_size=C))
    packed_frames = pack_chunk_frames([f[0] for f in frames[10:10 + C]],
                                      [f[1] for f in frames[10:10 + C]])
    dev_frames = __import__("jax").numpy.asarray(packed_frames)
    state = tr._fused_state
    win = tr._window
    import jax.numpy as jnp
    R = jnp.eye(3, dtype=jnp.float32)
    manh = jnp.asarray(False)
    # compile
    resc = fused_track_chunk_packed(dev_frames, R, manh, state, win,
                                    tr._pose_weights, cfg_c)
    np.asarray(resc.packed)
    # blocking per chunk
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        resc = fused_track_chunk_packed(dev_frames, R, manh,
                                        resc.final_state, win,
                                        tr._pose_weights, cfg_c)
        np.asarray(resc.packed)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"chunk(C=8) blocking: median {np.median(ts):.1f} ms/chunk = "
          f"{np.median(ts) / C:.2f} ms/frame")
    # chained chunks, one sync at end
    t0 = time.perf_counter()
    for _ in range(6):
        resc = fused_track_chunk_packed(dev_frames, R, manh,
                                        resc.final_state, win,
                                        tr._pose_weights, cfg_c)
    np.asarray(resc.packed)
    dt = (time.perf_counter() - t0) / 6
    print(f"chunk(C=8) chained:  {dt * 1e3:.1f} ms/chunk = "
          f"{dt * 1e3 / C:.2f} ms/frame")


if __name__ == "__main__":
    main()
