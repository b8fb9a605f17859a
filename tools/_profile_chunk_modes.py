"""Pin down WHERE chunked-mode time goes on the axon tunnel (round-2
VERDICT next-step #1): same-session, interleaved measurements of

  a. blocking single fused_track_step round trips      -> t_step_block
  b. blocking fused_track_chunk(C) round trips         -> t_chunk_block / C
  c. isolated lag-2 streaming feedback loop            -> t_stream_iso
  d. isolated depth-2 chunk feedback loop per C        -> t_chunk_iso / C

If (b) ~= (a): the chunk program itself is fine and chunking amortizes
transactions. If (b) >> (a): the scan-based chunk program is slow ON
DEVICE (not a tunnel artifact) and chunking cannot win.

Run on the real TPU: `python tools/_profile_chunk_modes.py`.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from planarslam_tpu.config import SystemConfig
    from planarslam_tpu.io import synthetic
    from planarslam_tpu.slam.device_tracker import (fused_track_chunk_packed,
                                                    fused_track_step,
                                                    pack_chunk_frames)
    from planarslam_tpu.slam.system import System

    cfg = SystemConfig()
    n_prep = 12
    seq = synthetic.make_sequence(n_frames=48, width=cfg.camera.width,
                                  height=cfg.camera.height)
    factor = cfg.camera.depth_map_factor
    frames = []
    for i in range(48):
        g, d = seq.render(i)
        frames.append((np.clip(np.round(g), 0, 255).astype(np.uint8),
                       np.clip(np.round(d * factor), 0, 65535).astype(
                           np.uint16)))

    # build a live tracker state + window
    slam = System(config=cfg)
    for i in range(n_prep):
        slam.track_rgbd(*frames[i], seq.timestamps[i])
    slam.tracker.flush_pending()
    tr = slam.tracker
    tr._refresh_window()

    def bench_block_step(n=24):
        ts = []
        for k in range(n):
            g, d = frames[n_prep + (k % 16)]
            args = tr.fused_step_inputs(g, d)
            t0 = time.perf_counter()
            res = fused_track_step(*args, cfg)
            np.asarray(res.packed)
            ts.append(time.perf_counter() - t0)
            tr._fused_state = res.new_state
        return np.asarray(ts[2:])

    def bench_block_chunk(C, n=8):
        ts = []
        for k in range(n):
            batch = [frames[n_prep + ((k * C + j) % 16)] for j in range(C)]
            packed = pack_chunk_frames([b[0] for b in batch],
                                       [b[1] for b in batch])
            t0 = time.perf_counter()
            res = fused_track_chunk_packed(
                jnp.asarray(packed), tr._dev_R_wm, tr._dev_manh,
                tr._fused_state, tr._window, tr._pose_weights, cfg)
            np.asarray(res.packed)
            ts.append(time.perf_counter() - t0)
            tr._fused_state = res.final_state
        return np.asarray(ts[2:])

    def bench_iso_stream(n=48, lag=2):
        pend = []
        t0 = time.perf_counter()
        for k in range(n):
            g, d = frames[n_prep + (k % 16)]
            args = tr.fused_step_inputs(g, d)
            res = fused_track_step(*args, cfg)
            tr._fused_state = res.new_state
            pend.append(res.packed)
            if len(pend) > lag:
                np.asarray(pend.pop(0))
        for p in pend:
            np.asarray(p)
        return (time.perf_counter() - t0) / n

    def bench_iso_chunk(C, n_chunks=8, lag=2):
        pend = []
        t0 = time.perf_counter()
        for k in range(n_chunks):
            batch = [frames[n_prep + ((k * C + j) % 16)] for j in range(C)]
            packed = pack_chunk_frames([b[0] for b in batch],
                                       [b[1] for b in batch])
            res = fused_track_chunk_packed(
                jnp.asarray(packed), tr._dev_R_wm, tr._dev_manh,
                tr._fused_state, tr._window, tr._pose_weights, cfg)
            tr._fused_state = res.final_state
            pend.append(res.packed)
            if len(pend) > lag:
                np.asarray(pend.pop(0))
        for p in pend:
            np.asarray(p)
        return (time.perf_counter() - t0) / (n_chunks * C)

    def bench_upload_exec(C, n=8):
        """Split a blocking chunk into its upload and execute phases:
        e_up  = H2D of the (C,3,H,W) packed buffer alone (block on device);
        e_ex  = chunk program with ALL inputs already device-resident.
        e_ex >> per-frame-compute x C means the scan program itself is slow
        ON DEVICE; e_up dominating means the tunnel's H2D bandwidth is the
        chunk bottleneck."""
        ups, exs = [], []
        for k in range(n):
            batch = [frames[n_prep + ((k * C + j) % 16)] for j in range(C)]
            packed = pack_chunk_frames([b[0] for b in batch],
                                       [b[1] for b in batch])
            t0 = time.perf_counter()
            dev = jax.block_until_ready(jnp.asarray(packed))
            t1 = time.perf_counter()
            res = fused_track_chunk_packed(
                dev, tr._dev_R_wm, tr._dev_manh,
                tr._fused_state, tr._window, tr._pose_weights, cfg)
            jax.block_until_ready(res.packed)
            t2 = time.perf_counter()
            ups.append(t1 - t0)
            exs.append(t2 - t1)
            tr._fused_state = res.final_state
        return np.asarray(ups[1:]), np.asarray(exs[1:])

    def bench_exec_step(n=12):
        """Single fused step with ALL inputs device-resident (upload split
        out) — the per-frame on-device cost floor of the step program."""
        ups, exs = [], []
        for k in range(n):
            g, d = frames[n_prep + (k % 16)]
            from planarslam_tpu.slam.device_tracker import (
                fused_track_step_packed, pack_frame)
            pk = pack_frame(g, d)
            t0 = time.perf_counter()
            dev = jax.block_until_ready(jnp.asarray(pk))
            t1 = time.perf_counter()
            args = tr.fused_step_inputs(dev, None)
            res = fused_track_step_packed(*args, cfg)
            jax.block_until_ready(res.packed)
            t2 = time.perf_counter()
            ups.append(t1 - t0)
            exs.append(t2 - t1)
            tr._fused_state = res.new_state
        return np.asarray(ups[2:]), np.asarray(exs[2:])

    # warm up compiles (C=8 only: single-CPU host — keep compile count low)
    bench_block_step(n=3)
    bench_block_chunk(8, n=2)
    bench_exec_step(n=2)

    a = bench_block_step(n=12)
    print(f"a. blocking step:        median {np.median(a)*1e3:7.2f} ms  "
          f"min {a.min()*1e3:7.2f}", flush=True)
    b = bench_block_chunk(8, n=6)
    print(f"b. blocking chunk C= 8:  median {np.median(b)*1e3:7.2f} ms"
          f"  per-frame {np.median(b)/8*1e3:7.2f} ms", flush=True)
    c = bench_iso_stream(n=32)
    print(f"c. iso stream lag-2:     per-frame {c*1e3:7.2f} ms", flush=True)
    d = bench_iso_chunk(8, n_chunks=6)
    print(f"d. iso chunk  C= 8:      per-frame {d*1e3:7.2f} ms", flush=True)
    up_s, ex_s = bench_exec_step(n=10)
    print(f"e. step split:           upload median {np.median(up_s)*1e3:7.2f}"
          f" ms  exec median {np.median(ex_s)*1e3:7.2f} ms  "
          f"exec min {ex_s.min()*1e3:7.2f}", flush=True)
    up_c, ex_c = bench_upload_exec(8, n=6)
    print(f"f. chunk split C= 8:     upload median {np.median(up_c)*1e3:7.2f}"
          f" ms  exec median {np.median(ex_c)*1e3:7.2f} ms  "
          f"exec/frame {np.median(ex_c)/8*1e3:7.2f} ms  "
          f"exec min/frame {ex_c.min()/8*1e3:7.2f}", flush=True)


if __name__ == "__main__":
    main()
