"""Per-stage ON-DEVICE cost of the fused tracking step at 640x480.

Technique: run each stage K times inside ONE program via lax.scan with a
carried data dependency (so XLA cannot DCE or parallelize iterations), and
difference two K values — tunnel RTT and dispatch cost cancel exactly:

    per_iter = (T_block(K2) - T_block(K1)) / (K2 - K1)

Run on the real TPU: `python tools/_profile_device_stages.py`.
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
    from planarslam_tpu.ops import planes as plane_ops
    from planarslam_tpu.ops.frontend import extract_point_features
    from planarslam_tpu.ops import lines as line_ops
    from planarslam_tpu.slam.device_tracker import fused_track_step
    from planarslam_tpu.slam.frame import extract_frame
    from planarslam_tpu.slam.system import System

    cfg = SystemConfig()
    seq = synthetic.make_sequence(n_frames=20, width=cfg.camera.width,
                                  height=cfg.camera.height)
    g, d = seq.render(10)
    g8 = np.clip(np.round(g), 0, 255).astype(np.float32)
    dep = d.astype(np.float32)
    gd = jax.block_until_ready(jnp.asarray(g8))
    dd = jax.block_until_ready(jnp.asarray(dep))

    def scan_time(fn, K1=2, K2=10, reps=3):
        """fn(gray, depth) -> pytree; scanned K times with a carried
        perturbation so iterations chain."""

        def make(K):
            @jax.jit
            def run(gray, depth):
                def body(c, _):
                    # multiplicative perturbation: FAST/BRIEF are invariant
                    # to an ADDITIVE constant (ring - center cancels it), so
                    # gray + c lets XLA hoist the whole stage out of the
                    # scan; gray * (1 + c) changes threshold comparisons and
                    # cannot be simplified away. The carry consumes EVERY
                    # output leaf so no subgraph is DCE'd.
                    out = fn(gray * (1.0 + c), depth * (1.0 + c))
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(out))
                    return s * 1e-24, ()

                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
                return c

            return run

        r1, r2 = make(K1), make(K2)
        # np.asarray pull, NOT block_until_ready: the tunnel backend's
        # block_until_ready returns before the device program finishes for
        # scalar results (measured all-zero timings); a host pull is the
        # only reliable barrier here.
        np.asarray(r1(gd, dd)), np.asarray(r2(gd, dd))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(r1(gd, dd))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(r2(gd, dd))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (K2 - K1)

    stages = {
        "orb_points": lambda g, d: extract_point_features(
            g, d, cfg.camera, cfg.orb),
        "lines": lambda g, d: line_ops.extract_line_features(
            g, d, cfg.camera, cfg.lines),
        "planes": lambda g, d: plane_ops.extract_planes(
            d, cfg.camera, cfg.planes),
        "normals": lambda g, d: plane_ops.surface_normals(
            plane_ops.backproject_depth(
                plane_ops.box_smooth_depth(d, cfg.planes.smooth_window),
                cfg.camera), stride=4),
        "extract_frame": lambda g, d: extract_frame(g, d, cfg),
    }
    for name, fn in stages.items():
        dt = scan_time(fn)
        print(f"{name:16s} {dt*1e3:8.2f} ms/iter", flush=True)

    # full fused step (needs live tracker state)
    slam = System(config=cfg)
    factor = cfg.camera.depth_map_factor
    for i in range(10):
        gg, ddn = seq.render(i)
        slam.track_rgbd(np.clip(np.round(gg), 0, 255).astype(np.uint8),
                        np.clip(np.round(ddn * factor), 0, 65535).astype(
                            np.uint16), seq.timestamps[i])
    slam.tracker.flush_pending()
    tr = slam.tracker
    tr._refresh_window()
    args = tr.fused_step_inputs(np.asarray(g8), np.asarray(dep))
    (T_ovr, use_ovr, R_wm, manh, state, win, wts) = args[2:]

    def step_fn(gray, depth):
        return fused_track_step(gray, depth, T_ovr, use_ovr, R_wm, manh,
                                state, win, wts, cfg)

    dt = scan_time(step_fn, K1=2, K2=8)
    print(f"{'fused_step':16s} {dt*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
