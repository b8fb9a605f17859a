"""Bisect extract_planes' on-device cost by sub-stage at 640x480.

Same honest method as _profile_device_stages (scan K iterations with a
carried multiplicative perturbation, difference two K values so dispatch
and tunnel RTT cancel; np.asarray pull as the barrier).

Stages measured cumulatively:
  blocks   : backproject + noise gate + block moments + block fits
  cc       : + connected components (merge_rounds label propagation)
  topk     : + segment refit + top-P + dedup
  assign   : + initial pixel assignment + one-hot refit
  full     : + refine_rounds robust re-assign/refit rounds
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from planarslam_tpu.config import SystemConfig
    from planarslam_tpu.io import synthetic
    from planarslam_tpu.ops import planes as P

    cfg = SystemConfig()
    seq = synthetic.make_sequence(n_frames=4, width=cfg.camera.width,
                                  height=cfg.camera.height)
    _, d = seq.render(2)
    dd = jnp.asarray(d.astype(np.float32))
    np.asarray(dd)

    def scan_time(fn, K1=2, K2=10, reps=3):
        def make(K):
            @jax.jit
            def run(depth):
                def body(c, _):
                    out = fn(depth * (1.0 + c))
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(out))
                    return s * 1e-24, ()

                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
                return c

            return run

        r1, r2 = make(K1), make(K2)
        np.asarray(r1(dd)), np.asarray(r2(dd))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(r1(dd))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(r2(dd))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (K2 - K1)

    cam = cfg.camera
    pcfg = cfg.planes

    def upto(stage):
        def fn(depth):
            return P.extract_planes_debug(depth, cam, pcfg, stop=stage)

        return fn

    for stage in ("blocks", "cc", "topk", "assign", "full"):
        dt = scan_time(upto(stage))
        print(f"{stage:8s} {dt*1e3:8.2f} ms/iter", flush=True)

    # knob sweeps
    for rr in (0, 1, 2):
        c2 = dataclasses.replace(pcfg, refine_rounds=rr)
        dt = scan_time(lambda depth, c2=c2: P.extract_planes(depth, cam, c2))
        print(f"refine_rounds={rr} {dt*1e3:8.2f} ms/iter", flush=True)
    for mr in (4, 12):
        c2 = dataclasses.replace(pcfg, merge_rounds=mr)
        dt = scan_time(lambda depth, c2=c2: P.extract_planes(depth, cam, c2))
        print(f"merge_rounds={mr} {dt*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
