"""Bisect extract_line_features' on-device cost at 640x480.

Same scan-differencing method as _profile_device_stages. Stages standalone:
grad (blur+sobel+nms), detect (full detect_lines), desc (detect+descriptors),
lift (detect+3D lifting), full.
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
    from planarslam_tpu.ops import image as image_ops
    from planarslam_tpu.ops import lines as L

    cfg = SystemConfig()
    lcfg = cfg.lines
    cam = cfg.camera
    seq = synthetic.make_sequence(n_frames=4, width=cam.width,
                                  height=cam.height)
    g, d = seq.render(2)
    gd = jnp.asarray(g.astype(np.float32))
    dd = jnp.asarray(d.astype(np.float32))
    np.asarray(gd)

    def scan_time(fn, K1=2, K2=10, reps=3):
        def make(K):
            @jax.jit
            def run(gray, depth):
                def body(c, _):
                    out = fn(gray * (1.0 + c), depth * (1.0 + c))
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(out))
                    return s * 1e-24, ()

                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
                return c

            return run

        r1, r2 = make(K1), make(K2)
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

    def grad(gray, depth):
        gx, gy = image_ops.sobel_gradients(image_ops.blur(gray, 5, 1.0))
        return gx, gy

    def detect(gray, depth):
        return L.detect_lines(gray, lcfg)

    def desc(gray, depth):
        uv_s, uv_e, l_eq, angle, resp, valid = L.detect_lines(gray, lcfg)
        return L.line_descriptors(gray, uv_s, uv_e, valid)

    def lift(gray, depth):
        uv_s, uv_e, l_eq, angle, resp, valid = L.detect_lines(gray, lcfg)
        return L.lift_lines_3d(depth, cam, lcfg, uv_s, uv_e, valid)

    def full(gray, depth):
        return L.extract_line_features(gray, depth, cam, lcfg)

    for name, fn in (("grad", grad), ("detect", detect), ("desc", desc),
                     ("lift", lift), ("full", full)):
        dt = scan_time(fn)
        print(f"{name:8s} {dt*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
