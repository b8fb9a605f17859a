"""Bisect extract_point_features' on-device cost at 640x480.

Same scan-differencing method as _profile_device_stages. Stages are
measured standalone (not cumulative): pyramid, dense FAST scores (all
levels), keypoint selection, orientation, blur, descriptors, full.
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
    from planarslam_tpu.ops import fast, image, orb
    from planarslam_tpu.ops.frontend import (EDGE_BORDER,
                                             extract_point_features,
                                             level_quotas)

    cfg = SystemConfig()
    ocfg = cfg.orb
    seq = synthetic.make_sequence(n_frames=4, width=cfg.camera.width,
                                  height=cfg.camera.height)
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

    quotas = level_quotas(ocfg.n_features, ocfg.n_levels, ocfg.scale_factor)

    def pyramid(gray, depth):
        return image.build_pyramid(gray, ocfg.n_levels, ocfg.scale_factor)

    def scores(gray, depth):
        levels = image.build_pyramid(gray, ocfg.n_levels, ocfg.scale_factor)
        return [fast.fast_score(l) for l, q in zip(levels, quotas) if q]

    def select(gray, depth):
        levels = image.build_pyramid(gray, ocfg.n_levels, ocfg.scale_factor)
        outs = []
        for l, (img_l, q) in enumerate(zip(levels, quotas)):
            if not q:
                continue
            tile = max(8, int(round(ocfg.tile / (ocfg.scale_factor ** l))))
            outs.append(fast.select_keypoints(
                fast.fast_score(img_l), tile=tile, k_total=q,
                min_score=float(ocfg.min_th_fast), border=EDGE_BORDER))
        return outs

    def orient(gray, depth):
        levels = image.build_pyramid(gray, ocfg.n_levels, ocfg.scale_factor)
        outs = []
        for l, (img_l, q) in enumerate(zip(levels, quotas)):
            if not q:
                continue
            tile = max(8, int(round(ocfg.tile / (ocfg.scale_factor ** l))))
            uv_l, _, valid_l = fast.select_keypoints(
                fast.fast_score(img_l), tile=tile, k_total=q,
                min_score=float(ocfg.min_th_fast), border=EDGE_BORDER)
            outs.append(orb.orientations(img_l, uv_l, valid_l))
        return outs

    def blur_all(gray, depth):
        levels = image.build_pyramid(gray, ocfg.n_levels, ocfg.scale_factor)
        return [image.blur(l, ksize=7, sigma=2.0)
                for l, q in zip(levels, quotas) if q]

    def full(gray, depth):
        return extract_point_features(gray, depth, cfg.camera, ocfg)

    for name, fn in (("pyramid", pyramid), ("scores", scores),
                     ("select", select), ("orient", orient),
                     ("blur", blur_all), ("full", full)):
        dt = scan_time(fn)
        print(f"{name:8s} {dt*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
