"""Per-substage ON-DEVICE cost of _track_core (the sequential half of the
fused step) at 640x480 — matching, plane association, pose optimization.

Same scan-differencing technique as _profile_device_stages.py: run each
substage K times inside ONE program via lax.scan with a carried
multiplicative perturbation, difference two K values so tunnel RTT and
dispatch cancel.

Run on the real TPU: `python tools/_profile_track_core.py`.
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
    from planarslam_tpu.ops import matching
    from planarslam_tpu.ops.lines import search_lines_by_projection
    from planarslam_tpu.slam import device_tracker as dt
    from planarslam_tpu.slam.system import System
    from planarslam_tpu.solvers import pose_opt

    cfg = SystemConfig()
    cam = cfg.camera
    K = (cam.fx, cam.fy, cam.cx, cam.cy)
    Kp = cfg.orb.max_keypoints
    seq = synthetic.make_sequence(n_frames=20, width=cam.width,
                                  height=cam.height)
    factor = cam.depth_map_factor

    slam = System(config=cfg)
    for i in range(10):
        g, d = seq.render(i)
        slam.track_rgbd(np.clip(np.round(g), 0, 255).astype(np.uint8),
                        np.clip(np.round(d * factor), 0,
                                65535).astype(np.uint16), seq.timestamps[i])
    slam.tracker.flush_pending()
    tr = slam.tracker
    tr._refresh_window()
    g, d = seq.render(10)
    args = tr.fused_step_inputs(
        np.clip(np.round(g), 0, 255).astype(np.float32), d.astype(np.float32))
    gray_raw, depth_raw, T_ovr, use_ovr, R_wm, manh, state, win_flat, wts = \
        args
    win = jax.jit(dt.unpack_window, static_argnames=("cfg",))(win_flat, cfg)
    from planarslam_tpu.slam.frame import extract_frame

    feats = jax.jit(extract_frame, static_argnames=("cfg",))(
        jnp.asarray(g), jnp.asarray(d), cfg)
    jax.block_until_ready(feats)
    T_init = state.T_cw

    def scan_time(fn, consts, K1=2, K2=10, reps=3):
        """fn(*consts, c) -> pytree; the scalar perturbation c chains
        iterations (multiplied into the first float const inside fn)."""

        def make(Kn):
            @jax.jit
            def run(*cs):
                def body(c, _):
                    out = fn(*cs, c)
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(out))
                    return s * 1e-24, ()

                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=Kn)
                return c

            return run

        r1, r2 = make(K1), make(K2)
        jax.block_until_ready(r1(*consts))
        jax.block_until_ready(r2(*consts))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(*consts))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(r2(*consts))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (K2 - K1)

    inv_s2 = jnp.power(jnp.float32(cfg.orb.scale_factor),
                       -2.0 * feats.points.level.astype(jnp.float32))

    def mk_obs(c):
        m = (feats.points.valid & (feats.points.depth > 0))
        return pose_opt.PointObs(
            xw=state.pt3d_w * (1 + c), uv=feats.points.uv,
            u_right=feats.points.u_right, inv_sigma2=inv_s2,
            valid=m)

    stages = {
        "ff_proj_search": lambda c: matching.search_by_projection(
            state.pt3d_w * (1 + c), state.feats.points.desc, state.valid3d,
            T_init, feats.points.uv, feats.points.desc, feats.points.level,
            feats.points.valid, feats.points.u_right,
            K=K, image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
            scale_factor=cfg.orb.scale_factor, radius=15.0,
            max_dist=cfg.matcher.th_high, level_window=cfg.orb.n_levels),
        "bf_match": lambda c: matching.match_descriptors(
            state.feats.points.desc, feats.points.desc,
            state.valid3d & (c < 1.0), feats.points.valid,
            max_dist=cfg.matcher.th_low, ratio=0.9),
        "win_proj_search": lambda c: matching.search_by_projection(
            win.pt_xyz * (1 + c), win.pt_desc, win.pt_valid, T_init,
            feats.points.uv, feats.points.desc, feats.points.level,
            feats.points.valid, feats.points.u_right,
            K=K, image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
            scale_factor=cfg.orb.scale_factor, radius=4.0,
            max_dist=cfg.matcher.th_high, view_normals=win.pt_normal,
            dist_range=(win.pt_min_d, win.pt_max_d), level_window=1),
        "line_search": lambda c: search_lines_by_projection(
            win.ln_sw * (1 + c), win.ln_ew, win.ln_desc, win.ln_valid,
            T_init, feats.lines.uv_s, feats.lines.uv_e, feats.lines.angle,
            feats.lines.desc, feats.lines.valid,
            K=K, image_wh=(float(cam.width), float(cam.height)), radius=14.0),
        "plane_assoc": lambda c: dt._associate_planes_device(
            feats._replace(planes=feats.planes._replace(
                coeffs=feats.planes.coeffs * (1 + c))), T_init, win, cfg),
        "pose_opt_full": lambda c: pose_opt.pose_optimize(
            T_init, K, cam.bf, points=mk_obs(c), weights=wts,
            rotation_fixed=False),
        "pose_opt_rfix": lambda c: pose_opt.pose_optimize(
            T_init, K, cam.bf, points=mk_obs(c), weights=wts,
            rotation_fixed=True),
        "track_core": lambda c: dt._track_core(
            feats._replace(points=feats.points._replace(
                uv=feats.points.uv * (1 + c))),
            T_ovr, use_ovr, R_wm, manh, state, win_flat, wts, cfg),
    }
    for name, fn in stages.items():
        dt_s = scan_time(fn, ())
        print(f"{name:18s} {dt_s*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
