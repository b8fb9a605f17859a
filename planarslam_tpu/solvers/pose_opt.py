"""Pose-only nonlinear least squares over point/line/plane residuals.

TPU-native replacement for the reference's g2o pose optimizers:
  - `Optimizer::PoseOptimization` (`src/Optimizer.cc:550`): full SE3, edges
    for mono/stereo points, line endpoints, planes, parallel planes,
    vertical planes;
  - `Optimizer::TranslationOptimization` (`src/Optimizer.cc:2995`): same
    residuals with the rotation frozen (Manhattan-decoupled translation).

Instead of a sparse graph with per-edge virtual calls, all residuals live in
fixed-capacity masked arrays; one jacfwd gives the stacked Jacobian; the
normal equations are a 6x6 (or 3x3) solve. Semantics mirrored from the
reference (`src/Optimizer.cc:760-1160`):
  - information: points 1/sigma^2(level); planes diag(3282.8/AngleInfo^2 x2,
    DistanceInfo^2); par/ver 3282.8/Info^2;
  - Huber deltas sqrt(5.991) mono, sqrt(7.815) stereo, sqrt(Plane.Chi),
    sqrt(Plane.VPChi); kernel dropped after round 2;
  - 4 rounds x 10 LM iterations, chi2 outlier gates 5.991 / 7.815 /
    2x5.991 per line endpoint / Plane.Chi / Plane.VPChi, outliers masked out
    per round and allowed back in when their chi2 recovers (each round
    restarts from the initial pose, as the reference does by re-setting the
    estimate to mTcw).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from planarslam_tpu.geometry import plane as plane_geo
from planarslam_tpu.geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PointObs(NamedTuple):
    xw: jnp.ndarray          # (N, 3) world positions
    uv: jnp.ndarray          # (N, 2) observed keypoints (undistorted)
    u_right: jnp.ndarray     # (N,) observed pseudo-stereo u (-1 = mono)
    inv_sigma2: jnp.ndarray  # (N,) scale weight
    valid: jnp.ndarray       # (N,) bool


class LineObs(NamedTuple):
    xw_s: jnp.ndarray        # (L, 3) 3D start point (world)
    xw_e: jnp.ndarray        # (L, 3) 3D end point (world)
    line2d: jnp.ndarray      # (L, 3) normalized image-line equation
    inv_sigma2: jnp.ndarray  # (L,)
    valid: jnp.ndarray       # (L,) bool


class PlaneObs(NamedTuple):
    pi_w: jnp.ndarray        # (P, 4) map plane in world frame
    pi_obs: jnp.ndarray      # (P, 4) observed plane in camera frame
    valid: jnp.ndarray       # (P,) bool


class PoseOptWeights(NamedTuple):
    """Plane/structural information scalars (from PlaneConfig; reference
    `src/Optimizer.cc:770-783`)."""

    angle_info: jnp.ndarray
    dis_info: jnp.ndarray
    par_info: jnp.ndarray
    ver_info: jnp.ndarray
    plane_chi: jnp.ndarray
    vp_chi: jnp.ndarray

    @staticmethod
    def from_config(planes_cfg) -> "PoseOptWeights":
        import numpy as np

        return PoseOptWeights(
            angle_info=jnp.float32(3282.8 / planes_cfg.angle_info ** 2),
            dis_info=jnp.float32(planes_cfg.distance_info ** 2),
            par_info=jnp.float32(3282.8 / planes_cfg.parallel_info ** 2),
            ver_info=jnp.float32(3282.8 / planes_cfg.vertical_info ** 2),
            plane_chi=jnp.float32(planes_cfg.chi),
            vp_chi=jnp.float32(planes_cfg.vp_chi),
        )


class PoseOptResult(NamedTuple):
    T_cw: jnp.ndarray
    point_inlier: jnp.ndarray
    line_inlier: jnp.ndarray
    plane_inlier: jnp.ndarray
    par_inlier: jnp.ndarray
    ver_inlier: jnp.ndarray
    n_point_inliers: jnp.ndarray
    chi2: jnp.ndarray


def _empty_points(dtype=jnp.float32) -> PointObs:
    return PointObs(jnp.zeros((0, 3), dtype), jnp.zeros((0, 2), dtype),
                    jnp.zeros((0,), dtype), jnp.ones((0,), dtype),
                    jnp.zeros((0,), bool))


def _empty_lines(dtype=jnp.float32) -> LineObs:
    return LineObs(jnp.zeros((0, 3), dtype), jnp.zeros((0, 3), dtype),
                   jnp.zeros((0, 3), dtype), jnp.ones((0,), dtype),
                   jnp.zeros((0,), bool))


def _empty_planes(dtype=jnp.float32) -> PlaneObs:
    return PlaneObs(jnp.zeros((0, 4), dtype), jnp.zeros((0, 4), dtype),
                    jnp.zeros((0,), bool))


def _block_residuals(T_cw, K, bf, points: PointObs, lines: LineObs,
                     planes: PlaneObs, par: PlaneObs, ver: PlaneObs):
    """Unweighted residual blocks at pose T_cw."""
    # points: (N, 3) [du, dv, dur]; third component zeroed for mono obs
    pc = se3.transform_points(T_cw, points.xw)
    uv_hat = se3.project(K, pc)
    z = jnp.maximum(pc[:, 2], 1e-6)
    ur_hat = uv_hat[:, 0] - bf / z
    is_stereo = points.u_right >= 0
    r_pt = jnp.concatenate([
        points.uv - uv_hat,
        jnp.where(is_stereo, points.u_right - ur_hat, 0.0)[:, None],
    ], axis=-1)

    # lines: (L, 2) point-to-image-line distance for both endpoints
    def endpoint_err(xw):
        p = se3.transform_points(T_cw, xw)
        uvh = se3.project(K, p)
        return (lines.line2d[:, 0] * uvh[:, 0] + lines.line2d[:, 1] * uvh[:, 1]
                + lines.line2d[:, 2])

    r_ln = jnp.stack([endpoint_err(lines.xw_s), endpoint_err(lines.xw_e)],
                     axis=-1)

    # planes: minimal-chart differences
    r_pl = plane_geo.ominus(plane_geo.transform(T_cw, planes.pi_w), planes.pi_obs)
    r_par = plane_geo.ominus_par(plane_geo.transform(T_cw, par.pi_w), par.pi_obs)
    r_ver = plane_geo.ominus_ver(plane_geo.transform(T_cw, ver.pi_w), ver.pi_obs)
    return r_pt, r_ln, r_pl, r_par, r_ver


def _chi2_blocks(residuals, points, lines, w: PoseOptWeights):
    r_pt, r_ln, r_pl, r_par, r_ver = residuals
    chi_pt = jnp.sum(r_pt * r_pt, axis=-1) * points.inv_sigma2
    chi_ln = (r_ln * r_ln) * lines.inv_sigma2[:, None]  # per endpoint
    chi_pl = (w.angle_info * (r_pl[:, 0] ** 2 + r_pl[:, 1] ** 2)
              + w.dis_info * r_pl[:, 2] ** 2)
    chi_par = w.par_info * jnp.sum(r_par * r_par, axis=-1)
    chi_ver = w.ver_info * jnp.sum(r_ver * r_ver, axis=-1)
    return chi_pt, chi_ln, chi_pl, chi_par, chi_ver


def _huber_w(chi2, delta2, enabled):
    w = jnp.where(chi2 > delta2, jnp.sqrt(delta2 / jnp.clip(chi2, 1e-12, None)),
                  1.0)
    return jnp.where(enabled, w, 1.0)


@partial(jax.jit, static_argnames=("rotation_fixed", "n_rounds", "n_iters"))
def pose_optimize(
    T_cw_init: jnp.ndarray,
    K: Tuple[float, float, float, float],
    bf: float,
    points: Optional[PointObs] = None,
    lines: Optional[LineObs] = None,
    planes: Optional[PlaneObs] = None,
    par_planes: Optional[PlaneObs] = None,
    ver_planes: Optional[PlaneObs] = None,
    weights: Optional[PoseOptWeights] = None,
    rotation_fixed: bool = False,
    n_rounds: int = 4,
    n_iters: int = 10,
) -> PoseOptResult:
    """Robust pose-only optimization. See module docstring for semantics."""
    points = points if points is not None else _empty_points()
    lines = lines if lines is not None else _empty_lines()
    planes = planes if planes is not None else _empty_planes()
    par_planes = par_planes if par_planes is not None else _empty_planes()
    ver_planes = ver_planes if ver_planes is not None else _empty_planes()
    if weights is None:
        from planarslam_tpu.config import PlaneConfig

        weights = PoseOptWeights.from_config(PlaneConfig())

    K = tuple(jnp.float32(v) for v in K)
    bf = jnp.float32(bf)
    dof = 3 if rotation_fixed else 6

    def update_pose(T, xi):
        if rotation_fixed:
            return T.at[:3, 3].add(xi)
        return se3.se3_exp(jnp.concatenate([xi[:3], xi[3:]])) @ T

    is_stereo = points.u_right >= 0
    gate_pt = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    def round_chi2_masks(T, in_pt, in_ln, in_pl, in_par, in_ver, huber_on):
        """Per-dim weights for the current inlier sets."""
        stereo_dim = jnp.stack([jnp.ones_like(is_stereo, jnp.float32),
                                jnp.ones_like(is_stereo, jnp.float32),
                                is_stereo.astype(jnp.float32)], axis=-1)

        def weights_at(T_cur, masks):
            in_pt_, in_ln_, in_pl_, in_par_, in_ver_ = masks
            res = _block_residuals(T_cur, K, bf, points, lines, planes,
                                   par_planes, ver_planes)
            chi = _chi2_blocks(res, points, lines, weights)
            chi_pt, chi_ln, chi_pl, chi_par, chi_ver = chi
            w_pt = (points.inv_sigma2 * _huber_w(chi_pt, gate_pt, huber_on)
                    * (points.valid & in_pt_))[:, None] * stereo_dim
            w_ln = (lines.inv_sigma2[:, None]
                    * _huber_w(chi_ln, CHI2_MONO, huber_on)
                    * (lines.valid & in_ln_)[:, None])
            w_pl_scalar = (_huber_w(chi_pl, weights.plane_chi, huber_on)
                           * (planes.valid & in_pl_))
            w_pl = w_pl_scalar[:, None] * jnp.stack(
                [weights.angle_info * jnp.ones_like(chi_pl),
                 weights.angle_info * jnp.ones_like(chi_pl),
                 weights.dis_info * jnp.ones_like(chi_pl)], axis=-1)
            w_par = (weights.par_info * _huber_w(chi_par, weights.vp_chi, huber_on)
                     * (par_planes.valid & in_par_))[:, None] * jnp.ones((1, 2))
            w_ver = (weights.ver_info * _huber_w(chi_ver, weights.vp_chi, huber_on)
                     * (ver_planes.valid & in_ver_))[:, None] * jnp.ones((1, 2))
            return res, (w_pt, w_ln, w_pl, w_par, w_ver)

        def flat(res_or_w):
            return jnp.concatenate([x.reshape(-1) for x in res_or_w])

        def total_chi2(T_cur, w_flat):
            res = _block_residuals(T_cur, K, bf, points, lines, planes,
                                   par_planes, ver_planes)
            r = flat(res)
            return jnp.sum(w_flat * r * r)

        masks = (in_pt, in_ln, in_pl, in_par, in_ver)

        def lm_step(carry, _):
            T, lam, chi_cur = carry
            res, ws = weights_at(T, masks)
            w_flat = jax.lax.stop_gradient(flat(ws))

            def res_fn(xi):
                T_new = update_pose(T, xi)
                return flat(_block_residuals(T_new, K, bf, points, lines,
                                             planes, par_planes, ver_planes))

            xi0 = jnp.zeros((dof,), jnp.float32)
            r0 = flat(res)
            J = jax.jacfwd(res_fn)(xi0)  # (D, dof)
            Jw = J * w_flat[:, None]
            H = Jw.T @ J
            g = Jw.T @ r0
            H_lm = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(dof)
            dx = -jnp.linalg.solve(H_lm, g)
            T_new = update_pose(T, dx)
            chi_new = total_chi2(T_new, w_flat)
            chi_old = jnp.sum(w_flat * r0 * r0)  # residuals already at T
            accept = (chi_new < chi_old) & jnp.all(jnp.isfinite(dx))
            T = jnp.where(accept, T_new, T)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-8, 1e6)
            return (T, lam, jnp.where(accept, chi_new, chi_old)), None

        init = (T, jnp.float32(1e-4), jnp.float32(jnp.inf))
        (T_out, _, chi_out), _ = jax.lax.scan(lm_step, init, None,
                                              length=n_iters)
        return T_out, chi_out

    # 4 rounds; each restarts from the initial pose with refreshed masks
    in_pt = jnp.ones_like(points.valid)
    in_ln = jnp.ones_like(lines.valid)
    in_pl = jnp.ones_like(planes.valid)
    in_par = jnp.ones_like(par_planes.valid)
    in_ver = jnp.ones_like(ver_planes.valid)
    T = T_cw_init
    chi_total = jnp.float32(0.0)
    for rnd in range(n_rounds):
        huber_on = jnp.asarray(rnd < n_rounds - 1)
        # every round restarts from the initial pose with the refreshed
        # inlier masks, exactly like the reference re-setting the estimate
        # to pFrame->mTcw at `src/Optimizer.cc:997`
        T, chi_total = round_chi2_masks(T_cw_init, in_pt, in_ln, in_pl,
                                        in_par, in_ver, huber_on)
        res = _block_residuals(T, K, bf, points, lines, planes,
                               par_planes, ver_planes)
        chi_pt, chi_ln, chi_pl, chi_par, chi_ver = _chi2_blocks(
            res, points, lines, weights)
        in_pt = chi_pt <= gate_pt
        in_ln = jnp.all(chi_ln <= 2.0 * CHI2_MONO, axis=-1)
        in_pl = chi_pl <= weights.plane_chi
        in_par = chi_par <= weights.vp_chi
        in_ver = chi_ver <= weights.vp_chi

    n_in = jnp.sum((points.valid & in_pt).astype(jnp.int32))
    return PoseOptResult(T, points.valid & in_pt, lines.valid & in_ln,
                         planes.valid & in_pl, par_planes.valid & in_par,
                         ver_planes.valid & in_ver, n_in, chi_total)
