"""Matrix-free preconditioned-CG bundle adjustment for large maps.

Same problem and measurement model as `ba_core.ba_solve` (the reference's
`Optimizer::GlobalBundleAdjustemnt`, `src/Optimizer.cc:35`) but the reduced
camera system S = Hcc - Hcp Hpp^-1 Hcp^T is never materialized: ba_solve's
dense (Kt, M, 6, 3) cross tensor and (6 Kt)^2 Cholesky cap its window at
~128 keyframes, while this variant only forms per-observation Jacobians and
block diagonals ((Kt, 6, 6) and (M, 3, 3)), so a whole 512+-keyframe map is
one optimization problem.

TPU mapping: every S-matvec is a handful of batched einsums over the
observation tables plus two segment_sums — dense regular work the MXU
tiles, no sparsity structures. CG runs a fixed iteration count under
`lax.scan` (static shapes, one compiled program for the whole LM loop).
The preconditioner is the block-Jacobi of S, assembled per-observation —
exact for tables whose (keyframe, landmark) pairs are unique (points, line
endpoints; true by construction of `local_ba.build_*_tables`) and
approximate across the three plane tables (cross terms between a plane's
direct/parallel/vertical rows are dropped).

Gauge and LM policy match ba_solve: fixed poses are eliminated exactly
(their tangent entries pinned to zero through rhs/matvec/preconditioner
masks), absolute-floor Levenberg damping, per-observation-difference step
acceptance (f32-safe).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from planarslam_tpu.solvers.ba_core import (
    CHI2_MONO, BAWeights, LineTables, PlaneTables, PointTables,
    _all_chi2_tables, _huber_w_fn, _line_jacs, _plane_jacs, _point_jacs,
    _robust_decrease_tables, plane_retract)
from planarslam_tpu.geometry import plane as plane_geo
from planarslam_tpu.geometry import se3


@partial(jax.jit, static_argnames=("n_iters", "n_cg", "huber"))
def ba_solve_pcg(
    poses: jnp.ndarray,        # (Kt, 4, 4)
    fixed_mask: jnp.ndarray,   # (Kt,) f32, 1.0 = pose is fixed
    lm_xyz: jnp.ndarray,       # (P, 3) points + line endpoints
    plane_base: jnp.ndarray,   # (Q, 4) plane coefficients at entry
    pt: PointTables,
    ln: LineTables,
    pl: PlaneTables,
    par: PlaneTables,
    ver: PlaneTables,
    K: Tuple[float, float, float, float],
    bf: float,
    w: BAWeights,
    n_iters: int = 12,
    n_cg: int = 48,
    huber: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Drop-in for ba_core.ba_solve at window sizes the dense Schur cannot
    hold. Returns (poses, lm_xyz, plane_coeffs, chi2 dict per table)."""
    Kt = poses.shape[0]
    P = lm_xyz.shape[0]
    Q = plane_base.shape[0]
    M = P + Q

    pt_slot = jnp.clip(pt.slot, 0, max(P - 1, 0))
    ln_slot = jnp.clip(ln.slot, 0, max(P - 1, 0))
    pl_slot = jnp.clip(pl.slot, 0, max(Q - 1, 0))
    par_slot = jnp.clip(par.slot, 0, max(Q - 1, 0))
    ver_slot = jnp.clip(ver.slot, 0, max(Q - 1, 0))
    is_stereo = pt.ur >= 0
    gate_pt = jnp.where(is_stereo, 7.815, CHI2_MONO)
    have_ln = ln.slot.shape[1] > 0
    have_q = Q > 0

    gates = (gate_pt, CHI2_MONO, w.plane_chi, w.vp_chi, w.vp_chi)
    masks = (pt.mask, ln.mask, pl.mask, par.mask, ver.mask)
    free = (1.0 - fixed_mask)[:, None]               # (Kt, 1)

    def all_chi2(poses_c, lm_c):
        return _all_chi2_tables(
            poses_c, lm_c, plane_base, P, pt, ln, pl, par, ver,
            pt_slot, ln_slot, pl_slot, par_slot, ver_slot,
            is_stereo, K, bf, w)

    plane_infos = (
        (pl, pl_slot, plane_geo.ominus,
         jnp.stack([w.angle_info, w.angle_info, w.dis_info]), w.plane_chi),
        (par, par_slot, plane_geo.ominus_par,
         jnp.stack([w.par_info, w.par_info]), w.vp_chi),
        (ver, ver_slot, plane_geo.ominus_ver,
         jnp.stack([w.ver_info, w.ver_info]), w.vp_chi),
    )

    def step(state, _):
        poses_c, lm_c, lam, _ = state
        pts = lm_c[:P]
        theta = lm_c[P:]

        # ---- per-observation residuals / Jacobians / IRLS weights -------
        r_pt, Jpose, Jpt = _point_jacs(poses_c, pts, pt_slot, pt.uv, pt.ur,
                                       is_stereo, K, bf)
        chi_pt = jnp.sum(r_pt * r_pt, axis=-1) * pt.inv_s2
        w_pt = pt.inv_s2 * _huber_w_fn(chi_pt, gate_pt, huber) * pt.mask
        dim = jnp.stack([jnp.ones_like(w_pt), jnp.ones_like(w_pt),
                         is_stereo.astype(w_pt.dtype)], axis=-1)
        Wp = w_pt[..., None] * dim                   # (Kt, F, 3)

        if have_ln:
            r_ln, Jp_ln, Jl_ln = _line_jacs(poses_c, pts, ln_slot,
                                            ln.line2d, K)
            chi_ln = r_ln * r_ln * ln.inv_s2
            w_ln = (ln.inv_s2 * _huber_w_fn(chi_ln, CHI2_MONO, huber)
                    * ln.mask)

        pl_jacs = []
        if have_q:
            for tables, slot, err_fn, info_vec, gate in plane_infos:
                if tables.slot.shape[1] == 0:
                    continue
                rr, Jx, Jt = _plane_jacs(poses_c, plane_base, theta, slot,
                                         tables.pi_obs, err_fn, poses.dtype)
                chi = jnp.sum(rr * rr * info_vec, axis=-1)
                w_s = _huber_w_fn(chi, gate, huber) * tables.mask
                Wv = w_s[..., None] * info_vec       # (Kt, Pp, D)
                pl_jacs.append((slot, rr, Jx, Jt, Wv))

        # ---- block diagonals + gradient ----------------------------------
        Hcc = jnp.einsum("kfai,kfa,kfaj->kij", Jpose, Wp, Jpose)
        bc = jnp.einsum("kfai,kfa->ki", Jpose, r_pt * Wp)
        flat = pt_slot.reshape(-1)
        Hpp = jax.ops.segment_sum(
            jnp.einsum("kfai,kfa,kfaj->kfij", Jpt, Wp, Jpt).reshape(-1, 3, 3),
            flat, M)
        bp = jax.ops.segment_sum(
            jnp.einsum("kfai,kfa->kfi", Jpt, r_pt * Wp).reshape(-1, 3),
            flat, M)
        if have_ln:
            Hcc += jnp.einsum("kli,kl,klj->kij", Jp_ln, w_ln, Jp_ln)
            bc += jnp.einsum("kli,kl->ki", Jp_ln, r_ln * w_ln)
            flat_l = ln_slot.reshape(-1)
            Hpp += jax.ops.segment_sum(
                jnp.einsum("kli,kl,klj->klij", Jl_ln, w_ln, Jl_ln
                           ).reshape(-1, 3, 3), flat_l, M)
            bp += jax.ops.segment_sum(
                (Jl_ln * (r_ln * w_ln)[..., None]).reshape(-1, 3),
                flat_l, M)
        for slot, rr, Jx, Jt, Wv in pl_jacs:
            Hcc += jnp.einsum("kpdi,kpd,kpdj->kij", Jx, Wv, Jx)
            bc += jnp.einsum("kpdi,kpd->ki", Jx, rr * Wv)
            flat_p = (slot + P).reshape(-1)
            Hpp += jax.ops.segment_sum(
                jnp.einsum("kpdi,kpd,kpdj->kpij", Jt, Wv, Jt
                           ).reshape(-1, 3, 3), flat_p, M)
            bp += jax.ops.segment_sum(
                jnp.einsum("kpdi,kpd->kpi", Jt, rr * Wv).reshape(-1, 3),
                flat_p, M)

        # ---- Levenberg damping (absolute floor, as in ba_solve) ----------
        diag_p = jax.vmap(jnp.diag)(Hpp)
        n_obs_p = jnp.sum(diag_p.sum(-1) > 0) + 1
        mu_p = jnp.sum(diag_p) / (3 * n_obs_p)
        Hpp_d = (Hpp + lam * jax.vmap(jnp.diag)(diag_p)
                 + (lam * mu_p + 1e-6) * jnp.eye(3))
        Hpp_inv = jnp.linalg.inv(Hpp_d)

        diag_c = jax.vmap(jnp.diag)(Hcc)             # (Kt, 6)
        mu_c = (jnp.sum(diag_c * free) /
                (jnp.sum(free) * 6.0 + 1.0))
        Hcc_d = (Hcc + lam * jax.vmap(jnp.diag)(diag_c)
                 + (lam * mu_c + 1e-8) * jnp.eye(6))

        # ---- matrix-free Schur products ----------------------------------
        def hppinv_apply(v):                         # (M, 3) -> (M, 3)
            return jnp.einsum("pij,pj->pi", Hpp_inv, v)

        def hcpT_x(x):                               # (Kt, 6) -> (M, 3)
            u = jnp.einsum("kfab,kb->kfa", Jpose, x)
            out = jax.ops.segment_sum(
                jnp.einsum("kfai,kfa->kfi", Jpt, Wp * u).reshape(-1, 3),
                flat, M)
            if have_ln:
                ul = jnp.einsum("klb,kb->kl", Jp_ln, x)
                out += jax.ops.segment_sum(
                    (Jl_ln * (w_ln * ul)[..., None]).reshape(-1, 3),
                    flat_l, M)
            for slot, _rr, Jx, Jt, Wv in pl_jacs:
                up = jnp.einsum("kpdb,kb->kpd", Jx, x)
                out += jax.ops.segment_sum(
                    jnp.einsum("kpdi,kpd->kpi", Jt, Wv * up).reshape(-1, 3),
                    (slot + P).reshape(-1), M)
            return out

        def hcp_y(y):                                # (M, 3) -> (Kt, 6)
            g = y[pt_slot]                           # (Kt, F, 3)
            u = jnp.einsum("kfai,kfi->kfa", Jpt, g)
            out = jnp.einsum("kfab,kfa->kb", Jpose, Wp * u)
            if have_ln:
                gl = y[ln_slot]
                ul = jnp.einsum("kli,kli->kl", Jl_ln, gl)
                out += jnp.einsum("klb,kl->kb", Jp_ln, w_ln * ul)
            for slot, _rr, Jx, Jt, Wv in pl_jacs:
                gp = y[slot + P]
                up = jnp.einsum("kpdi,kpi->kpd", Jt, gp)
                out += jnp.einsum("kpdb,kpd->kb", Jx, Wv * up)
            return out

        def s_mv(x):                                 # (Kt, 6) -> (Kt, 6)
            xm = x * free
            out = jnp.einsum("kij,kj->ki", Hcc_d, xm)
            out -= hcp_y(hppinv_apply(hcpT_x(xm)))
            return out * free

        rhs = (bc - hcp_y(hppinv_apply(bp))) * free

        # ---- block-Jacobi preconditioner of S ----------------------------
        C = jnp.einsum("kfai,kfa,kfaj->kfij", Jpose, Wp, Jpt)  # (Kt,F,6,3)
        Hg = Hpp_inv[pt_slot]                                  # (Kt,F,3,3)
        corr = jnp.einsum("kfij,kfjl,kfml->kim", C, Hg, C)
        if have_ln:
            # Jp_ln (Kt,L2,6) outer Jl_ln (Kt,L2,3) weighted by w_ln
            Cl = jnp.einsum("kai,ka,kaj->kaij", Jp_ln, w_ln, Jl_ln)
            Hgl = Hpp_inv[ln_slot]
            corr += jnp.einsum("kaij,kajl,kaml->kim", Cl, Hgl, Cl)
        for slot, _rr, Jx, Jt, Wv in pl_jacs:
            Cp = jnp.einsum("kpdi,kpd,kpdj->kpij", Jx, Wv, Jt)
            Hgp = Hpp_inv[slot + P]
            corr += jnp.einsum("kpij,kpjl,kpml->kim", Cp, Hgp, Cp)
        Pm = Hcc_d - corr + (1e-3 * mu_c + 1e-8) * jnp.eye(6)
        Minv = jnp.linalg.inv(Pm)

        def precond(r):
            return jnp.einsum("kij,kj->ki", Minv, r * free) * free

        # ---- CG on the reduced camera system -----------------------------
        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_body(carry, _):
            x, r, p, rz = carry
            Ap = s_mv(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
            alpha = jnp.where(pAp > 0, alpha, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(rz > 0, rz, 1.0)
            beta = jnp.where(rz > 0, beta, 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (xc, _, _, _), _ = jax.lax.scan(cg_body, (x0, r0, p0, rz0), None,
                                        length=n_cg)
        dxc = -xc
        dxp = -hppinv_apply(bp + hcpT_x(dxc))

        poses_new = jax.vmap(se3.se3_exp)(dxc) @ poses_c
        lm_new = lm_c + dxp

        chis_new = all_chi2(poses_new, lm_new)
        chis_cur = all_chi2(poses_c, lm_c)
        decrease = _robust_decrease_tables(chis_new, chis_cur, gates, masks,
                                           huber)
        finite = (jnp.isfinite(decrease) & jnp.all(jnp.isfinite(dxc))
                  & jnp.all(jnp.isfinite(dxp)))
        accept = (decrease < 0.0) & finite
        poses_out = jnp.where(accept, poses_new, poses_c)
        lm_out = jnp.where(accept, lm_new, lm_c)
        lam_out = jnp.clip(jnp.where(accept, lam * 0.3, lam * 6.0),
                           1e-8, 1e6)
        return (poses_out, lm_out, lam_out, decrease), None

    dt = poses.dtype
    lm0 = jnp.concatenate([lm_xyz.astype(dt), jnp.zeros((Q, 3), dt)], axis=0)
    init = (poses, lm0, jnp.asarray(1e-4, dt), jnp.asarray(jnp.inf, dt))
    (poses_f, lm_f, _, _), _ = jax.lax.scan(step, init, None, length=n_iters)

    chi_pt, chi_ln, chi_pl, chi_par, chi_ver = all_chi2(poses_f, lm_f)
    plane_out = plane_geo.normalize(plane_retract(plane_base, lm_f[P:]))
    return poses_f, lm_f[:P], plane_out, {
        "pt": chi_pt, "ln": chi_ln, "pl": chi_pl, "par": chi_par,
        "ver": chi_ver}
