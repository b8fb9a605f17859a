"""Closed-form absolute orientation (Horn) + RANSAC alignment.

Reimplements the reference's `Sim3Solver` (`src/Sim3Solver.cc`: Horn
quaternion method at `:56` inside a RANSAC over 3-point sets `:41-45`, with
mutual reprojection inlier checks) as a vmapped fixed-hypothesis batch.
For RGB-D loop closing scale is observable and fixed to 1
(the reference's mbFixScale=true path), so the SE3 variant is the default;
the similarity (scale) variant is provided for completeness.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.geometry import se3


def horn_align(src: jnp.ndarray, dst: jnp.ndarray,
               weights: jnp.ndarray, with_scale: bool = False):
    """Weighted closed-form alignment: dst ≈ s R src + t.

    src, dst: (N, 3); weights: (N,) nonnegative. Returns (R, t, s).
    Uses the SVD form of Horn's method (equivalent to the quaternion form
    the reference uses).
    """
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    C = (xd * w[:, None]).T @ xs  # (3, 3)
    U, S, Vt = jnp.linalg.svd(C)
    sign = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(sign)
    R = U @ D @ Vt
    if with_scale:
        var = jnp.sum(w * jnp.sum(xs * xs, axis=-1))
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var, 1e-12)
    else:
        s = jnp.ones(())
    t = mu_d - s * (R @ mu_s)
    return R, t, s


@partial(jax.jit, static_argnames=("with_scale",))
def _ransac_align(src, dst, valid, triplets, threshold, with_scale=False):
    n = src.shape[0]

    def one(tri):
        w = jnp.zeros((n,)).at[tri].set(1.0) * valid
        R, t, s = horn_align(src, dst, w + 1e-9, with_scale)
        pred = s * (src @ R.T) + t
        err = jnp.sum((pred - dst) ** 2, axis=-1)
        inl = (err < threshold ** 2) & (valid > 0)
        return jnp.sum(inl), R, t, s

    n_inl, Rs, ts, ss = jax.vmap(one)(triplets)
    best = jnp.argmax(n_inl)
    R, t, s = Rs[best], ts[best], ss[best]
    # refit on inliers
    pred = s * (src @ R.T) + t
    err = jnp.sum((pred - dst) ** 2, axis=-1)
    inl = (err < threshold ** 2) & (valid > 0)
    R, t, s = horn_align(src, dst, inl.astype(jnp.float32) + 1e-9, with_scale)
    pred = s * (src @ R.T) + t
    err = jnp.sum((pred - dst) ** 2, axis=-1)
    inl = (err < threshold ** 2) & (valid > 0)
    return R, t, s, jnp.sum(inl), inl


def _pad_bucket(n: int) -> int:
    """Static shape bucket — avoids a recompile for every correspondence
    count (each XLA compile costs ~0.5-1 s)."""
    for cap in (64, 256, 1024, 4096):
        if n <= cap:
            return cap
    return ((n + 4095) // 4096) * 4096


def _pad_pair(src, dst, n_hyp, seed=7):
    n = len(src)
    cap = _pad_bucket(n)
    s = np.zeros((cap, 3), np.float32)
    d = np.zeros((cap, 3), np.float32)
    s[:n] = src
    d[:n] = dst
    v = np.zeros((cap,), np.float32)
    v[:n] = 1.0
    rng = np.random.default_rng(seed)
    picks = rng.integers(0, max(n, 1), (n_hyp, 3)).astype(np.int32)
    return s, d, v, picks


def horn_ransac_se3(src: np.ndarray, dst: np.ndarray,
                    threshold: float = 0.10, n_hyp: int = 64
                    ) -> Tuple[np.ndarray, int, np.ndarray]:
    """RANSAC rigid alignment dst ≈ T src. Returns (T (4,4), n_inliers,
    inlier mask)."""
    n = len(src)
    if n < 3:
        return np.eye(4, dtype=np.float32), 0, np.zeros(n, bool)
    s, d, v, picks = _pad_pair(src, dst, n_hyp)
    R, t, sc, n_inl, inl = _ransac_align(
        jnp.asarray(s), jnp.asarray(d), jnp.asarray(v), jnp.asarray(picks),
        jnp.float32(threshold))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T, int(n_inl), np.asarray(inl)[:n]


@partial(jax.jit, static_argnames=("fix_scale", "n_iters"))
def _refine_relative(T12_init, s_init, pts1_c, pts2_c, uv1, uv2, valid, K,
                     fix_scale=True, n_iters=8, huber_chi2=10.0):
    """GN refinement of the relative transform between two cameras
    (`Optimizer::OptimizeSim3` `src/Optimizer.cc:3739`): bidirectional
    reprojection — points of camera 2 projected into camera 1 via
    S12 = (s R12, t12) and points of camera 1 into camera 2 via S12^-1 —
    with Huber weights. 7-dof tangent [rho, phi, sigma]; sigma frozen when
    fix_scale (RGB-D)."""
    fx, fy, cx, cy = K

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([fx * p[..., 0] / z + cx,
                          fy * p[..., 1] / z + cy], axis=-1)

    def residuals(xi, T, s):
        dT = se3.se3_exp(xi[:6])
        T_new = dT @ T
        s_new = s * jnp.exp(jnp.where(fix_scale, 0.0, xi[6]))
        R12 = T_new[:3, :3]
        t12 = T_new[:3, 3]
        p2_in_1 = s_new * (pts2_c @ R12.T) + t12
        r1 = (uv1 - project(p2_in_1)) * valid[:, None]
        R21 = R12.T
        p1_in_2 = (pts1_c - t12) @ R12 / jnp.maximum(s_new, 1e-9)
        r2 = (uv2 - project(p1_in_2)) * valid[:, None]
        return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

    def step(carry, _):
        T, s = carry
        xi0 = jnp.zeros((7,), jnp.float32)
        r0 = residuals(xi0, T, s)
        # Huber on per-correspondence chi2
        r_pairs = r0.reshape(2, -1, 2)
        chi2 = jnp.sum(r_pairs ** 2, axis=-1)
        w = jnp.where(chi2 > huber_chi2,
                      jnp.sqrt(huber_chi2 / jnp.clip(chi2, 1e-9, None)), 1.0)
        w_flat = jnp.repeat(w.reshape(-1), 2)
        J = jax.jacfwd(residuals)(xi0, T, s)
        Jw = J * w_flat[:, None]
        H = Jw.T @ J + 1e-6 * jnp.eye(7)
        g = Jw.T @ r0
        dx = -jnp.linalg.solve(H, g)
        T_new = se3.se3_exp(dx[:6]) @ T
        s_new = s * jnp.exp(jnp.where(fix_scale, 0.0, dx[6]))
        ok = jnp.all(jnp.isfinite(dx))
        return (jnp.where(ok, T_new, T), jnp.where(ok, s_new, s)), None

    (T, s), _ = jax.lax.scan(step, (T12_init, s_init), None, length=n_iters)
    return T, s


def refine_relative_se3(T12_init: np.ndarray, pts1_c: np.ndarray,
                        pts2_c: np.ndarray, uv1: np.ndarray, uv2: np.ndarray,
                        valid: np.ndarray,
                        K: Tuple[float, float, float, float],
                        fix_scale: bool = True):
    """Host wrapper for the OptimizeSim3-style refinement. Returns (T12, s)."""
    T, s = _refine_relative(
        jnp.asarray(T12_init.astype(np.float32)), jnp.float32(1.0),
        jnp.asarray(pts1_c.astype(np.float32)),
        jnp.asarray(pts2_c.astype(np.float32)),
        jnp.asarray(uv1.astype(np.float32)),
        jnp.asarray(uv2.astype(np.float32)),
        jnp.asarray(valid.astype(np.float32)),
        tuple(float(v) for v in K), fix_scale=fix_scale)
    return np.asarray(T), float(s)


def horn_ransac_sim3(src: np.ndarray, dst: np.ndarray,
                     threshold: float = 0.10, n_hyp: int = 64):
    """Similarity variant (scale free) for mono-style loop closing."""
    n = len(src)
    if n < 3:
        return np.eye(4, dtype=np.float32), 1.0, 0, np.zeros(n, bool)
    sp, dp, v, picks = _pad_pair(src, dst, n_hyp)
    R, t, s, n_inl, inl = _ransac_align(
        jnp.asarray(sp), jnp.asarray(dp), jnp.asarray(v), jnp.asarray(picks),
        jnp.float32(threshold), with_scale=True)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T, float(s), int(n_inl), np.asarray(inl)[:n]
