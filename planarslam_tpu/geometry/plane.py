"""Minimal plane parameterization and structural residuals.

TPU-native re-design of the reference's ``g2oAddition/Plane3D.h:16-183``:
planes are Hessian-form 4-vectors (n, d) with n·x + d = 0, ||n|| = 1 and the
g2o sign convention d >= 0; errors between planes live in a minimal 2/3-dof
chart like the reference's ominus / ominus_par / ominus_ver.

Autodiff-aware redesign (deliberate delta vs the reference): g2o builds the
(azimuth, elevation) chart on the *estimated* plane
(`Plane3D.h` ominus: ``R = rotation(normal()).transpose()`` with ``normal()``
the transformed estimate), which under JAX autodiff yields NaN/ill-conditioned
Jacobians at chart gimbal points (axis-aligned normals — ubiquitous in
Manhattan scenes). We instead express the angular error in the tangent basis
of the *measured* normal, which is constant during pose linearization:

    r_ang = B(n_meas)^T n_est           (2-dof, |r_ang| = sin(angle))
    r_d   = d_est - d_meas

This has the same zero set and agrees with the reference's
(azimuth, elevation, d) error to first order — which is all Gauss-Newton
consumes — while keeping gradients finite everywhere. The parallel variant
flips the measured normal into the estimate's hemisphere
(`Plane3D.h:155-173`); the vertical variant penalizes the deviation from
perpendicularity (`Plane3D.h:136-153`).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def _safe_norm(v, axis=-1):
    """Norm with a well-defined gradient at v = 0 (jnp.linalg.norm's gradient
    is NaN there, which would poison pose Jacobians)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + _EPS)


def normalize(coeffs):
    """Scale (a, b, c, d) to unit normal and flip so d >= 0 (g2o
    `Plane3D.h` normalize semantics)."""
    n = _safe_norm(coeffs[..., :3])[..., None]
    c = coeffs / n
    return c * jnp.where(c[..., 3:4] < 0, -1.0, 1.0)


def transform(T, coeffs):
    """Transform plane coefficients by a point transform T (x' = T x).

    If points map as x_b = T_ba x_a, plane coefficients map as
    pi_b = T_ba^{-T} pi_a. Output is NOT re-canonicalized (sign preserved)
    so the function stays smooth; normalize() explicitly where needed.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n = coeffs[..., :3]
    d = coeffs[..., 3]
    n_new = (R @ n[..., None])[..., 0]
    d_new = d - jnp.sum(n_new * t, axis=-1)
    return jnp.concatenate([n_new, d_new[..., None]], axis=-1)


def tangent_basis(n):
    """Two orthonormal vectors spanning the plane perpendicular to n (...,3).

    Branch-free construction with finite gradients for all unit n.
    """
    # pick the axis least aligned with n as the seed
    ax = jnp.abs(n)
    seed = jnp.where((ax[..., 0:1] <= ax[..., 1:2]) & (ax[..., 0:1] <= ax[..., 2:3]),
                     jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
                     jnp.where(ax[..., 1:2] <= ax[..., 2:3],
                               jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
                               jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape)))
    b1 = jnp.cross(n, seed)
    b1 = b1 / _safe_norm(b1)[..., None]
    b2 = jnp.cross(n, b1)
    return b1, b2


def _hemi_align(p, ref_n):
    """Flip plane p so its normal lies in the hemisphere of ref_n."""
    dot = jnp.sum(p[..., :3] * ref_n, axis=-1, keepdims=True)
    return p * jnp.where(dot < 0, -1.0, 1.0)


def ominus(p_est, p_meas):
    """3-dof error between the estimated and measured plane (reference
    `Plane3D.h:127-134`): 2 angular dofs + distance difference."""
    p_est = normalize(p_est)
    p_meas = normalize(p_meas)
    b1, b2 = tangent_basis(p_meas[..., :3])
    n_e = p_est[..., :3]
    return jnp.stack([
        jnp.sum(b1 * n_e, axis=-1),
        jnp.sum(b2 * n_e, axis=-1),
        p_est[..., 3] - p_meas[..., 3],
    ], axis=-1)


def ominus_par(p_est, p_meas):
    """2-dof parallel-plane error (reference `Plane3D.h:155-173`): distance
    free; measured normal flipped into the estimate's hemisphere so
    anti-parallel counts as parallel."""
    p_est = normalize(p_est)
    p_meas = normalize(p_meas)
    n_e = p_est[..., :3]
    n_m = _hemi_align(p_meas, n_e)[..., :3]
    b1, b2 = tangent_basis(n_m)
    return jnp.stack([
        jnp.sum(b1 * n_e, axis=-1),
        jnp.sum(b2 * n_e, axis=-1),
    ], axis=-1)


def ominus_ver(p_est, p_meas):
    """2-dof perpendicular-plane error (reference `Plane3D.h:136-153`).

    Zero iff n_est ⟂ n_meas; magnitude ≈ deviation angle from 90°. The
    second component is identically zero (kept for the reference's 2-dof
    information-matrix shape).
    """
    p_est = normalize(p_est)
    p_meas = normalize(p_meas)
    dot = jnp.sum(p_est[..., :3] * p_meas[..., :3], axis=-1)
    return jnp.stack([dot, jnp.zeros_like(dot)], axis=-1)


def transform_np(T, coeffs):
    """Host (numpy) version of `transform` — avoids eager device dispatch on
    per-frame host paths (each eager op costs ~20 ms under the axon tunnel)."""
    import numpy as np

    T = np.asarray(T)
    c = np.asarray(coeffs)
    single = c.ndim == 1
    c2 = np.atleast_2d(c)
    n_new = c2[:, :3] @ T[:3, :3].T
    d_new = c2[:, 3] - n_new @ T[:3, 3]
    out = np.concatenate([n_new, d_new[:, None]], axis=-1)
    return out[0] if single else out


def point_plane_distance(coeffs, pts):
    """Signed distance of points (..., N, 3) to plane (..., 4)."""
    c = normalize(coeffs)
    return jnp.sum(pts * c[..., None, :3], axis=-1) + c[..., None, 3]
