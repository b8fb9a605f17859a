"""Minimal plane parameterization and structural residuals.

TPU-native re-design of the reference's ``g2oAddition/Plane3D.h:16-183``:
planes are Hessian-form 4-vectors (n, d) with n·x + d = 0 and ||n|| = 1,
and errors between planes are expressed in the minimal (azimuth, elevation,
distance) chart — `ominus` — with the 2-dof parallel (`ominus_par`,
flip-normal, `Plane3D.h:155-173`) and vertical (`ominus_ver`, 90°-rotated,
`Plane3D.h:136-153`) variants used by the structural constraints.

All functions are jnp, batched over leading axes, differentiable (the pose
optimizers take Jacobians through them with jax.jacfwd).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def normalize(coeffs):
    """Scale (a, b, c, d) so the normal is unit length."""
    n = jnp.linalg.norm(coeffs[..., :3], axis=-1, keepdims=True).clip(_EPS)
    return coeffs / n


def transform(T, coeffs):
    """Transform plane coefficients by a point transform T (x' = T x).

    If points map as x_b = T_ba x_a, plane coefficients map as
    pi_b = T_ba^{-T} pi_a.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n = coeffs[..., :3]
    d = coeffs[..., 3]
    n_new = (R @ n[..., None])[..., 0]
    d_new = d - jnp.sum(n_new * t, axis=-1)
    return jnp.concatenate([n_new, d_new[..., None]], axis=-1)


def _azimuth(v):
    return jnp.arctan2(v[..., 1], v[..., 0])


def _elevation(v):
    return jnp.arctan2(v[..., 2], jnp.linalg.norm(v[..., :2], axis=-1).clip(_EPS))


def _rotation_from_normal(n):
    """Rotation whose first column is n (reference `Plane3D.h` rotation())."""
    az = _azimuth(n)
    el = _elevation(n)
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se = jnp.cos(el), jnp.sin(el)
    return jnp.stack([
        jnp.stack([ca * ce, -sa, -ca * se], axis=-1),
        jnp.stack([sa * ce, ca, -sa * se], axis=-1),
        jnp.stack([se, jnp.zeros_like(se), ce], axis=-1),
    ], axis=-2)


def ominus(p_est, p_meas):
    """3-dof error between two planes (reference `Plane3D.h:127-134`).

    Rotates the measured normal into the chart where the estimated normal is
    (1,0,0); the error is (azimuth, elevation) of the rotated normal plus the
    distance difference.
    """
    p_est = normalize(p_est)
    p_meas = normalize(p_meas)
    R = jnp.swapaxes(_rotation_from_normal(p_est[..., :3]), -1, -2)
    n = (R @ p_meas[..., :3, None])[..., 0]
    d = p_est[..., 3] - p_meas[..., 3]
    return jnp.stack([_azimuth(n), _elevation(n), d], axis=-1)


def ominus_par(p_est, p_meas):
    """2-dof parallel-plane error (reference `Plane3D.h:155-173`).

    Distance is unconstrained; the measured normal is flipped if it points
    away from the estimate so anti-parallel planes also count as parallel.
    """
    p_est = normalize(p_est)
    p_meas = normalize(p_meas)
    dot = jnp.sum(p_est[..., :3] * p_meas[..., :3], axis=-1, keepdims=True)
    n_meas = p_meas[..., :3] * jnp.where(dot < 0, -1.0, 1.0)
    R = jnp.swapaxes(_rotation_from_normal(p_est[..., :3]), -1, -2)
    n = (R @ n_meas[..., None])[..., 0]
    return jnp.stack([_azimuth(n), _elevation(n)], axis=-1)


def ominus_ver(p_est, p_meas):
    """2-dof vertical(perpendicular)-plane error (reference `Plane3D.h:136-153`).

    The measured normal is rotated 90° (swap towards the estimate's chart) so
    that perpendicularity maps to a zero of the same (azimuth, elevation)
    residual.
    """
    p_est = normalize(p_est)
    p_meas = normalize(p_meas)
    # 90°-rotated measured normal: remove the component along the estimate and
    # renormalize, giving the nearest direction perpendicular-to-measured in
    # the estimate/measure plane (the zero set is n_est ⟂ n_meas).
    n_e = p_est[..., :3]
    n_m = p_meas[..., :3]
    dot = jnp.sum(n_e * n_m, axis=-1, keepdims=True)
    # target direction: rotate n_m by 90° within span{n_e, n_m} towards n_e
    ortho = n_e - dot * n_m
    ortho = ortho / jnp.linalg.norm(ortho, axis=-1, keepdims=True).clip(_EPS)
    rotated = jnp.where(dot >= 0, ortho, -ortho)
    R = jnp.swapaxes(_rotation_from_normal(n_e), -1, -2)
    n = (R @ rotated[..., None])[..., 0]
    return jnp.stack([_azimuth(n), _elevation(n)], axis=-1)


def point_plane_distance(coeffs, pts):
    """Signed distance of points (..., N, 3) to plane (..., 4)."""
    c = normalize(coeffs)
    return jnp.sum(pts * c[..., None, :3], axis=-1) + c[..., None, 3]
