"""SO(3)/SE(3) Lie-group utilities (jnp; usable under jit/vmap and from host).

Replaces the reference's ``src/Converter.cc`` (cv::Mat <-> Eigen <-> g2o
SE3Quat conversions) plus g2o's SE3 exp/log. Everything here is functional,
float32-friendly, and batched via vmap at call sites. Poses are stored as
4x4 world-from/to matrices; the tangent convention is [rho, phi] with
T = exp([rho, phi]) using the standard SE(3) left Jacobian.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix of a 3-vector (reference `include/auxiliar.h` skew)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def so3_exp(phi):
    """Rodrigues: 3-vector -> rotation matrix. Safe at phi ~ 0."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    K2 = K @ K
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS)
    # Taylor fallback for tiny angles
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a * K + b * K2


def so3_log(R):
    """Rotation matrix -> 3-vector (axis*angle). Safe near identity and pi.

    theta comes from arctan2(|vee|/2, (tr-1)/2) rather than arccos — arccos
    has an infinite derivative at the identity, which poisons pose-graph
    Jacobians for near-zero error edges.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    sin_theta = 0.5 * jnp.sqrt(jnp.sum(w * w, axis=-1) + _EPS)
    theta = jnp.arctan2(sin_theta, cos_theta)
    scale = jnp.where(sin_theta[..., None] < 1e-4,
                      0.5 + theta[..., None] ** 2 / 12.0,
                      theta[..., None] / (2.0 * sin_theta[..., None]))
    general = scale * w
    # Near theta = pi the vee-vector vanishes; recover axis from diagonal.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) /
                       jnp.clip(1.0 - cos_theta[..., None], _EPS, None), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # Fix signs from off-diagonal sums
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    near_pi = theta[..., None] > (jnp.pi - 1e-3)
    return jnp.where(near_pi, axis * theta[..., None], general)


def _so3_left_jacobian(phi):
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    K2 = K @ K
    a = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS)
    b = (theta - jnp.sin(theta)) / (theta2.clip(_EPS) * theta)
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, a)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, b)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a * K + b * K2


def se3_exp(xi):
    """Tangent [rho(3), phi(3)] -> 4x4 transform."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    t = (_so3_left_jacobian(phi) @ rho[..., None])[..., 0]
    return rt_to_T(R, t)


def se3_log(T):
    R, t = T[..., :3, :3], T[..., :3, 3]
    phi = so3_log(R)
    J = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(J, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def rt_to_T(R, t):
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def T_inv(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_T(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T, pts):
    """Apply 4x4 transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def quat_to_R(q):
    """Unit quaternion (x, y, z, w) -> rotation matrix (TUM trajectory order)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.clip(n, _EPS, None)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack([
        jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
        jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
        jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
    ], axis=-2)


def R_to_quat(R):
    """Rotation matrix -> unit quaternion (x, y, z, w), w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Branch-free Shepperd's method: compute all four candidates, pick largest.
    qw2 = jnp.clip(1.0 + tr, 0.0, None)
    qx2 = jnp.clip(1.0 + m00 - m11 - m22, 0.0, None)
    qy2 = jnp.clip(1.0 - m00 + m11 - m22, 0.0, None)
    qz2 = jnp.clip(1.0 - m00 - m11 + m22, 0.0, None)
    cand = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    idx = jnp.argmax(cand, axis=-1)

    def from_w():
        s = 0.5 / jnp.sqrt(qw2 + _EPS)
        return jnp.stack([(m21 - m12) * s, (m02 - m20) * s, (m10 - m01) * s,
                          0.25 / jnp.clip(s, _EPS, None)], axis=-1)

    def from_x():
        s = 0.5 / jnp.sqrt(qx2 + _EPS)
        return jnp.stack([0.25 / jnp.clip(s, _EPS, None), (m01 + m10) * s,
                          (m02 + m20) * s, (m21 - m12) * s], axis=-1)

    def from_y():
        s = 0.5 / jnp.sqrt(qy2 + _EPS)
        return jnp.stack([(m01 + m10) * s, 0.25 / jnp.clip(s, _EPS, None),
                          (m12 + m21) * s, (m02 - m20) * s], axis=-1)

    def from_z():
        s = 0.5 / jnp.sqrt(qz2 + _EPS)
        return jnp.stack([(m02 + m20) * s, (m12 + m21) * s,
                          0.25 / jnp.clip(s, _EPS, None), (m10 - m01) * s], axis=-1)

    qs = jnp.stack([from_x(), from_y(), from_z(), from_w()], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def project(K_params, pts_cam):
    """Pinhole projection of camera-frame points (..., 3) -> (u, v).

    K_params = (fx, fy, cx, cy).
    """
    fx, fy, cx, cy = K_params
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = fx * pts_cam[..., 0] * inv_z + cx
    v = fy * pts_cam[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1)


def backproject(K_params, uv, z):
    """(u, v) pixels + depth -> camera-frame 3D points."""
    fx, fy, cx, cy = K_params
    x = (uv[..., 0] - cx) * z / fx
    y = (uv[..., 1] - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def orthonormalize(R):
    """Project a near-rotation onto SO(3) via SVD (reference `Tracking.cc:1123-1128`)."""
    U, _, Vt = jnp.linalg.svd(R)
    D = jnp.eye(3, dtype=R.dtype).at[2, 2].set(jnp.sign(jnp.linalg.det(U @ Vt)))
    return U @ D @ Vt
