"""PnP RANSAC for relocalization.

Replaces the reference's `PnPsolver` (`src/PnPsolver.cc`: EPnP control-point
solver `:375-815` inside adaptive RANSAC `:121-306`). TPU-first redesign:
instead of EPnP's sequential beta-case analysis, each RANSAC hypothesis is a
6-point DLT (direct linear transform) solved as a batched SVD, with the
rotation projected onto SO(3); hypotheses are a fixed vmapped batch, inliers
are counted by scale-aware reprojection chi2 exactly like the reference
(`:259-295`), and the best hypothesis is refined by the standard pose
optimizer. Same contract: correspondences in, pose + inlier mask out.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.geometry import se3


def _dlt_pose(xw: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """6+ point DLT: world points (M, 3) + normalized image points (M, 2)
    -> T_cw (4, 4). Returns garbage (caught by inlier count) if degenerate."""
    m = xw.shape[0]
    zeros = jnp.zeros((m, 4))
    Xh = jnp.concatenate([xw, jnp.ones((m, 1))], axis=-1)  # (M, 4)
    rows_u = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=-1)
    rows_v = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2M, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    # fix sign: points must be in front (positive depth)
    depths = Xh @ P[2]
    P = P * jnp.where(jnp.sum(depths) < 0, -1.0, 1.0)
    M3 = P[:, :3]
    # project onto a rotation with uniform scale
    U, S, Vt2 = jnp.linalg.svd(M3)
    scale = jnp.mean(S)
    D = jnp.eye(3).at[2, 2].set(jnp.sign(jnp.linalg.det(U @ Vt2)))
    R = U @ D @ Vt2
    t = P[:, 3] / jnp.maximum(scale, 1e-9)
    return se3.rt_to_T(R, t)


@jax.jit
def _pnp_ransac(xw, uv_n, valid, inv_sigma2, picks, chi2_gate):
    def hypo(pick):
        T = _dlt_pose(xw[pick], uv_n[pick])
        pc = se3.transform_points(T, xw)
        z = pc[:, 2]
        pred = pc[:, :2] / jnp.maximum(z, 1e-6)[:, None]
        err2 = jnp.sum((pred - uv_n) ** 2, axis=-1)
        chi2 = err2 * inv_sigma2
        inl = (chi2 < chi2_gate) & (z > 0.05) & valid
        ok = jnp.all(jnp.isfinite(T))
        return jnp.where(ok, jnp.sum(inl), -1), T

    scores, Ts = jax.vmap(hypo)(picks)
    best = jnp.argmax(scores)
    T = Ts[best]
    pc = se3.transform_points(T, xw)
    z = pc[:, 2]
    pred = pc[:, :2] / jnp.maximum(z, 1e-6)[:, None]
    chi2 = jnp.sum((pred - uv_n) ** 2, axis=-1) * inv_sigma2
    inl = (chi2 < chi2_gate) & (z > 0.05) & valid
    return T, inl, scores[best]


def pnp_ransac(
    pts_w: np.ndarray,            # (N, 3) map points
    uv: np.ndarray,               # (N, 2) observed pixels (undistorted)
    valid: np.ndarray,            # (N,) bool
    K: Tuple[float, float, float, float],
    inv_sigma2: Optional[np.ndarray] = None,
    chi2_gate: float = 5.991,
    n_hyp: int = 128,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """RANSAC PnP. Returns (T_cw, inlier mask, n_inliers).

    chi2 is evaluated in normalized coordinates scaled back to pixels via
    the focal length inside inv_sigma2 (pass per-level 1/sigma^2 like the
    reference's scale-aware RANSAC `src/PnPsolver.cc:149-164`).
    """
    fx, fy, cx, cy = K
    n = len(pts_w)
    if n < 6 or valid.sum() < 6:
        return np.eye(4, dtype=np.float32), np.zeros(n, bool), 0
    uv_n = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=-1)
    if inv_sigma2 is None:
        inv_sigma2 = np.ones(n, np.float32)
    # static-shape padding (see sim3_solver._pad_bucket): avoid per-call
    # recompiles for varying correspondence counts
    from planarslam_tpu.solvers.sim3_solver import _pad_bucket

    cap = _pad_bucket(n)
    xw_p = np.zeros((cap, 3), np.float32)
    uv_p = np.zeros((cap, 2), np.float32)
    is2_p = np.ones(cap, np.float32)
    v_p = np.zeros(cap, bool)
    xw_p[:n] = pts_w
    uv_p[:n] = uv_n
    is2_p[:n] = inv_sigma2
    v_p[:n] = valid
    rng = np.random.default_rng(11)
    picks = rng.integers(0, max(n, 1), (n_hyp, 6)).astype(np.int32)
    # chi2 gate in pixels^2 -> normalized: scale by mean focal^2
    f2 = (fx * fy)
    T, inl, score = _pnp_ransac(
        jnp.asarray(xw_p), jnp.asarray(uv_p), jnp.asarray(v_p),
        jnp.asarray(is2_p * f2), jnp.asarray(picks), jnp.float32(chi2_gate))
    inl = np.asarray(inl)[:n]
    return np.asarray(T), inl, int(inl.sum())
