"""Monocular two-view initializer (H/F dual-model RANSAC).

Rebuild of the reference's `Initializer` (`src/Initializer.cc:49-123`):
parallel RANSAC over a fundamental matrix (8-point) and a homography
(4-point DLT), symmetric-transfer scoring, the reference's RH = SH/(SH+SF)
model-selection heuristic, then pose recovery + triangulation with
cheirality checks.

NOTE ship-state parity: in the reference's RGB-D pipeline this path is DEAD
CODE — the call is disabled at `src/Tracking.cc:1316` (`if (0)`), and RGB-D
initialization uses depth (`StereoInitialization`). It is provided for
capability parity with the monocular entry points. Pose recovery goes
through the essential matrix for both models (the reference decomposes H
directly via Faugeras for the planar case; here the F/E route with RANSAC
inliers covers both — documented delta).

All hypothesis batches are fixed-size and vmapped.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.geometry import se3


class InitResult(NamedTuple):
    success: bool
    T_21: np.ndarray        # pose of view 2 w.r.t. view 1 (unit translation)
    points3d: np.ndarray    # (N, 3) triangulated points in view-1 frame
    inliers: np.ndarray     # (N,) bool
    used_homography: bool
    score_h: float
    score_f: float


def _normalize_pts(x):
    mean = x.mean(axis=0)
    d = jnp.mean(jnp.abs(x - mean), axis=0).clip(1e-9)
    T = jnp.array([[1 / d[0], 0, -mean[0] / d[0]],
                   [0, 1 / d[1], -mean[1] / d[1]],
                   [0, 0, 1.0]])
    xh = jnp.concatenate([x, jnp.ones((x.shape[0], 1))], axis=-1)
    return (xh @ T.T)[:, :2], T


def _eight_point_F(x1, x2):
    """x1, x2: (8, 2) normalized -> F (3,3)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1,
                   jnp.ones_like(u1)], axis=-1)
    _, _, Vt = jnp.linalg.svd(A)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    return U @ jnp.diag(S.at[2].set(0.0)) @ Vt2  # rank-2 enforcement


def _four_point_H(x1, x2):
    """DLT homography from 4 points."""
    def rows(p, q):
        u, v = p
        x, y = q
        r1 = jnp.array([-u, -v, -1.0, 0, 0, 0, x * u, x * v, x])
        r2 = jnp.array([0, 0, 0, -u, -v, -1.0, y * u, y * v, y])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(x1[i], x2[i]) for i in range(4)])
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[-1].reshape(3, 3)


def _score_F(F, x1h, x2h, sigma2: float, valid):
    """Symmetric epipolar-transfer score (reference CheckFundamental)."""
    th, th_score = 3.841, 5.991
    l2 = x1h @ F.T  # epipolar lines in image 2
    d2 = (jnp.sum(l2 * x2h, axis=-1) ** 2
          / (l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-12)) / sigma2
    l1 = x2h @ F
    d1 = (jnp.sum(l1 * x1h, axis=-1) ** 2
          / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-12)) / sigma2
    inl = (d1 < th) & (d2 < th) & valid
    score = jnp.sum(jnp.where((d1 < th) & valid, th_score - d1, 0.0)
                    + jnp.where((d2 < th) & valid, th_score - d2, 0.0))
    return score, inl


def _score_H(H, x1h, x2h, sigma2: float, valid):
    th = 5.991
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    p2 = x1h @ H.T
    p2 = p2[:, :2] / jnp.where(jnp.abs(p2[:, 2:3]) < 1e-12, 1e-12, p2[:, 2:3])
    d2 = jnp.sum((p2 - x2h[:, :2]) ** 2, axis=-1) / sigma2
    p1 = x2h @ Hinv.T
    p1 = p1[:, :2] / jnp.where(jnp.abs(p1[:, 2:3]) < 1e-12, 1e-12, p1[:, 2:3])
    d1 = jnp.sum((p1 - x1h[:, :2]) ** 2, axis=-1) / sigma2
    inl = (d1 < th) & (d2 < th) & valid
    score = jnp.sum(jnp.where((d1 < th) & valid, th - d1, 0.0)
                    + jnp.where((d2 < th) & valid, th - d2, 0.0))
    return score, inl


@partial(jax.jit, static_argnames=("n_hyp",))
def _dual_ransac(uv1, uv2, valid, sigma2, n_hyp=128):
    n = uv1.shape[0]
    rng = np.random.default_rng(17)
    picks8 = jnp.asarray(rng.integers(0, max(n, 1), (n_hyp, 8)))
    x1h = jnp.concatenate([uv1, jnp.ones((n, 1))], axis=-1)
    x2h = jnp.concatenate([uv2, jnp.ones((n, 1))], axis=-1)

    def f_hypo(pick):
        F = _eight_point_F(uv1[pick], uv2[pick])
        s, inl = _score_F(F, x1h, x2h, sigma2, valid)
        return jnp.where(jnp.all(jnp.isfinite(F)), s, -1.0), F

    def h_hypo(pick):
        H = _four_point_H(uv1[pick[:4]], uv2[pick[:4]])
        s, inl = _score_H(H, x1h, x2h, sigma2, valid)
        return jnp.where(jnp.all(jnp.isfinite(H)), s, -1.0), H

    sf, Fs = jax.vmap(f_hypo)(picks8)
    sh, Hs = jax.vmap(h_hypo)(picks8)
    bf = jnp.argmax(sf)
    bh = jnp.argmax(sh)
    F = Fs[bf]
    H = Hs[bh]
    _, inl_f = _score_F(F, x1h, x2h, sigma2, valid)
    _, inl_h = _score_H(H, x1h, x2h, sigma2, valid)
    return F, H, sf[bf], sh[bh], inl_f, inl_h


def initialize_two_view(uv1: np.ndarray, uv2: np.ndarray, valid: np.ndarray,
                        K: Tuple[float, float, float, float],
                        sigma: float = 1.0) -> InitResult:
    """Full two-view initialization from matched pixel coordinates."""
    from planarslam_tpu.solvers.triangulation import triangulate

    fx, fy, cx, cy = K
    Kmat = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    F, H, sf, sh, inl_f, inl_h = _dual_ransac(
        jnp.asarray(uv1.astype(np.float32)),
        jnp.asarray(uv2.astype(np.float32)),
        jnp.asarray(valid), jnp.float32(sigma * sigma))
    sf, sh = float(sf), float(sh)
    rh = sh / max(sh + sf, 1e-9)  # reference model-selection heuristic
    use_h = rh > 0.40
    inliers = np.asarray(inl_h if use_h else inl_f)
    if inliers.sum() < 8:
        return InitResult(False, np.eye(4, dtype=np.float32),
                          np.zeros((len(uv1), 3), np.float32),
                          np.zeros(len(uv1), bool), use_h, sh, sf)

    # essential-matrix pose recovery on the selected inliers
    E = Kmat.T @ np.asarray(F) @ Kmat
    U, _, Vt = np.linalg.svd(E)
    if np.linalg.det(U) < 0:
        U = -U
    if np.linalg.det(Vt) < 0:
        Vt = -Vt
    W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    t = U[:, 2]
    t = t / max(np.linalg.norm(t), 1e-9)
    candidates = [(U @ W @ Vt, t), (U @ W @ Vt, -t),
                  (U @ W.T @ Vt, t), (U @ W.T @ Vt, -t)]

    best = None
    P1 = Kmat @ np.eye(4, dtype=np.float32)[:3]
    sel = np.flatnonzero(inliers)
    for R, tt in candidates:
        T21 = np.eye(4, dtype=np.float32)
        T21[:3, :3] = R
        T21[:3, 3] = tt
        P2 = Kmat @ T21[:3]
        X, fin = triangulate(jnp.asarray(P1), jnp.asarray(P2),
                             jnp.asarray(uv1[sel].astype(np.float32)),
                             jnp.asarray(uv2[sel].astype(np.float32)))
        X = np.asarray(X)
        z1 = X[:, 2]
        X2 = X @ R.T + tt
        good = int(((z1 > 0) & (X2[:, 2] > 0) & np.asarray(fin)).sum())
        if best is None or good > best[0]:
            best = (good, T21, X)
    n_good, T21, X = best
    pts = np.zeros((len(uv1), 3), np.float32)
    pts[sel] = X
    ok = n_good > 0.7 * len(sel) and n_good >= 8
    return InitResult(bool(ok), T21, pts, inliers, bool(use_h), sh, sf)
