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


@partial(jax.jit, static_argnames=("n_hyp", "with_scale"))
def _ransac_align(src, dst, valid, threshold, n_hyp=64, with_scale=False):
    n = src.shape[0]
    rng = np.random.default_rng(7)
    triplets = jnp.asarray(rng.integers(0, max(n, 1), (n_hyp, 3)))

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


def horn_ransac_se3(src: np.ndarray, dst: np.ndarray,
                    threshold: float = 0.10, n_hyp: int = 64
                    ) -> Tuple[np.ndarray, int, np.ndarray]:
    """RANSAC rigid alignment dst ≈ T src. Returns (T (4,4), n_inliers,
    inlier mask)."""
    n = len(src)
    if n < 3:
        return np.eye(4, dtype=np.float32), 0, np.zeros(n, bool)
    valid = jnp.ones((n,), jnp.float32)
    R, t, s, n_inl, inl = _ransac_align(jnp.asarray(src), jnp.asarray(dst),
                                        valid, threshold, n_hyp=n_hyp)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T, int(n_inl), np.asarray(inl)


def horn_ransac_sim3(src: np.ndarray, dst: np.ndarray,
                     threshold: float = 0.10, n_hyp: int = 64):
    """Similarity variant (scale free) for mono-style loop closing."""
    n = len(src)
    if n < 3:
        return np.eye(4, dtype=np.float32), 1.0, 0, np.zeros(n, bool)
    valid = jnp.ones((n,), jnp.float32)
    R, t, s, n_inl, inl = _ransac_align(jnp.asarray(src), jnp.asarray(dst),
                                        valid, threshold, n_hyp=n_hyp,
                                        with_scale=True)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T, float(s), int(n_inl), np.asarray(inl)
