"""Batched two-view triangulation.

Replaces the per-pair SVD triangulation in the reference's
`LocalMapping::CreateNewMapPoints` (`src/LocalMapping.cc:309`, 4x4 DLT
nullspace per match) with one vmapped SVD over all candidate pairs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def triangulate(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray,
                uv2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DLT triangulation.

    P1, P2: (3, 4) projection matrices K[R|t]; uv1, uv2: (N, 2) pixels.
    Returns (X (N, 3) world points, ok (N,) finite/valid mask).
    """

    def one(u1, u2):
        A = jnp.stack([
            u1[0] * P1[2] - P1[0],
            u1[1] * P1[2] - P1[1],
            u2[0] * P2[2] - P2[0],
            u2[1] * P2[2] - P2[1],
        ])
        _, _, Vt = jnp.linalg.svd(A)
        Xh = Vt[-1]
        w = Xh[3]
        X = Xh[:3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        return X

    X = jax.vmap(one)(uv1, uv2)
    ok = jnp.all(jnp.isfinite(X), axis=-1)
    return X, ok


@jax.jit
def reprojection_checks(X, T1, T2, uv1, uv2, K, inv_sigma2_1, inv_sigma2_2,
                        chi2_gate: float = 5.991):
    """Cheirality + reprojection chi2 in both views (the acceptance tests of
    `CreateNewMapPoints`). T1, T2: (4,4) camera-from-world. Returns mask."""
    fx, fy, cx, cy = K

    def proj_err(T, uv, inv_s2):
        pc = X @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        u = fx * pc[:, 0] / jnp.maximum(z, 1e-9) + cx
        v = fy * pc[:, 1] / jnp.maximum(z, 1e-9) + cy
        err = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_s2
        return (z > 0.05) & (err < chi2_gate)

    return proj_err(T1, uv1, inv_sigma2_1) & proj_err(T2, uv2, inv_sigma2_2)
