"""Sim(3) similarity transforms for loop closing.

Replaces g2o's Sim3 type as used by the reference's loop-closing stack
(`src/Sim3Solver.cc`, `src/Optimizer.cc:2680` essential-graph optimization,
`src/Optimizer.cc:3739` OptimizeSim3). A Sim3 is stored as (R, t, s); the
tangent chart used by the pose-graph solver is 7-dof [rho, phi, sigma].
"""

from __future__ import annotations

import jax.numpy as jnp

from planarslam_tpu.geometry import se3

_EPS = 1e-8


def make(R, t, s):
    """Pack (R (...,3,3), t (...,3), s (...)) into a (...,4,4)+scale pair.

    Sim3 action: x' = s R x + t. We keep s separate from the 4x4 so SE3
    helpers still apply to (R, t).
    """
    return {"R": R, "t": t, "s": s}


def identity(dtype=jnp.float32):
    return make(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
                jnp.ones((), dtype=dtype))


def apply(S, pts):
    return (S["s"][..., None, None] *
            (pts @ jnp.swapaxes(S["R"], -1, -2))) + S["t"][..., None, :]


def compose(S1, S2):
    """S1 ∘ S2 (apply S2 first)."""
    R = S1["R"] @ S2["R"]
    s = S1["s"] * S2["s"]
    t = (S1["s"][..., None] * (S1["R"] @ S2["t"][..., None])[..., 0]) + S1["t"]
    return make(R, t, s)


def inverse(S):
    Rt = jnp.swapaxes(S["R"], -1, -2)
    s_inv = 1.0 / jnp.clip(S["s"], _EPS, None)
    t = -s_inv[..., None] * (Rt @ S["t"][..., None])[..., 0]
    return make(Rt, t, s_inv)


def exp(xi):
    """7-dof tangent [rho(3), phi(3), sigma(1)] -> Sim3.

    Uses the first-order-consistent approximation for the translation part
    (exact W(sigma, phi) is unnecessary for GN steps near identity, which is
    the only way the pose-graph solver uses it).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = se3.so3_exp(phi)
    s = jnp.exp(sigma)
    T = se3.se3_exp(jnp.concatenate([rho, phi], axis=-1))
    return make(R, T[..., :3, 3], s)


def log(S):
    phi = se3.so3_log(S["R"])
    sigma = jnp.log(jnp.clip(S["s"], _EPS, None))
    T = se3.rt_to_T(S["R"], S["t"])
    rho = se3.se3_log(T)[..., :3]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def from_se3(T, s=None):
    R = T[..., :3, :3]
    if s is None:
        s = jnp.ones(T.shape[:-2], dtype=T.dtype)
    return make(R, T[..., :3, 3], s)


def to_se3(S):
    """Drop the scale into the translation (used when closing RGB-D loops,
    where scale is observable and forced to 1 as in the reference's stereo
    fixScale=true path)."""
    return se3.rt_to_T(S["R"], S["t"])
