"""Keyframe pose-graph optimization (loop-closure correction).

Replaces `Optimizer::OptimizeEssentialGraph` (`src/Optimizer.cc:2680`): after
a loop is found, keyframe poses are relaxed over relative-pose constraints
from (a) the spanning tree / sequential chain, (b) strong covisibility edges
(the reference uses minFeat=100), and (c) the new loop edge, with the loop
keyframe gauge-fixed. RGB-D fixes scale, so this is an SE3 pose graph (the
reference's Sim3 graph with s=1).

Solved as dense batched Gauss-Newton on the product manifold: residuals
r_ij = log(T_ij_meas^-1 · T_i · T_j^-1) for all edges at once (vmapped),
Jacobians by one jacfwd over the stacked 6N tangent, dense 6N x 6N normal
equations — at 512-KF capacity that is a 3072-dim solve, ideal MXU work,
far simpler and faster on TPU than a sparse solver.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.geometry import se3


@partial(jax.jit, static_argnames=("n_iters",))
def _optimize(poses0: jnp.ndarray, edges_ij: jnp.ndarray,
              edges_meas: jnp.ndarray, edge_w: jnp.ndarray,
              fixed_mask: jnp.ndarray, n_iters: int = 10) -> jnp.ndarray:
    """poses0: (N, 4, 4) initial T_cw per KF; edges_ij: (E, 2) int32;
    edges_meas: (E, 4, 4) measured T_i T_j^-1; edge_w: (E,) weights;
    fixed_mask: (N,) 1.0 where the pose is gauge-fixed."""
    n = poses0.shape[0]

    def residuals(xi_flat, poses):
        xi = xi_flat.reshape(n, 6)
        T = jax.vmap(se3.se3_exp)(xi) @ poses
        Ti = T[edges_ij[:, 0]]
        Tj = T[edges_ij[:, 1]]
        rel = Ti @ jax.vmap(se3.T_inv)(Tj)
        err = jax.vmap(se3.T_inv)(edges_meas) @ rel
        r = jax.vmap(se3.se3_log)(err)  # (E, 6)
        return (r * edge_w[:, None]).reshape(-1)

    def step(poses, _):
        xi0 = jnp.zeros((n * 6,), poses.dtype)
        r0 = residuals(xi0, poses)
        J = jax.jacfwd(residuals)(xi0, poses)  # (6E, 6N)
        H = J.T @ J
        g = J.T @ r0
        # gauge fixing: heavily damp fixed poses
        diag_fix = jnp.repeat(fixed_mask, 6) * 1e8 + 1e-6
        H = H + jnp.diag(diag_fix)
        dx = -jnp.linalg.solve(H, g)
        poses_new = jax.vmap(se3.se3_exp)(dx.reshape(n, 6)) @ poses
        return poses_new, jnp.sum(r0 * r0)

    poses, costs = jax.lax.scan(step, poses0, None, length=n_iters)
    return poses


def optimize_pose_graph(slam_map, kf_corrected: int, T_corrected: np.ndarray,
                        loop_kf: int, cfg: SystemConfig,
                        min_covis_weight: int = 100) -> np.ndarray:
    """Build edges from the map and run the GN pose graph.

    Returns (n_kf_slots, 4, 4) corrected T_cw (rows for invalid KFs
    unchanged).
    """
    m = slam_map
    ids = m.valid_kf_ids()
    if len(ids) < 2:
        return m.kf_pose.copy()
    id_pos = {int(k): i for i, k in enumerate(ids)}
    poses_before = m.kf_pose[ids].astype(np.float32)

    edges: List[Tuple[int, int, np.ndarray, float]] = []

    def rel(a, b):
        return (m.kf_pose[a] @ np.linalg.inv(m.kf_pose[b])).astype(np.float32)

    # sequential / spanning-tree chain
    for i in range(1, len(ids)):
        a, b = int(ids[i]), int(ids[i - 1])
        p = int(m.kf_parent[a])
        b = p if p in id_pos else b
        edges.append((id_pos[a], id_pos[b], rel(a, b), 1.0))
    # strong covisibility edges (minFeat=100, reference `:2689`)
    for a in ids:
        for b in m.covisible_kfs(int(a), min_weight=min_covis_weight):
            if int(b) > int(a) and int(b) in id_pos:
                edges.append((id_pos[int(a)], id_pos[int(b)],
                              rel(int(a), int(b)), 1.0))
    # the loop edge: measured relative from the corrected pose
    T_rel_loop = (T_corrected @ np.linalg.inv(m.kf_pose[loop_kf])
                  ).astype(np.float32)
    edges.append((id_pos[kf_corrected], id_pos[loop_kf], T_rel_loop, 5.0))

    e_ij = np.asarray([(a, b) for a, b, _, _ in edges], np.int32)
    e_meas = np.asarray([t for _, _, t, _ in edges], np.float32)
    e_w = np.asarray([w for _, _, _, w in edges], np.float32)
    fixed = np.zeros(len(ids), np.float32)
    fixed[id_pos[loop_kf]] = 1.0

    # start from current estimates but seed the corrected KF pose
    init = poses_before.copy()
    init[id_pos[kf_corrected]] = T_corrected

    out_poses = np.asarray(_optimize(jnp.asarray(init), jnp.asarray(e_ij),
                                     jnp.asarray(e_meas), jnp.asarray(e_w),
                                     jnp.asarray(fixed)))
    result = m.kf_pose.copy()
    result[ids] = out_poses
    return result
