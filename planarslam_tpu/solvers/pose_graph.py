"""Keyframe pose-graph optimization (loop-closure correction).

Replaces `Optimizer::OptimizeEssentialGraph` (`src/Optimizer.cc:2680`): after
a loop is found, keyframe poses are relaxed over relative-pose constraints
from (a) the spanning tree / sequential chain, (b) strong covisibility edges
(the reference uses minFeat=100), and (c) the new loop edge, with the loop
keyframe gauge-fixed. RGB-D fixes scale, so this is an SE3 pose graph (the
reference's Sim3 graph with s=1).

Solved as dense batched Gauss-Newton on the product manifold: residuals
r_ij = log(T_ij_meas^-1 · T_i · T_j^-1) for all edges at once (vmapped),
per-edge 6x6 Jacobian blocks by one vmapped jacfwd over the TWO incident
tangents (each edge touches only xi_i, xi_j — round 2 ran jacfwd over the
full stacked 6N tangent, i.e. 3072 forward passes per iteration at the
512-KF capacity; this is E passes of width 12), blocks scatter-added into
the dense 6N x 6N normal equations — the dense solve itself is ideal MXU
work and far simpler than a sparse solver on TPU.
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
    meas_inv = jax.vmap(se3.T_inv)(edges_meas)
    ii, jj = edges_ij[:, 0], edges_ij[:, 1]

    def edge_res(xi_i, xi_j, Ti, Tj, m_inv, w):
        rel = (se3.se3_exp(xi_i) @ Ti) @ se3.T_inv(se3.se3_exp(xi_j) @ Tj)
        return se3.se3_log(m_inv @ rel) * w

    # per-edge residual + 6x6 Jacobian blocks wrt the two incident tangents
    edge_val_jac = jax.vmap(
        lambda Ti, Tj, m_inv, w: (
            edge_res(jnp.zeros(6, poses0.dtype), jnp.zeros(6, poses0.dtype),
                     Ti, Tj, m_inv, w),
            jax.jacfwd(edge_res, argnums=(0, 1))(
                jnp.zeros(6, poses0.dtype), jnp.zeros(6, poses0.dtype),
                Ti, Tj, m_inv, w)))

    def step(poses, _):
        Ti, Tj = poses[ii], poses[jj]
        r0, (Ji, Jj) = edge_val_jac(Ti, Tj, meas_inv, edge_w)  # (E,6),(E,6,6)
        # dense normal equations assembled from the sparse blocks
        Hb = jnp.zeros((n, n, 6, 6), poses.dtype)
        Hb = Hb.at[ii, ii].add(jnp.einsum("eab,eac->ebc", Ji, Ji))
        Hb = Hb.at[jj, jj].add(jnp.einsum("eab,eac->ebc", Jj, Jj))
        Hb = Hb.at[ii, jj].add(jnp.einsum("eab,eac->ebc", Ji, Jj))
        Hb = Hb.at[jj, ii].add(jnp.einsum("eab,eac->ebc", Jj, Ji))
        H = Hb.transpose(0, 2, 1, 3).reshape(n * 6, n * 6)
        gb = jnp.zeros((n, 6), poses.dtype)
        gb = gb.at[ii].add(jnp.einsum("eab,ea->eb", Ji, r0))
        gb = gb.at[jj].add(jnp.einsum("eab,ea->eb", Jj, r0))
        g = gb.reshape(-1)
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
    # persisted loop edges from EARLIER corrections (KeyFrame::AddLoopEdge —
    # the reference includes sLoopEdges in every essential-graph run,
    # `src/Optimizer.cc:2799+`). Edges whose endpoint was culled chain the
    # stored measurement through the cull-time relative to a valid ancestor.
    for e in range(m.n_loop_edges):
        a, b = int(m.loop_edge_ab[e, 0]), int(m.loop_edge_ab[e, 1])
        T_ab = m.loop_edge_T[e]
        if (a, b) == (kf_corrected, loop_kf):
            continue  # the current loop edge, added above from T_corrected
        if not m.kf_valid[a]:
            a, T_rel_a = m.resolve_kf(a)
            T_ab = np.linalg.inv(T_rel_a) @ T_ab  # anchor_a-from-b
        if not m.kf_valid[b]:
            b, T_rel_b = m.resolve_kf(b)
            T_ab = T_ab @ T_rel_b                 # a-from-anchor_b
        if a < 0 or b < 0 or a == b:
            continue
        edges.append((id_pos[a], id_pos[b], T_ab.astype(np.float32), 5.0))

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
