"""Batched descriptor matching — the ORBmatcher/PlaneMatcher equivalents.

The reference's matchers walk per-cell candidate lists with early-outs
(`src/ORBmatcher.cc`, 13 search variants). Here every association is one
dense gated (M, N) problem: a popcount(xor) Hamming matrix masked by
geometric gates (projection window, scale window, viewing angle), followed
by best/second-best selection, ratio test, rotation-histogram consistency,
and duplicate resolution — all static-shape tensor ops that fuse under jit.
-1 sentinels mirror the reference's NULL match slots.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from planarslam_tpu.geometry import se3
from planarslam_tpu.ops.orb import hamming_distance

INF_DIST = 10_000


def _top2_min(d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row (best, second_best, best_idx) of a distance matrix.

    lax.top_k lowers to a full per-row SORT on TPU (O(N log N) on the
    vector unit); the best/second-best pair only needs two min-reductions:
    mask out each row's argmin and reduce again. Ties resolve to the
    lowest index, same as top_k."""
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == best_idx[:, None], INF_DIST, d)
    second = d2.min(axis=1)
    return best, second, best_idx


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # (M,) int32 index into the target feature set, -1 = none
    dist: jnp.ndarray   # (M,) int32 Hamming distance (INF_DIST if none)

    @property
    def valid(self):
        return self.idx >= 0


def _resolve_duplicates(idx: jnp.ndarray, dist: jnp.ndarray, n_targets: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep only the best source per target feature (reference Fuse/duplicate
    erasure semantics, e.g. `src/ORBmatcher.cc:121-130`)."""
    tgt = jnp.where(idx >= 0, idx, n_targets)  # park invalids in slot n
    best = jnp.full((n_targets + 1,), INF_DIST, dtype=dist.dtype)
    best = best.at[tgt].min(dist)
    keep = (idx >= 0) & (dist <= best[tgt])
    # break exact-distance ties by source order: first source wins
    m = idx.shape[0]
    src_ids = jnp.arange(m, dtype=jnp.int32)
    first = jnp.full((n_targets + 1,), m, dtype=jnp.int32)
    first = first.at[tgt].min(jnp.where(keep, src_ids, m))
    keep = keep & (first[tgt] == src_ids)
    return jnp.where(keep, idx, -1), jnp.where(keep, dist, INF_DIST)


def rotation_histogram_filter(angle_src: jnp.ndarray, angle_tgt_matched: jnp.ndarray,
                              valid: jnp.ndarray, histo_length: int = 30
                              ) -> jnp.ndarray:
    """Keep matches whose angle difference falls in the 3 most common bins
    (reference rotation-consistency check, `src/ORBmatcher.cc` HISTO_LENGTH)."""
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(angle_src - angle_tgt_matched, two_pi)
    bins = jnp.clip((rot * histo_length / two_pi).astype(jnp.int32), 0,
                    histo_length - 1)
    counts = jnp.zeros((histo_length,), jnp.int32).at[bins].add(
        valid.astype(jnp.int32))
    top3_val, top3_idx = jax.lax.top_k(counts, 3)
    # ComputeThreeMaxima semantics: drop bin 2 (and 3) when its count is
    # below 10% of the best bin's count
    keep2 = top3_val[1].astype(jnp.float32) >= 0.1 * top3_val[0]
    keep3 = top3_val[2].astype(jnp.float32) >= 0.1 * top3_val[0]
    keep_bin = jnp.zeros((histo_length,), bool)
    keep_bin = keep_bin.at[top3_idx[0]].set(True)
    keep_bin = keep_bin.at[top3_idx[1]].set(keep2)
    keep_bin = keep_bin.at[top3_idx[2]].set(keep3)
    return valid & keep_bin[bins]


@partial(jax.jit, static_argnames=("max_dist", "ratio", "mutual"))
def match_descriptors(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                      valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                      max_dist: int = 50, ratio: float = 0.9,
                      mutual: bool = True) -> MatchResult:
    """Brute-force descriptor matching a→b with Lowe ratio + optional mutual
    check (replaces `ORBmatcher::MatchORBPoints` `src/ORBmatcher.cc:1332` and
    the BoW-gated SearchByBoW variants — on TPU the full matrix is cheaper
    than gating machinery)."""
    d = hamming_distance(desc_a, desc_b)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, INF_DIST)
    best, second, best_idx = _top2_min(d)
    ok = (best <= max_dist) & (best.astype(jnp.float32)
                               < ratio * second.astype(jnp.float32))
    if mutual:
        back = jnp.argmin(d, axis=0)  # best a for each b
        ok = ok & (back[best_idx] == jnp.arange(d.shape[0]))
    idx = jnp.where(ok, best_idx, -1)
    dist = jnp.where(ok, best, INF_DIST)
    return MatchResult(idx.astype(jnp.int32), dist.astype(jnp.int32))


def search_by_projection(
    pts_w: jnp.ndarray,          # (M, 3) world landmark positions
    descs: jnp.ndarray,          # (M, 8) landmark descriptors
    valid_pts: jnp.ndarray,      # (M,) bool
    T_cw: jnp.ndarray,           # (4, 4) camera-from-world
    feat_uv: jnp.ndarray,        # (N, 2) frame keypoints (undistorted)
    feat_desc: jnp.ndarray,      # (N, 8)
    feat_level: jnp.ndarray,     # (N,) int32
    feat_valid: jnp.ndarray,     # (N,) bool
    feat_ur: jnp.ndarray,        # (N,) pseudo-stereo right u (-1 = mono)
    K: Tuple[float, float, float, float],
    image_wh: Tuple[float, float],
    bf: float,
    scale_factor: float,
    radius: float = 5.7,         # base window (reference th=... * scale)
    max_dist: int = 100,
    view_normals: Optional[jnp.ndarray] = None,   # (M, 3) mean viewing dir
    dist_range: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # min/max
    ratio: float = 1.0,
    level_window: int = 1,
) -> MatchResult:
    """Project landmarks into the frame and match within a scale-aware window.

    Single dense implementation standing in for the reference's
    SearchByProjection family (`src/ORBmatcher.cc:46` local map, `:1396`
    frame-frame): geometric gates become masks on the (M, N) distance matrix.
    """
    fx, fy, cx, cy = K
    w_img, h_img = image_wh

    pc = se3.transform_points(T_cw, pts_w)  # (M, 3)
    z = pc[:, 2]
    uv = se3.project(K, pc)
    in_front = z > 0.05
    in_img = ((uv[:, 0] >= 0) & (uv[:, 0] < w_img) &
              (uv[:, 1] >= 0) & (uv[:, 1] < h_img))
    gate_pt = valid_pts & in_front & in_img

    # scale prediction from distance (reference MapPoint::PredictScale)
    cam_center = -T_cw[:3, :3].T @ T_cw[:3, 3]
    vec = pts_w - cam_center[None, :]
    dist = jnp.linalg.norm(vec, axis=-1).clip(1e-6)
    if dist_range is not None:
        dmin, dmax = dist_range
        gate_pt = gate_pt & (dist >= 0.8 * dmin) & (dist <= 1.2 * dmax)
        pred_level = jnp.ceil(
            jnp.log(jnp.clip(dmax / dist, 1.0, None)) / jnp.log(scale_factor)
        ).astype(jnp.int32)
    else:
        pred_level = jnp.zeros_like(z, dtype=jnp.int32)
    if view_normals is not None:
        cosv = jnp.sum(vec * view_normals, axis=-1) / dist
        gate_pt = gate_pt & (cosv > 0.5)

    # per-landmark window radius grows with predicted scale
    r = radius * scale_factor ** pred_level.astype(jnp.float32)  # (M,)

    du = jnp.abs(uv[:, 0:1] - feat_uv[None, :, 0])
    dv = jnp.abs(uv[:, 1:2] - feat_uv[None, :, 1])
    window = (du <= r[:, None]) & (dv <= r[:, None])
    lvl_ok = (jnp.abs(feat_level[None, :] - pred_level[:, None]) <= level_window)
    gate = window & lvl_ok & gate_pt[:, None] & feat_valid[None, :]

    # stereo consistency: if the feature has depth, its u_right must agree
    ur_pred = uv[:, 0:1] - bf / jnp.maximum(z[:, None], 1e-6)
    ur_ok = (feat_ur[None, :] < 0) | (jnp.abs(ur_pred - feat_ur[None, :])
                                      <= r[:, None])
    gate = gate & ur_ok

    d = hamming_distance(descs, feat_desc)
    d = jnp.where(gate, d, INF_DIST)
    best, second, best_idx = _top2_min(d)
    ok = best <= max_dist
    if ratio < 1.0:
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    idx = jnp.where(ok, best_idx, -1).astype(jnp.int32)
    dist_out = jnp.where(ok, best, INF_DIST).astype(jnp.int32)
    return MatchResult(*_resolve_duplicates(idx, dist_out, feat_desc.shape[0]))
