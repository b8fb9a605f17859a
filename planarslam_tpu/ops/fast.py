"""FAST-9/16 corner scores and spatially-uniform keypoint selection.

TPU-first redesign of the reference's per-cell FAST + octree distribution
(`src/ORBextractor.cc:539` DistributeOctTree, per-cell detection in
`operator()` `:1043`): instead of data-dependent cell lists and a recursive
quadtree, we compute a dense corner-score map with shifted views (pure VPU
work), 3x3 non-max suppression, and per-tile top-k selection — same uniform
coverage goal, fully static shapes.

The score is the standard FAST "V" value: the largest threshold for which a
9-contiguous arc of the 16-pixel Bresenham circle is all brighter (or all
darker) than the center — identical semantics to OpenCV's score used by the
reference for ranking.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 16-point Bresenham circle of radius 3, in ring order, as (dy, dx).
CIRCLE_OFFSETS = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)

ARC_LEN = 9  # FAST-9


def _shifted(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """img shifted so out[y, x] = img[y + dy, x + dx] (edge-replicated)."""
    h, w = img.shape
    pad = 3
    p = jnp.pad(img, pad, mode="edge")
    return jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (h, w))


def fast_score(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9/16 corner score map (0 where not a corner at t=0).

    score = max over the 16 arc start positions of
            min over the 9 arc members of (I_ring - I_center)  [bright], and
            symmetrically for dark; final score = max(bright, dark).
    """
    center = img
    ring = jnp.stack([_shifted(img, int(dy), int(dx)) for dy, dx in CIRCLE_OFFSETS])
    d = ring - center[None]  # (16, H, W)
    d2 = jnp.concatenate([d, d[:ARC_LEN - 1]], axis=0)  # wraparound

    # arc-min via log2 doubling of window size; entries past index 15 are
    # contaminated by the roll wraparound but only [:16] is consumed, and the
    # 8-element tail keeps all windows starting at 0..15 exact.
    def arc_reduce(x, op):
        y = x  # (16 + ARC_LEN - 1, H, W)
        n = 1
        while n * 2 <= ARC_LEN:
            y = op(y, jnp.roll(y, -n, axis=0))
            n *= 2
        rem = ARC_LEN - n
        if rem > 0:
            y = op(y, jnp.roll(y, -rem, axis=0))
        return y[:16]

    bright = arc_reduce(d2, jnp.minimum)  # (16, H, W): min over each 9-arc
    dark = arc_reduce(-d2, jnp.minimum)
    score = jnp.maximum(bright.max(axis=0), dark.max(axis=0))
    return jnp.maximum(score, 0.0)


def select_keypoints(score: jnp.ndarray, tile: int, k_total: int,
                     min_score: float, border: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS + per-tile top-k + global top-k. Returns (uv (K,2) f32, response
    (K,), valid (K,) bool) with K = k_total, padded with invalid entries.

    Mirrors the reference's two goals: spatial uniformity (octree) and
    response ranking; the per-tile stage guarantees every textured tile
    contributes before strong tiles saturate the budget.
    """
    from planarslam_tpu.ops.image import maxpool_3x3

    h, w = score.shape
    # border + threshold mask
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = ((yy >= border) & (yy < h - border) &
                 (xx >= border) & (xx < w - border))
    is_max = score >= maxpool_3x3(score)
    s = jnp.where(in_border & is_max & (score > min_score), score, -1.0)

    # tile partition (pad to tile multiples with -1)
    nth = -(-h // tile)
    ntw = -(-w // tile)
    sp = jnp.pad(s, ((0, nth * tile - h), (0, ntw * tile - w)), constant_values=-1.0)
    tiles = sp.reshape(nth, tile, ntw, tile).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(nth * ntw, tile * tile)

    n_tiles = nth * ntw
    k_tile = max(1, min(tile * tile, -(-2 * k_total // n_tiles)))
    if k_tile <= 4:
        # extract-the-max k_tile times: lax.top_k lowers to a full per-row
        # sort on TPU; k_tile is 1-4 here, so a few argmax+mask passes are
        # far cheaper than sorting every tile's tile^2 scores
        cols = jax.lax.broadcasted_iota(jnp.int32, tiles.shape, 1)
        vs, is_ = [], []
        t_cur = tiles
        for _ in range(k_tile):
            i_b = jnp.argmax(t_cur, axis=1).astype(jnp.int32)
            vs.append(jnp.take_along_axis(t_cur, i_b[:, None], axis=1)[:, 0])
            is_.append(i_b)
            t_cur = jnp.where(cols == i_b[:, None], -1.0, t_cur)
        vals = jnp.stack(vs, axis=1)
        idx = jnp.stack(is_, axis=1)
    else:
        vals, idx = jax.lax.top_k(tiles, k_tile)  # (n_tiles, k_tile)

    # tile-local -> global pixel coords
    ty = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, k_tile), 0) // ntw
    tx = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, k_tile), 0) % ntw
    py = ty * tile + idx // tile
    px = tx * tile + idx % tile

    flat_vals = vals.reshape(-1)
    flat_y = py.reshape(-1)
    flat_x = px.reshape(-1)
    top_vals, top_i = jax.lax.top_k(flat_vals, k_total)
    uv = jnp.stack([flat_x[top_i].astype(jnp.float32),
                    flat_y[top_i].astype(jnp.float32)], axis=-1)
    valid = top_vals > 0.0
    return uv, jnp.maximum(top_vals, 0.0), valid
