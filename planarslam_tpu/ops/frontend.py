"""Fused per-frame ORB feature extraction (the hot path).

Re-architects the reference's three-thread Frame pipeline stage for points
(`src/Frame.cc:90-95` thread 1 → `src/ORBextractor.cc:1043`): pyramid →
dense FAST scores → NMS + per-tile top-k → orientation → steered BRIEF →
undistortion → RGB-D pseudo-stereo depth association
(`src/Frame.cc:603-621`), all as one jit-compiled graph with static shapes.

Outputs are fixed-capacity arrays with validity masks (capacity =
ORBConfig.max_keypoints); invalid slots carry zeros / -1 sentinels exactly
like the reference's NULL feature slots.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.config import CameraConfig, ORBConfig
from planarslam_tpu.ops import fast, image, orb

EDGE_BORDER = 19  # reference EDGE_THRESHOLD (`src/ORBextractor.cc`)


class PointFeatures(NamedTuple):
    """Per-frame keypoint block (capacity K = orb.max_keypoints)."""

    uv: jnp.ndarray        # (K, 2) float32 undistorted level-0 pixel coords
    uv_raw: jnp.ndarray    # (K, 2) float32 distorted (as-detected) coords
    response: jnp.ndarray  # (K,) float32 FAST score
    level: jnp.ndarray     # (K,) int32 pyramid level
    angle: jnp.ndarray     # (K,) float32 orientation (radians)
    desc: jnp.ndarray      # (K, 8) uint32 packed rBRIEF
    depth: jnp.ndarray     # (K,) float32 metres (-1 if unknown)
    u_right: jnp.ndarray   # (K,) float32 pseudo-stereo right u (-1 if unknown)
    valid: jnp.ndarray     # (K,) bool


def level_quotas(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Per-level keypoint budget, geometric in 1/scale (reference ctor
    `src/ORBextractor.cc:410` feature distribution)."""
    f = 1.0 / scale_factor
    base = n_features * (1 - f) / (1 - f ** n_levels)
    quotas = [int(round(base * f ** l)) for l in range(n_levels)]
    quotas[-1] = max(0, n_features - sum(quotas[:-1]))
    return quotas


def undistort_points(uv: jnp.ndarray, cam: CameraConfig, iters: int = 5
                     ) -> jnp.ndarray:
    """Invert the radial-tangential model by fixed-point iteration
    (replaces cv::undistortPoints used at `src/Frame.cc:545`)."""
    if not cam.has_distortion:
        return uv
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    k1, k2, p1, p2, k3 = cam.k1, cam.k2, cam.p1, cam.p2, cam.k3
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    xu, yu = xd, yd
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu)
        dy = p1 * (r2 + 2 * yu * yu) + 2 * p2 * xu * yu
        xu = (xd - dx) / radial
        yu = (yd - dy) / radial
    return jnp.stack([xu * fx + cx, yu * fy + cy], axis=-1)


def extract_point_features(gray: jnp.ndarray, depth: jnp.ndarray,
                           cam: CameraConfig, cfg: ORBConfig) -> PointFeatures:
    """Full ORB front end for one frame. gray: (H, W) f32 [0,255],
    depth: (H, W) f32 metres (0 = invalid)."""
    levels = image.build_pyramid(gray, cfg.n_levels, cfg.scale_factor)
    quotas = level_quotas(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    uvs, resps, lvls, angs, descs = [], [], [], [], []
    for l, img_l in enumerate(levels):
        if quotas[l] == 0:
            continue
        tile = max(8, int(round(cfg.tile / (cfg.scale_factor ** l))))
        score = fast.fast_score(img_l)
        uv_l, resp_l, valid_l = fast.select_keypoints(
            score, tile=tile, k_total=quotas[l],
            min_score=float(cfg.min_th_fast), border=EDGE_BORDER)
        ang_l = orb.orientations(img_l, uv_l, valid_l)
        blur_l = image.blur(img_l, ksize=7, sigma=2.0)
        desc_l = orb.descriptors(blur_l, uv_l, ang_l, valid_l)
        scale = cfg.scale_factor ** l
        uvs.append(uv_l * scale)
        resps.append(jnp.where(valid_l, resp_l, 0.0))
        lvls.append(jnp.full((quotas[l],), l, dtype=jnp.int32))
        angs.append(ang_l)
        descs.append(desc_l)

    uv_raw = jnp.concatenate(uvs)
    response = jnp.concatenate(resps)
    level = jnp.concatenate(lvls)
    angle = jnp.concatenate(angs)
    desc = jnp.concatenate(descs)
    valid = response > 0.0

    k = cfg.max_keypoints
    n = uv_raw.shape[0]
    if n < k:
        pad = k - n
        uv_raw = jnp.pad(uv_raw, ((0, pad), (0, 0)))
        response = jnp.pad(response, (0, pad))
        level = jnp.pad(level, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    elif n > k:
        raise ValueError(f"n_features {n} exceeds max_keypoints {k}")

    uv = undistort_points(uv_raw, cam)

    # RGB-D pseudo-stereo (reference `src/Frame.cc:603-621`): depth looked up
    # at the *detected* (distorted) coordinates, disparity from bf.
    d = image.nearest_sample(depth, uv_raw)
    has_d = (d > 1e-6) & valid
    u_right = jnp.where(has_d, uv[:, 0] - cam.bf / jnp.maximum(d, 1e-6), -1.0)
    d_out = jnp.where(has_d, d, -1.0)

    return PointFeatures(uv=uv, uv_raw=uv_raw, response=response, level=level,
                         angle=angle, desc=desc, depth=d_out, u_right=u_right,
                         valid=valid)
