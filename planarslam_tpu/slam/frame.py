"""Fused per-frame perception: points ∥ lines ∥ planes ∥ normals in one jit.

The reference extracts ORB, LSD and planes in three parallel std::threads
(`src/Frame.cc:90-95`); here task parallelism becomes one fused XLA program
over the same frame (SURVEY.md §2 parallelism table) — the compiler
schedules the independent subgraphs. Returns fixed-capacity feature blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.ops import lines as line_ops
from planarslam_tpu.ops import planes as plane_ops
from planarslam_tpu.ops.frontend import PointFeatures, extract_point_features
from planarslam_tpu.ops.lines import LineFeatures
from planarslam_tpu.ops.planes import PlaneFeatures


class FrameFeatures(NamedTuple):
    points: PointFeatures
    lines: LineFeatures
    planes: PlaneFeatures
    normals: jnp.ndarray        # (Nn, 3) subsampled surface normals
    normals_valid: jnp.ndarray  # (Nn,) bool


def _normal_stride(cfg: SystemConfig) -> int:
    h, w = cfg.camera.height, cfg.camera.width
    budget = cfg.manhattan.max_normals
    s = 1
    while (h // s) * (w // s) > budget:
        s += 1
    return s


@partial(jax.jit, static_argnames=("cfg",))
def extract_frame(gray: jnp.ndarray, depth: jnp.ndarray,
                  cfg: SystemConfig) -> FrameFeatures:
    pts = extract_point_features(gray, depth, cfg.camera, cfg.orb)
    lns = line_ops.extract_line_features(gray, depth, cfg.camera, cfg.lines)
    # plane segmentation reads the RAW depth: PEAC's depth-dependent block
    # MSE gate is itself the noise filter (`AHCParamSet.hpp:87` — under
    # sensor noise beyond T_mse(z) the reference's fitter rejects blocks
    # too), and any pre-smoothing rounds room-corner creases into curved
    # bands that fit as spurious diagonal planes.
    pls = plane_ops.extract_planes(depth, cfg.camera, cfg.planes)

    # surface normals DO read an edge-preserving smoothed depth — the
    # reference's normal path averages the same way (PCL integral-image
    # normals w/ smoothing 10 on a subsampled cloud, `src/Frame.cc:715-728`)
    # and raw 1-px central differences are noise-dominated under a
    # realistic sigma(z) sensor model, starving Manhattan tracking
    depth_s = plane_ops.box_smooth_depth(depth, cfg.planes.smooth_window)
    points3d = plane_ops.backproject_depth(depth_s, cfg.camera)
    stride = _normal_stride(cfg)
    n, v = plane_ops.surface_normals(points3d, stride=stride)
    n = n.reshape(-1, 3)
    v = v.reshape(-1)
    budget = cfg.manhattan.max_normals
    if n.shape[0] < budget:
        n = jnp.pad(n, ((0, budget - n.shape[0]), (0, 0)))
        v = jnp.pad(v, (0, budget - v.shape[0]))
    else:
        n = n[:budget]
        v = v[:budget]
    return FrameFeatures(points=pts, lines=lns, planes=pls,
                         normals=n, normals_valid=v)


def unproject_points(feats: PointFeatures, cfg: SystemConfig,
                     T_wc: np.ndarray) -> np.ndarray:
    """World 3D positions for features with depth (host helper).

    Returns (K, 3) float32; rows without depth are zeros (mask with
    feats.depth > 0).
    """
    uv = np.asarray(feats.uv)
    z = np.asarray(feats.depth)
    cam = cfg.camera
    x = (uv[:, 0] - cam.cx) / cam.fx * z
    y = (uv[:, 1] - cam.cy) / cam.fy * z
    pc = np.stack([x, y, z], axis=-1)
    pw = pc @ T_wc[:3, :3].T + T_wc[:3, 3]
    return np.where((z > 0)[:, None], pw, 0.0).astype(np.float32)
