"""Synthetic Manhattan-world RGB-D sequence generator with ground truth.

The reference is verified only by replaying TUM/ICL-NUIM sequences
(SURVEY.md §4); those datasets are not available in this offline environment,
so this module provides the test/benchmark substrate: an analytic renderer
for a textured Manhattan room (finite textured planes), producing
640x480-class gray + depth frames plus exact ground-truth trajectories.
Structure matches what the SLAM stack consumes: dominant planes for PEAC-style
segmentation, plane borders for line features, corner-rich textures for FAST,
and Manhattan-aligned normals for the rotation tracker.

Deterministic (seeded numpy); pure host-side numpy — speed is irrelevant here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class TexturedPlane:
    """A finite textured rectangle: x(u,v) = origin + u*axis_u + v*axis_v."""

    origin: np.ndarray  # (3,)
    axis_u: np.ndarray  # (3,) unit
    axis_v: np.ndarray  # (3,) unit
    half_u: float
    half_v: float
    texture: np.ndarray  # (T, T) float32 in [0, 255]

    @property
    def normal(self) -> np.ndarray:
        n = np.cross(self.axis_u, self.axis_v)
        return n / np.linalg.norm(n)

    @property
    def d(self) -> float:
        """Hessian d with n·x + d = 0."""
        return float(-self.normal @ self.origin)


def _corner_texture(rng: np.random.Generator, size: int = 256,
                    cells: int = 24, contrast: float = 110.0) -> np.ndarray:
    """Corner-rich texture: random blocky pattern (sharp edges → FAST corners)
    plus low-frequency shading so blocks are distinguishable for matching."""
    blocks = rng.uniform(-1.0, 1.0, (cells, cells))
    up = np.kron(blocks, np.ones((size // cells + 1, size // cells + 1)))[:size, :size]
    yy, xx = np.mgrid[0:size, 0:size] / size
    shading = 0.35 * np.sin(2 * np.pi * (1.3 * xx + 0.4)) * np.cos(2 * np.pi * (0.9 * yy))
    fine = rng.uniform(-0.15, 0.15, (size, size))
    tex = 128.0 + contrast * 0.5 * (up + shading + fine)
    return np.clip(tex, 5.0, 250.0).astype(np.float32)


def _photo_textures(n: int, size: int = 256):
    """n grayscale texture tiles cut from a REAL photograph (matplotlib's
    bundled `grace_hopper.jpg` — third-party authored): the corner-rich
    blocky textures above share authorship and statistics with the SLAM
    stack under test (round-4 VERDICT weak #6 "synthetic-texture
    monoculture"); photographic texture has natural 1/f spectra, smooth
    gradients and sparse corners. Returns None when the sample image is
    unavailable (callers fall back to the synthetic textures)."""
    try:
        import matplotlib
        from PIL import Image

        path = os.path.join(os.path.dirname(matplotlib.__file__),
                            "mpl-data", "sample_data", "grace_hopper.jpg")
        img = np.asarray(Image.open(path).convert("L"), np.float32)
    except Exception:
        return None
    H, W = img.shape
    if H < size or W < size:
        return None
    tiles = []
    k = 0
    while len(tiles) < n:
        # distinct crops on a coarse grid, cycled through 90-degree
        # rotations so every wall gets a different view of the photo
        gy = (k * 97) % max(H - size, 1)
        gx = (k * 131) % max(W - size, 1)
        crop = img[gy:gy + size, gx:gx + size]
        crop = np.rot90(crop, k % 4)
        lo, hi = np.percentile(crop, [2, 98])
        crop = (crop - lo) / max(hi - lo, 1.0)
        tiles.append(np.clip(5.0 + 245.0 * crop, 5.0, 250.0)
                     .astype(np.float32))
        k += 1
    return tiles


def kinect_depth_std(d: np.ndarray) -> np.ndarray:
    """Depth standard deviation sigma(z) = c1 z^2 + c2 z + c3 in metres —
    the reference's Kinect noise model with its exact coefficients
    (`src/LineExtractor.cpp:1182-1194` depthStdDev: c1=0.00273,
    c2=0.00074, c3=-0.00058)."""
    return np.maximum(0.00273 * d * d + 0.00074 * d - 0.00058, 0.0)


def make_corridor(seed: int = 0, length: float = 10.0, width: float = 2.0,
                  height: float = 2.4, contrast: float = 40.0
                  ) -> List[TexturedPlane]:
    """Texture-poor corridor (SURVEY §6 stress config: plane-dominant,
    feature-starved): two long side walls, floor, ceiling, end wall, all
    with low-contrast coarse textures. The camera travels down +z."""
    rng = np.random.default_rng(seed)
    hw, hh, hl = width / 2.0, height / 2.0, length / 2.0
    ex = np.array([1.0, 0, 0])
    ey = np.array([0, 1.0, 0])
    ez = np.array([0, 0, 1.0])

    def tex(cells=8):
        return _corner_texture(rng, cells=cells, contrast=contrast)

    return [
        # left / right walls (x = -hw / +hw), long in z
        TexturedPlane(np.array([-hw, 0, hl]), ez, ey, hl, hh, tex()),
        TexturedPlane(np.array([hw, 0, hl]), ez, ey, hl, hh, tex()),
        # floor (y = +hh, camera y points down) / ceiling
        TexturedPlane(np.array([0, hh, hl]), ex, ez, hw, hl, tex()),
        TexturedPlane(np.array([0, -hh, hl]), ex, ez, hw, hl, tex()),
        # end wall
        TexturedPlane(np.array([0, 0, length]), ex, ey, hw, hh,
                      tex(cells=12)),
    ]


def make_room(seed: int = 0, size: float = 4.0, texture: str = "blocks"
              ) -> List[TexturedPlane]:
    """A Manhattan room: floor, ceiling, three walls, plus two boxes.

    Camera starts near the origin looking down +z; the room spans
    x,y in [-size/2, size/2], z in [0, size].

    texture="photo" papers every plane with crops of a real photograph
    (see _photo_textures) instead of the authored blocky patterns."""
    rng = np.random.default_rng(seed)
    tiles = _photo_textures(7) if texture == "photo" else None

    def tex(cells=24):
        if tiles is not None:
            return tiles.pop(0)
        return _corner_texture(rng, cells=cells)

    s = size / 2.0
    ex = np.array([1.0, 0, 0])
    ey = np.array([0, 1.0, 0])
    ez = np.array([0, 0, 1.0])
    planes = [
        # back wall at z = size (normal -z, faces camera)
        TexturedPlane(np.array([0, 0, size]), ex, ey, s, s, tex()),
        # floor at y = +s (camera convention: y down)
        TexturedPlane(np.array([0, s, s]), ex, ez, s, s, tex()),
        # ceiling at y = -s
        TexturedPlane(np.array([0, -s, s]), ex, ez, s, s, tex()),
        # left wall x = -s
        TexturedPlane(np.array([-s, 0, s]), ez, ey, s, s, tex()),
        # right wall x = +s
        TexturedPlane(np.array([s, 0, s]), ez, ey, s, s, tex()),
        # a box face mid-room (parallel to back wall — structural regularity)
        TexturedPlane(np.array([-0.8, 0.6, 2.4]), ex, ey, 0.5, 0.4,
                      tex(cells=16)),
        # a second, perpendicular face
        TexturedPlane(np.array([0.9, 0.4, 2.8]), ez, ey, 0.4, 0.5,
                      tex(cells=16)),
    ]
    return planes


@dataclass
class SyntheticSequence:
    planes: List[TexturedPlane]
    poses_wc: np.ndarray  # (N, 4, 4) camera-to-world (ground truth, Twc)
    timestamps: np.ndarray  # (N,)
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    depth_noise: float = 0.0
    noise_model: str = "scaled"
    _rng: np.random.Generator = field(default_factory=lambda: np.random.default_rng(7))

    def __len__(self):
        return len(self.poses_wc)

    def render(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """Render frame i -> (gray float32 (H,W), depth float32 metres (H,W))."""
        return render_frame(self.planes, self.poses_wc[i],
                            (self.fx, self.fy, self.cx, self.cy),
                            self.width, self.height,
                            depth_noise=self.depth_noise,
                            noise_model=self.noise_model, rng=self._rng)


def render_frame(planes: List[TexturedPlane], T_wc: np.ndarray,
                 intrinsics: Tuple[float, float, float, float],
                 width: int, height: int, depth_noise: float = 0.0,
                 noise_model: str = "scaled",
                 rng: Optional[np.random.Generator] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    fx, fy, cx, cy = intrinsics
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    v, u = np.mgrid[0:height, 0:width].astype(np.float64)
    dirs_cam = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)
    dirs_w = dirs_cam @ R.T  # (H, W, 3); z-depth = ray parameter t

    best_t = np.full((height, width), np.inf)
    gray = np.full((height, width), 20.0, dtype=np.float64)
    for pl in planes:
        n = pl.normal
        denom = dirs_w @ n
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        t = -(o @ n + pl.d) / denom
        hit = o + t[..., None] * dirs_w
        rel = hit - pl.origin
        pu = rel @ pl.axis_u
        pv = rel @ pl.axis_v
        valid = (t > 0.05) & (np.abs(pu) <= pl.half_u) & (np.abs(pv) <= pl.half_v)
        closer = valid & (t < best_t)
        if not closer.any():
            continue
        T = pl.texture.shape[0]
        tu = (pu / (2 * pl.half_u) + 0.5) * (T - 1)
        tv = (pv / (2 * pl.half_v) + 0.5) * (T - 1)
        iu0 = np.clip(tu.astype(np.int64), 0, T - 2)
        iv0 = np.clip(tv.astype(np.int64), 0, T - 2)
        au = np.clip(tu - iu0, 0.0, 1.0)
        av = np.clip(tv - iv0, 0.0, 1.0)
        tex = pl.texture
        val = ((1 - au) * (1 - av) * tex[iv0, iu0] + au * (1 - av) * tex[iv0, iu0 + 1]
               + (1 - au) * av * tex[iv0 + 1, iu0] + au * av * tex[iv0 + 1, iu0 + 1])
        gray = np.where(closer, val, gray)
        best_t = np.where(closer, t, best_t)

    depth = np.where(np.isfinite(best_t), best_t, 0.0)
    if depth_noise > 0:
        rng = rng or np.random.default_rng(0)
        if noise_model == "kinect":
            # sensor-realistic: sigma(z) from the reference's Kinect model
            # (`src/LineExtractor.cpp:1182`), depth_noise acts as a scale
            # (1.0 = nominal sensor)
            sigma = kinect_depth_std(depth) * depth_noise
        else:  # legacy quadratic-in-depth scale model
            sigma = depth_noise * np.maximum(depth, 0.5) ** 2
        noise = rng.normal(0.0, 1.0, depth.shape) * sigma
        depth = np.where(depth > 0, np.maximum(depth + noise, 0.0), 0.0)
    return gray.astype(np.float32), depth.astype(np.float32)


def make_trajectory(n_frames: int, kind: str = "arc", seed: int = 3,
                    fps: float = 30.0) -> Tuple[np.ndarray, np.ndarray]:
    """Smooth ground-truth trajectories inside the room. Returns (ts, Twc).

    Pure numpy/scipy — a single eager JAX op on the axon tunnel flips the
    runtime into sync mode (~30 ms per subsequent call), so host-side data
    generation must never touch jnp.
    """
    from scipy.spatial.transform import Rotation

    ts = np.arange(n_frames) / fps
    poses = np.tile(np.eye(4), (n_frames, 1, 1))
    p = np.linspace(0.0, 1.0, n_frames)
    if kind == "arc":
        x = 0.7 * np.sin(1.2 * np.pi * p)
        y = 0.15 * np.sin(2.1 * np.pi * p)
        z = 0.55 * (1 - np.cos(1.2 * np.pi * p))
        yaw = 0.35 * np.sin(1.1 * np.pi * p)
        pitch = 0.08 * np.sin(2.0 * np.pi * p)
        roll = 0.05 * np.sin(1.7 * np.pi * p)
    elif kind == "loop":
        # gentle closed loop: returns to the start pose, camera mostly
        # forward-facing so the map stays in view the whole way round
        ang = 2 * np.pi * p
        x = 0.45 * np.sin(ang)
        y = 0.08 * np.sin(2 * ang)
        z = 0.3 * (1 - np.cos(ang))
        yaw = 0.22 * np.sin(ang)
        pitch = 0.04 * np.sin(2 * ang)
        roll = np.zeros_like(p)
    elif kind == "corridor":
        # forward travel down a hallway (+z) with gentle sway and look-around
        x = 0.12 * np.sin(1.5 * np.pi * p)
        y = 0.05 * np.sin(2.3 * np.pi * p)
        z = 2.2 * p
        yaw = 0.10 * np.sin(1.8 * np.pi * p)
        pitch = 0.04 * np.sin(2.6 * np.pi * p)
        roll = np.zeros_like(p)
    elif kind == "still":
        x = y = z = yaw = pitch = roll = np.zeros_like(p)
    else:
        raise ValueError(f"unknown trajectory kind {kind}")
    for i in range(n_frames):
        Rz = Rotation.from_rotvec([0.0, 0.0, roll[i]]).as_matrix()
        Ry = Rotation.from_rotvec([0.0, yaw[i], 0.0]).as_matrix()
        Rx = Rotation.from_rotvec([pitch[i], 0.0, 0.0]).as_matrix()
        poses[i, :3, :3] = Ry @ Rx @ Rz
        poses[i, :3, 3] = [x[i], y[i], z[i]]
    return ts, poses


def make_sequence(n_frames: int = 60, width: int = 640, height: int = 480,
                  kind: str = "arc", seed: int = 0, fps: float = 30.0,
                  depth_noise: float = 0.0, noise_model: str = "scaled",
                  scene: str = "room", texture: str = "blocks",
                  intrinsics: Optional[Tuple[float, float, float, float]] = None
                  ) -> SyntheticSequence:
    if scene == "corridor":
        planes = make_corridor(seed=seed)
    else:
        planes = make_room(seed=seed, texture=texture)
    ts, poses = make_trajectory(n_frames, kind=kind, seed=seed, fps=fps)
    if intrinsics is None:
        scale = width / 640.0
        intrinsics = (535.4 * scale, 539.2 * scale, width / 2.0 - 0.5, height / 2.0 - 0.5)
    fx, fy, cx, cy = intrinsics
    return SyntheticSequence(planes, poses, ts, fx, fy, cx, cy, width, height,
                             depth_noise=depth_noise, noise_model=noise_model,
                             _rng=np.random.default_rng(seed + 1000))
