"""TUM RGB-D dataset IO and trajectory formats.

Mirrors the reference's association-file loader (`Examples/RGB-D/main.cc:126-151`)
and TUM-format trajectory writers (`src/System.cc:192-320`): lines of
``timestamp tx ty tz qx qy qz qw`` so the standard TUM benchmark tools can
evaluate ATE offline.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class Association:
    timestamps: List[float]
    rgb_paths: List[str]
    depth_paths: List[str]

    def __len__(self):
        return len(self.timestamps)


def load_associations(path: str, root: Optional[str] = None) -> Association:
    """Parse a TUM `associations.txt` (reference `main.cc:126-151`).

    Lines: ``t_rgb rgb/xxx.png t_depth depth/xxx.png`` (comments with #).
    """
    root = root if root is not None else os.path.dirname(os.path.abspath(path))
    ts, rgbs, depths = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 4:
                continue
            ts.append(float(parts[0]))
            rgbs.append(os.path.join(root, parts[1]))
            depths.append(os.path.join(root, parts[3]))
    return Association(ts, rgbs, depths)


def load_rgbd_frame(rgb_path: str, depth_path: str,
                    depth_map_factor: float = 5000.0,
                    native: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Load one RGB-D pair.

    native=True (default): (gray uint8, depth uint16 raw units) — the TUM
    on-disk formats (reference feeds CV_8U/CV_16U straight to tracking,
    `Examples/RGB-D/main.cc:75,126-151`). These dtypes engage the tracker's
    single-packed-upload fast path (`device_tracker.pack_frame`); metres
    conversion happens device-side using `camera.depth_map_factor`, which
    must equal the `depth_map_factor` the dataset was encoded with.

    native=False: (gray float32 [0,255], depth float32 metres) — the slow
    two-float-upload path, for non-standard depth encodings.
    """
    gray, depth = _imread_pair(rgb_path, depth_path)
    if native and gray.dtype == np.uint8 and depth.dtype == np.uint16:
        return gray, depth
    return (gray.astype(np.float32),
            depth.astype(np.float32) / depth_map_factor)


def _imread_pair(rgb_path: str, depth_path: str
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """PNG decode via cv2 when present, PIL otherwise (both read TUM's
    8-bit RGB and 16-bit grayscale depth PNGs)."""
    try:
        import cv2

        rgb = cv2.imread(rgb_path, cv2.IMREAD_UNCHANGED)
        depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        if rgb is None or depth is None:
            raise FileNotFoundError(
                f"failed to load {rgb_path} / {depth_path}")
        if rgb.ndim == 3:
            gray = cv2.cvtColor(rgb, cv2.COLOR_BGR2GRAY)
        else:
            gray = rgb
        return gray, depth
    except ImportError:
        from PIL import Image

        rgb = Image.open(rgb_path)
        gray = np.asarray(rgb.convert("L")) if rgb.mode not in ("L", "I;16") \
            else np.asarray(rgb)
        depth = np.asarray(Image.open(depth_path))
        if depth.dtype == np.int32:  # PIL mode "I" for 16-bit PNG
            depth = depth.astype(np.uint16)
        return gray, depth


def write_trajectory_tum(path: str, timestamps, poses_wc: np.ndarray) -> None:
    """Write camera-to-world poses in TUM format (reference `src/System.cc:192-251`).

    poses_wc: (N, 4, 4) camera-to-world transforms (Twc).
    """
    from scipy.spatial.transform import Rotation

    poses_wc = np.asarray(poses_wc)
    qs = Rotation.from_matrix(poses_wc[:, :3, :3]).as_quat()  # (x, y, z, w)
    qs = qs * np.where(qs[:, 3:4] < 0, -1.0, 1.0)
    with open(path, "w") as f:
        for t, T, q in zip(timestamps, poses_wc, qs):
            tx, ty, tz = T[:3, 3]
            f.write(f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")


def read_trajectory_tum(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read TUM trajectory -> (timestamps (N,), poses_wc (N,4,4))."""
    from scipy.spatial.transform import Rotation

    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.split()]
            if len(vals) >= 8:
                rows.append(vals[:8])
    arr = np.asarray(rows, dtype=np.float64)
    ts = arr[:, 0]
    t = arr[:, 1:4]
    q = arr[:, 4:8]
    R = Rotation.from_quat(q).as_matrix()
    poses = np.tile(np.eye(4, dtype=np.float64), (len(rows), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    return ts, poses
