"""Map checkpoint / resume.

The reference leaves SaveMap/LoadMap as a TODO (`include/System.h:104-106`);
with an array-based map this is one compressed npz (SURVEY.md §5.4). The
checkpoint contains every SlamMap array plus counters, so a reloaded system
can relocalize against the stored map (kidnapped-robot start) or continue
mapping.
"""

from __future__ import annotations

import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.slam.map import SlamMap

_FIELDS = [
    "pt_xyz", "pt_desc", "pt_normal", "pt_min_dist", "pt_max_dist",
    "pt_valid", "pt_nobs", "pt_visible", "pt_found", "pt_first_kf",
    "pt_on_plane",
    "ln_sw", "ln_ew", "ln_desc", "ln_valid", "ln_nobs", "ln_first_kf",
    "pl_coeffs", "pl_valid", "pl_nobs", "pl_first_kf", "pl_cloud",
    "pl_cloud_n",
    "kf_pose", "kf_valid", "kf_frame_id", "kf_timestamp", "kf_uv", "kf_ur",
    "kf_depth", "kf_level", "kf_angle", "kf_desc", "kf_feat_valid",
    "kf_pt_idx", "kf_ln_idx", "kf_pl_idx", "kf_pl_par_idx", "kf_pl_ver_idx",
    "kf_pl_coeffs", "kf_ln_line2d", "kf_ln_desc", "kf_ln_valid", "kf_bow",
    "covis", "kf_parent",
]
_COUNTERS = ["n_kf", "next_pt", "next_ln", "next_pl"]


def save_map(path: str, slam_map: SlamMap) -> None:
    data = {f: getattr(slam_map, f) for f in _FIELDS}
    data.update({f"__{c}": np.int64(getattr(slam_map, c)) for c in _COUNTERS})
    np.savez_compressed(path, **data)


def load_map(path: str, cfg: SystemConfig) -> SlamMap:
    m = SlamMap(cfg)
    with np.load(path) as z:
        for f in _FIELDS:
            arr = z[f]
            own = getattr(m, f)
            if own.shape != arr.shape:
                raise ValueError(
                    f"checkpoint field {f} shape {arr.shape} does not match "
                    f"config capacities {own.shape}")
            own[...] = arr
        for c in _COUNTERS:
            setattr(m, c, int(z[f"__{c}"]))
    return m
