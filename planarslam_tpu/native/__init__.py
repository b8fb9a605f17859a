"""ctypes bindings for the native map-bookkeeping core (mapcore.cpp).

Compiled lazily on first use with g++ (no pybind11 in the image; plain C ABI
via ctypes). Falls back to pure-numpy implementations if no compiler is
available, so the package never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mapcore.cpp")
_LIB_PATH = os.path.join(_HERE, "libmapcore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i64 = ctypes.c_int64
        f64 = ctypes.c_double
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.covis_update.argtypes = [p_i32, p_u8, p_u8, i64, i64, i64, p_i32]
        lib.covis_update.restype = None
        lib.voxel_merge.argtypes = [p_f32, i64, p_f32, i64, f64, i64]
        lib.voxel_merge.restype = i64
        lib.plane_cloud_min_dist.argtypes = [p_f32, i64, p_f64]
        lib.plane_cloud_min_dist.restype = f64
        lib.associate_planes.argtypes = [p_f64, i64, p_f64, p_u8, i64, p_f32,
                                         p_i32, i64, f64, f64, f64, f64,
                                         p_i32, p_i32, p_i32]
        lib.associate_planes.restype = None
        _lib = lib
        return _lib


def covis_update(kf_pt_idx: np.ndarray, kf_valid: np.ndarray,
                 pt_valid: np.ndarray, n_kf: int, kf: int) -> np.ndarray:
    """Shared-point weights between `kf` and the first n_kf keyframes."""
    lib = get_lib()
    kp = kf_pt_idx.shape[1]
    if lib is not None:
        out = np.zeros(n_kf, np.int32)
        lib.covis_update(np.ascontiguousarray(kf_pt_idx[:n_kf], np.int32),
                         np.ascontiguousarray(kf_valid[:n_kf], np.uint8),
                         np.ascontiguousarray(pt_valid, np.uint8),
                         n_kf, kp, kf, out)
        return out
    # numpy fallback
    own = kf_pt_idx[kf]
    own = own[(own >= 0)]
    own = own[pt_valid[own].astype(bool)]
    mask = np.zeros(len(pt_valid), bool)
    mask[own] = True
    out = np.zeros(n_kf, np.int32)
    for other in range(n_kf):
        if other == kf or not kf_valid[other]:
            continue
        o = kf_pt_idx[other]
        o = o[o >= 0]
        out[other] = int(mask[o].sum()) if len(o) else 0
    return out


def voxel_merge(cloud: np.ndarray, n_cur: int, pts_new: np.ndarray,
                leaf: float, cap: int) -> int:
    """Merge pts_new into cloud[:cap] (in place), one point per voxel."""
    lib = get_lib()
    pts_new = np.ascontiguousarray(pts_new, np.float32)
    if lib is not None:
        return int(lib.voxel_merge(cloud, n_cur, pts_new, len(pts_new),
                                   float(leaf), cap))
    allpts = np.concatenate([cloud[:n_cur], pts_new], axis=0)
    key = np.floor(allpts / leaf).astype(np.int64)
    h = ((key[:, 0] * 73856093) ^ (key[:, 1] * 19349663)
         ^ (key[:, 2] * 83492791))
    _, first = np.unique(h, return_index=True)
    kept = allpts[np.sort(first)]
    if len(kept) > cap:
        step = len(kept) / cap
        kept = kept[(np.arange(cap) * step).astype(int)]
    cloud[:len(kept)] = kept
    return len(kept)


def plane_cloud_min_dist(cloud: np.ndarray, n: int,
                         coeffs: np.ndarray) -> float:
    lib = get_lib()
    if n == 0:
        return float("inf")
    if lib is not None:
        return float(lib.plane_cloud_min_dist(
            cloud, n, np.ascontiguousarray(coeffs, np.float64)))
    c = coeffs / max(np.linalg.norm(coeffs[:3]), 1e-9)
    return float(np.abs(cloud[:n] @ c[:3] + c[3]).min())


def associate_planes(frame_coeffs_w: np.ndarray, map_coeffs: np.ndarray,
                     map_valid: np.ndarray, clouds: np.ndarray,
                     cloud_n: np.ndarray, assoc_angle: float,
                     assoc_dist: float, ver_th: float, par_th: float):
    """Batch PlaneMatcher. Returns (direct, par, ver) int32 arrays."""
    lib = get_lib()
    nf = len(frame_coeffs_w)
    nm = len(map_coeffs)
    direct = np.full(nf, -1, np.int32)
    par = np.full(nf, -1, np.int32)
    ver = np.full(nf, -1, np.int32)
    if nf == 0 or nm == 0:
        return direct, par, ver
    if lib is not None:
        lib.associate_planes(
            np.ascontiguousarray(frame_coeffs_w, np.float64), nf,
            np.ascontiguousarray(map_coeffs, np.float64),
            np.ascontiguousarray(map_valid, np.uint8), nm,
            np.ascontiguousarray(clouds, np.float32),
            np.ascontiguousarray(cloud_n, np.int32), clouds.shape[1],
            assoc_angle, assoc_dist, ver_th, par_th, direct, par, ver)
        return direct, par, ver
    # numpy fallback
    for i in range(nf):
        f = frame_coeffs_w[i]
        fn = np.linalg.norm(f[:3])
        if fn < 1e-12:
            continue
        nf_v = f[:3] / fn
        best_dist = np.inf
        best_par, best_ver = par_th, ver_th
        for j in range(nm):
            if not map_valid[j]:
                continue
            mn = np.linalg.norm(map_coeffs[j, :3])
            if mn < 1e-12:
                continue
            cos = abs(float(nf_v @ map_coeffs[j, :3] / mn))
            if cos > assoc_angle:
                d = plane_cloud_min_dist(clouds[j], int(cloud_n[j]), f)
                if d < assoc_dist and d < best_dist:
                    best_dist = d
                    direct[i] = j
            if cos > best_par:
                best_par = cos
                par[i] = j
            if cos < best_ver:
                best_ver = cos
                ver[i] = j
        # par/ver kept independently of a direct match (PlaneMatcher.cpp
        # :48-61); only the direct plane is not its own structural partner
        if direct[i] >= 0 and par[i] == direct[i]:
            par[i] = -1
        if direct[i] >= 0 and ver[i] == direct[i]:
            ver[i] = -1
    return direct, par, ver
