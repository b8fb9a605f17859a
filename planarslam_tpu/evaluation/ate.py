"""Absolute trajectory error (ATE) evaluation.

In-repo replacement for the external TUM benchmark tool the reference relies
on (`README.md:99-103`, `evaluate_ate.py`): Horn/Umeyama alignment of the
estimated trajectory to ground truth followed by RMSE of the translational
residuals. The reference writes trajectories out and evaluates offline
(`src/System.cc:192-251`); we keep that protocol and also expose a direct
array API for tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def align_umeyama(est: np.ndarray, gt: np.ndarray,
                  with_scale: bool = False) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity alignment est -> gt. Returns (R, t, s)."""
    est = np.asarray(est, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    xe = est - mu_e
    xg = gt - mu_g
    C = xg.T @ xe / len(est)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_e = (xe ** 2).sum() / len(est)
        s = float(np.trace(np.diag(D) @ S) / max(var_e, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return R, t, s


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray,
             with_scale: bool = False) -> float:
    """RMSE of aligned translational error (the metric of record)."""
    R, t, s = align_umeyama(est_positions, gt_positions, with_scale)
    aligned = (s * (R @ np.asarray(est_positions, dtype=np.float64).T)).T + t
    err = aligned - np.asarray(gt_positions, dtype=np.float64)
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def associate_by_time(ts_a, ts_b, max_dt: float = 0.02):
    """Match two timestamp lists greedily (TUM associate.py semantics)."""
    ts_a = np.asarray(ts_a)
    ts_b = np.asarray(ts_b)
    ia, ib = [], []
    used = np.zeros(len(ts_b), dtype=bool)
    for i, t in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - t)))
        if not used[j] and abs(ts_b[j] - t) <= max_dt:
            ia.append(i)
            ib.append(j)
            used[j] = True
    return np.asarray(ia), np.asarray(ib)


def evaluate_trajectory_files(est_path: str, gt_path: str,
                              max_dt: float = 0.02,
                              with_scale: bool = False) -> Optional[float]:
    from planarslam_tpu.io.tum import read_trajectory_tum

    ts_e, Te = read_trajectory_tum(est_path)
    ts_g, Tg = read_trajectory_tum(gt_path)
    ia, ib = associate_by_time(ts_e, ts_g, max_dt)
    if len(ia) < 3:
        return None
    return ate_rmse(Te[ia, :3, 3], Tg[ib, :3, 3], with_scale)
