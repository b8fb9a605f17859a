"""Line-segment detection, band descriptors, and 3D line lifting.

TPU-first redesign of the least-TPU-shaped subsystem in the reference
(SURVEY.md §7 hard part #3). The reference uses OpenCV LSD region growing +
LBD binary descriptors (`src/LSDextractor.cpp:12-40`) and a sequential
Mahalanobis RANSAC per line for 3D lifting (`src/LineExtractor.cpp:1265`).
Here:

  - detection is a gradient-aligned Hough transform: oriented edge pixels
    (Sobel + NMS) vote into (theta, rho) bins restricted to their own
    orientation; top-K peaks become candidate lines; endpoints come from the
    extent of supporting pixels along the line (dense scatter/segment ops,
    static shapes). Same output contract as the reference: up to
    `keep_top` strongest segments with normalized 2D line equations
    (`LSDextractor.cpp:18-39`).
  - descriptors are LBD-style band statistics (mean/std of parallel and
    perpendicular gradient components over bands beside the line), float
    vectors compared with dot products (MXU) instead of binary LBD.
  - 3D lifting samples `n_depth_samples` depths along each segment
    (`Frame::isLineGood` samples <=50, `src/Frame.cc:189-267`), runs a
    fixed-size vmapped 2-point RANSAC under a depth-noise-scaled distance
    (the Mahalanobis gate of `extract3dline_mahdist`), refits inliers by
    PCA, and verifies support like `verify3dLine` (`LineExtractor.cpp:1361`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.config import CameraConfig, LineConfig
from planarslam_tpu.ops import image as image_ops
from planarslam_tpu.ops.eig3 import eigh_sym3x3


class LineFeatures(NamedTuple):
    uv_s: jnp.ndarray    # (L, 2) 2D start endpoint
    uv_e: jnp.ndarray    # (L, 2) 2D end endpoint
    line2d: jnp.ndarray  # (L, 3) normalized line equation (a,b,c), a^2+b^2=1
    angle: jnp.ndarray   # (L,) segment direction angle in [0, pi)
    response: jnp.ndarray  # (L,) accumulated gradient support
    desc: jnp.ndarray    # (L, D) float band descriptor (L2-normalized)
    p3d_s: jnp.ndarray   # (L, 3) camera-frame 3D start (0 if none)
    p3d_e: jnp.ndarray   # (L, 3) camera-frame 3D end
    has_3d: jnp.ndarray  # (L,) bool
    valid: jnp.ndarray   # (L,) bool


N_THETA = 36  # orientation bins over [0, pi)
S_BINS = 96   # position-histogram bins along a line


def detect_lines(gray: jnp.ndarray, cfg: LineConfig,
                 grad_threshold: float = 40.0) -> Tuple[jnp.ndarray, ...]:
    """Gradient-aligned Hough line detection.

    Returns (uv_s, uv_e, line2d, angle, response, valid) with capacity
    cfg.max_lines.
    """
    h, w = gray.shape
    L = cfg.max_lines
    diag = math.hypot(h, w)
    rho_res = 2.0
    n_rho = 2 * int(diag / rho_res) + 3  # signed rho in [-diag, diag]

    gx, gy = image_ops.sobel_gradients(image_ops.blur(gray, 5, 1.0))
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)

    # NMS along gradient direction (quantized to 4 directions)
    ang_g = jnp.arctan2(gy, gx)  # gradient direction
    q = jnp.mod(jnp.round(ang_g / (jnp.pi / 4)).astype(jnp.int32), 4)
    shifts = [(0, 1), (1, 1), (1, 0), (1, -1)]  # (dy, dx) per quadrant

    def sh(a, dy, dx):
        return jnp.roll(jnp.roll(a, -dy, axis=0), -dx, axis=1)

    nms_keep = jnp.zeros_like(mag, dtype=bool)
    for k, (dy, dx) in enumerate(shifts):
        fwd = sh(mag, dy, dx)
        bwd = sh(mag, -dy, -dx)
        nms_keep = nms_keep | ((q == k) & (mag >= fwd) & (mag >= bwd))
    edge = nms_keep & (mag > grad_threshold)

    # line orientation = gradient orientation + 90deg, folded to [0, pi)
    theta = jnp.mod(ang_g + jnp.pi / 2.0, jnp.pi)  # (H, W)
    t_bin = jnp.clip((theta * N_THETA / jnp.pi).astype(jnp.int32), 0, N_THETA - 1)

    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # rho for the line *through the pixel* with normal = gradient direction:
    # normal n = (cos a, sin a) with a = theta + pi/2 -> use gradient angle
    n_ang = theta + jnp.pi / 2.0  # normal angle in [pi/2, 3pi/2)
    ca, sa = jnp.cos(n_ang), jnp.sin(n_ang)
    rho = uu * ca + vv * sa  # signed distance; consistent across gradient
    # polarity because theta is already folded to [0, pi)
    r_bin = jnp.clip(((rho + diag) / rho_res).astype(jnp.int32), 0, n_rho - 1)

    # --- restrict all per-line work to the strongest E edge pixels --------
    # The dense (L, H*W) formulation moves hundreds of MB per frame; the
    # top-E restriction keeps every array at (L, E) (HBM-bandwidth fix).
    # approx_max_k, not lax.top_k: top_k lowers to a FULL ~300K-element
    # sort on TPU (several ms); the TPU-native partial-reduce top-k is
    # near-linear, and a 5% recall shortfall among near-equal edge
    # magnitudes is immaterial to Hough voting (CPU lowers it exactly).
    E = min(6144, h * w)
    edge_score = jnp.where(edge, mag, 0.0).reshape(-1)
    top_mag, top_pix = jax.lax.approx_max_k(edge_score, E,
                                            recall_target=0.95)
    flat_edge = top_mag > 0.0
    flat_t = t_bin.reshape(-1)[top_pix]
    flat_r = rho.reshape(-1)[top_pix]
    flat_u = uu.reshape(-1)[top_pix]
    flat_v = vv.reshape(-1)[top_pix]
    flat_mag = top_mag

    bin_id = flat_t * n_rho + jnp.clip(
        ((flat_r + diag) / rho_res).astype(jnp.int32), 0, n_rho - 1)
    hough = jax.ops.segment_sum(jnp.where(flat_edge, flat_mag, 0.0), bin_id,
                                num_segments=N_THETA * n_rho)
    hough2d = hough.reshape(N_THETA, n_rho)
    # peak NMS over the hough grid (wrap theta via concatenation)
    hp = jnp.concatenate([hough2d[-1:], hough2d, hough2d[:1]], axis=0)
    local_max = jax.lax.reduce_window(hp, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                      "SAME")[1:-1]
    is_peak = hough2d >= local_max
    peak_score = jnp.where(is_peak, hough2d, 0.0).reshape(-1)
    top_val, top_idx = jax.lax.top_k(peak_score, L)
    pk_t = top_idx // n_rho
    pk_r = top_idx % n_rho

    theta_l = (pk_t.astype(jnp.float32) + 0.5) * jnp.pi / N_THETA
    rho_l = (pk_r.astype(jnp.float32) + 0.5) * rho_res - diag

    # supporting pixels: same orientation bin (±1, wrap) & rho within 1 bin
    dt = jnp.abs(flat_t[None, :] - pk_t[:, None])
    dt = jnp.minimum(dt, N_THETA - dt)
    support = (flat_edge[None, :] & (dt <= 1)
               & (jnp.abs(flat_r[None, :] - rho_l[:, None]) < 1.5 * rho_res))

    # longitudinal coordinate along each candidate line
    dirx, diry = -jnp.sin(theta_l + jnp.pi / 2), jnp.cos(theta_l + jnp.pi / 2)
    # direction vector of the line (perpendicular to normal (cos, sin)(n_ang))
    s_coord = (flat_u[None, :] * dirx[:, None] + flat_v[None, :] * diry[:, None])
    s_min_all = -diag
    s_norm = (s_coord + diag) / (2 * diag)  # [0, 1)
    s_bin = jnp.clip((s_norm * S_BINS).astype(jnp.int32), 0, S_BINS - 1)

    # per-line position histogram via segment_sum on (line, s_bin)
    lin_ids = jnp.arange(L, dtype=jnp.int32)[:, None]
    seg_id = (lin_ids * S_BINS + s_bin).reshape(-1)
    seg_w = jnp.where(support, flat_mag[None, :], 0.0).reshape(-1)
    hist = jax.ops.segment_sum(seg_w, seg_id, num_segments=L * S_BINS)
    hist = hist.reshape(L, S_BINS)

    # longest contiguous run of occupied bins; close gaps of <= 2 bins so
    # segments crossed by other lines (locally corrupted gradients) survive
    occupied = hist > (grad_threshold * 1.0)  # at least ~1 strong pixel/bin
    left_near = (jnp.roll(occupied, 1, axis=1) | jnp.roll(occupied, 2, axis=1))
    right_near = (jnp.roll(occupied, -1, axis=1) | jnp.roll(occupied, -2, axis=1))
    occupied = occupied | (left_near & right_near)

    # longest contiguous run via cumulative max (log-depth, replaces a
    # 96-step lax.scan that cost ~4 ms of pure sequential-step latency):
    # run_len[i] = i - (last index j <= i with occ[j] == 0)
    idx_row = jnp.arange(S_BINS, dtype=jnp.int32)[None, :]
    last_zero = jax.lax.cummax(
        jnp.where(occupied, jnp.int32(-1), idx_row), axis=1)
    run_len_at = jnp.where(occupied, idx_row - last_zero, 0)  # (L, S_BINS)
    run_len = run_len_at.max(axis=1)
    run_end = jnp.argmax(run_len_at, axis=1).astype(jnp.int32)
    run_start = run_end - run_len + 1

    # exact endpoints: min/max of s among supporters inside the run bins
    in_run = (s_bin >= run_start[:, None]) & (s_bin <= run_end[:, None]) & support
    s_lo = jnp.where(in_run, s_coord, jnp.inf).min(axis=1)
    s_hi = jnp.where(in_run, s_coord, -jnp.inf).max(axis=1)
    resp = jnp.where(in_run, flat_mag[None, :], 0.0).sum(axis=1)

    # foot of the line: rho * normal
    nx, ny = jnp.cos(theta_l + jnp.pi / 2), jnp.sin(theta_l + jnp.pi / 2)
    foot = jnp.stack([rho_l * nx, rho_l * ny], axis=-1)
    dvec = jnp.stack([dirx, diry], axis=-1)
    uv_s = foot + s_lo[:, None] * dvec
    uv_e = foot + s_hi[:, None] * dvec

    length = s_hi - s_lo
    valid = ((top_val > 0) & (length >= cfg.min_length_px)
             & jnp.isfinite(s_lo) & jnp.isfinite(s_hi))

    # rank by response, keep top cfg.keep_top
    order_score = jnp.where(valid, resp, -1.0)
    keep_val, keep_idx = jax.lax.top_k(order_score, L)
    keep_mask = keep_val > 0
    if cfg.keep_top < L:
        keep_mask = keep_mask & (jnp.arange(L) < cfg.keep_top)

    uv_s = uv_s[keep_idx]
    uv_e = uv_e[keep_idx]
    resp = resp[keep_idx]
    theta_out = jnp.mod(theta_l[keep_idx], jnp.pi)
    valid = keep_mask

    # normalized 2D line equation through the endpoints (reference
    # `LSDextractor.cpp:30-39`: cross product of homogeneous endpoints)
    p1 = jnp.concatenate([uv_s, jnp.ones((L, 1))], axis=-1)
    p2 = jnp.concatenate([uv_e, jnp.ones((L, 1))], axis=-1)
    l_eq = jnp.cross(p1, p2)
    norm = jnp.sqrt(l_eq[:, 0] ** 2 + l_eq[:, 1] ** 2 + 1e-12)
    l_eq = l_eq / norm[:, None]

    return uv_s, uv_e, l_eq, theta_out, resp, valid


N_BANDS = 9
BAND_WIDTH = 2.0  # pixels between band center lines
N_SAMPLES_DESC = 24


def line_descriptors(gray: jnp.ndarray, uv_s: jnp.ndarray, uv_e: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """LBD-style band descriptor: per band, mean and std of the gradient
    components parallel/perpendicular to the line, stacked over N_BANDS
    bands and L2-normalized. (L, N_BANDS * 8) float32."""
    gx, gy = image_ops.sobel_gradients(image_ops.blur(gray, 5, 1.0))
    L = uv_s.shape[0]
    d = uv_e - uv_s
    length = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-9)
    t = d / length[:, None]                       # line direction
    n = jnp.stack([-t[:, 1], t[:, 0]], axis=-1)   # line normal

    alphas = jnp.linspace(0.05, 0.95, N_SAMPLES_DESC)
    band_off = (jnp.arange(N_BANDS) - (N_BANDS - 1) / 2.0) * BAND_WIDTH

    # sample positions (L, N_BANDS, S, 2)
    centers = (uv_s[:, None, None, :]
               + alphas[None, None, :, None] * d[:, None, None, :]
               + band_off[None, :, None, None] * n[:, None, None, :])
    sx = image_ops.bilinear_sample(gx, centers)
    sy = image_ops.bilinear_sample(gy, centers)
    g_par = sx * t[:, None, None, 0] + sy * t[:, None, None, 1]
    g_per = sx * n[:, None, None, 0] + sy * n[:, None, None, 1]

    feats = []
    for g in (g_par, g_per):
        pos = jnp.maximum(g, 0.0)
        neg = jnp.maximum(-g, 0.0)
        for comp in (pos, neg):
            feats.append(comp.mean(axis=-1))
            feats.append(comp.std(axis=-1))
    desc = jnp.concatenate(feats, axis=-1)  # (L, N_BANDS * 8)
    desc = desc / jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-9)
    return desc * valid[:, None]


def lift_lines_3d(depth: jnp.ndarray, cam: CameraConfig, cfg: LineConfig,
                  uv_s: jnp.ndarray, uv_e: jnp.ndarray, valid: jnp.ndarray,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample depths along each 2D segment and robustly fit a 3D line.

    Returns (p3d_s (L,3), p3d_e (L,3), has_3d (L,)).
    """
    L = uv_s.shape[0]
    S = cfg.n_depth_samples
    alphas = jnp.linspace(0.02, 0.98, S)
    pts2d = uv_s[:, None, :] + alphas[None, :, None] * (uv_e - uv_s)[:, None, :]
    z = image_ops.nearest_sample(depth, pts2d)  # (L, S)
    z_ok = z > 1e-6
    x = (pts2d[..., 0] - cam.cx) / cam.fx * z
    y = (pts2d[..., 1] - cam.cy) / cam.fy * z
    p3 = jnp.stack([x, y, z], axis=-1)  # (L, S, 3)

    # depth noise model sigma(z) (reference depthStdDev,
    # `LineExtractor.cpp:1182`)
    sigma = (cfg.depth_c1 * z * z + cfg.depth_c2 * z + cfg.depth_c3)
    sigma = jnp.clip(sigma, 2e-3, None)

    # fixed random 2-point hypotheses (static pattern; deterministic)
    rng = np.random.default_rng(99)
    hyp = rng.integers(0, S, (cfg.ransac_iters, 2))
    hyp[:, 1] = (hyp[:, 0] + 1 + rng.integers(0, S - 1, cfg.ransac_iters)) % S
    hyp = jnp.asarray(hyp, dtype=jnp.int32)

    a = p3[:, hyp[:, 0], :]  # (L, R, 3)
    b = p3[:, hyp[:, 1], :]
    dvec = b - a
    dlen = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1, keepdims=True) + 1e-12)
    dunit = dvec / dlen
    hyp_ok = ((jnp.take_along_axis(z_ok, hyp[None, :, 0], axis=1))
              & (jnp.take_along_axis(z_ok, hyp[None, :, 1], axis=1))
              & (dlen[..., 0] > 0.02))

    # point-line distances (L, R, S)
    rel = p3[:, None, :, :] - a[:, :, None, :]
    proj = jnp.sum(rel * dunit[:, :, None, :], axis=-1, keepdims=True)
    perp = rel - proj * dunit[:, :, None, :]
    dist = jnp.sqrt(jnp.sum(perp * perp, axis=-1) + 1e-18)
    gate = 1.5 * sigma[:, None, :] + 0.01  # Mahalanobis-style, depth-scaled
    inl = (dist < gate) & z_ok[:, None, :]
    n_inl = jnp.sum(inl, axis=-1) * hyp_ok  # (L, R)
    best_h = jnp.argmax(n_inl, axis=-1)  # (L,)
    best_inl = jnp.take_along_axis(inl, best_h[:, None, None], axis=1)[:, 0]  # (L,S)
    best_n = jnp.take_along_axis(n_inl, best_h[:, None], axis=1)[:, 0]

    # PCA refit over inliers
    wgt = best_inl.astype(jnp.float32)
    wsum = jnp.maximum(wgt.sum(axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(p3 * wgt[..., None], axis=1) / wsum
    cen = (p3 - mean[:, None, :]) * wgt[..., None]
    cov = jnp.einsum("lsi,lsj->lij", cen, (p3 - mean[:, None, :]) * wgt[..., None])
    cov = cov / wsum[..., None] + 1e-12 * jnp.eye(3)
    evals, evecs = eigh_sym3x3(cov)
    dir3 = evecs[..., :, 2]  # largest eigenvector = line direction

    s_par = jnp.sum((p3 - mean[:, None, :]) * dir3[:, None, :], axis=-1)
    s_lo = jnp.where(best_inl, s_par, jnp.inf).min(axis=-1)
    s_hi = jnp.where(best_inl, s_par, -jnp.inf).max(axis=-1)
    p_s = mean + s_lo[:, None] * dir3
    p_e = mean + s_hi[:, None] * dir3

    # verify3dLine-style support requirement: >= 60% of samples are inliers
    has = (valid & (best_n >= jnp.int32(0.6 * S))
           & jnp.isfinite(s_lo) & jnp.isfinite(s_hi)
           & ((s_hi - s_lo) > 0.05))
    zero = jnp.zeros_like(p_s)
    return (jnp.where(has[:, None], p_s, zero),
            jnp.where(has[:, None], p_e, zero), has)


def extract_line_features(gray: jnp.ndarray, depth: jnp.ndarray,
                          cam: CameraConfig, cfg: LineConfig) -> LineFeatures:
    """Full line front end for one frame."""
    uv_s, uv_e, l_eq, angle, resp, valid = detect_lines(gray, cfg)
    desc = line_descriptors(gray, uv_s, uv_e, valid)
    p3s, p3e, has3d = lift_lines_3d(depth, cam, cfg, uv_s, uv_e, valid)
    return LineFeatures(uv_s=uv_s, uv_e=uv_e, line2d=l_eq, angle=angle,
                        response=resp, desc=desc, p3d_s=p3s, p3d_e=p3e,
                        has_3d=has3d, valid=valid)


def _adaptive_sim_gate(best: jnp.ndarray, cand: jnp.ndarray,
                       min_sim: float, floor: float,
                       lam: float = 1.0) -> jnp.ndarray:
    """Per-frame MAD-adaptive acceptance threshold on best-match
    similarities (the reference derives its line acceptance thresholds
    from the frame's own match-distance median/MAD, `src/Frame.cc:269-293`
    lineDescriptorMAD with the 1.4826 normal-consistency factor,
    consumed in `src/LSDmatcher.cpp:224-233,256-259`).

    A fixed similarity constant is calibrated to one texture statistic;
    when global image statistics shift (contrast compression, blur,
    sensor gain), every similarity moves together and a fixed gate
    starves. The adaptive gate accepts sims within lam*1.4826*MAD below
    the candidate median — scale-free in descriptor-distance units —
    clamped to [floor, min_sim]: it may RELAX below the fixed gate when
    statistics shift down (never below `floor`), and never tightens
    above the calibrated `min_sim`.

    Relaxation must be EARNED: in a frame with no true correspondences
    (scene cut, occlusion, low overlap) the best-sims also cluster low
    with small dispersion, and a gate that blindly follows the median
    would wave ~floor-sim noise into pose optimization. The statistics
    are only trusted when >= 6 candidates already clear a quality bar
    halfway between floor and the calibrated gate — a population of
    genuinely decent matches whose level shifted, not a wall of noise.
    Otherwise the fixed `min_sim` gate applies."""
    bn = jnp.where(cand, best, jnp.nan)
    med = jnp.nanmedian(bn)
    mad = 1.4826 * jnp.nanmedian(jnp.abs(bn - med))
    th_adapt = jnp.clip(med - lam * mad, floor, min_sim)
    quality_bar = 0.5 * (floor + min_sim)
    earned = jnp.sum((cand & (best >= quality_bar)).astype(jnp.int32)) >= 6
    th = jnp.where(earned & jnp.isfinite(th_adapt), th_adapt, min_sim)
    return best > th


@partial(jax.jit, static_argnames=("max_angle", "ratio", "min_sim",
                                   "sim_floor"))
def match_lines(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                angle_a: jnp.ndarray, angle_b: jnp.ndarray,
                max_angle: float = 0.26, ratio: float = 0.85,
                min_sim: float = 0.75, sim_floor: float = 0.45):
    """Mutual nearest-neighbor line matching on band descriptors with an
    orientation gate (the LSDmatcher knn + MAD-threshold role,
    `src/LSDmatcher.cpp:242-334`). The absolute similarity gate adapts
    per frame to the match-sim median/MAD (see _adaptive_sim_gate).
    Returns (idx (A,), sim (A,))."""
    sim = desc_a @ desc_b.T  # (A, B) cosine similarity (descs normalized)
    da = jnp.abs(angle_a[:, None] - angle_b[None, :])
    da = jnp.minimum(da, jnp.pi - da)
    gate = valid_a[:, None] & valid_b[None, :] & (da < max_angle)
    sim = jnp.where(gate, sim, -1.0)
    top2, top2_idx = jax.lax.top_k(sim, 2)
    best, second = top2[:, 0], top2[:, 1]
    best_idx = top2_idx[:, 0]
    cand = best > -0.5  # passed the validity/orientation gates at all
    ok = _adaptive_sim_gate(best, cand, min_sim, sim_floor) \
        & ((1 - best) < ratio * (1 - second) + 1e-9)
    back = jnp.argmax(sim, axis=0)
    ok = ok & (back[best_idx] == jnp.arange(sim.shape[0]))
    return jnp.where(ok, best_idx, -1).astype(jnp.int32), best


@partial(jax.jit,
         static_argnames=("K", "image_wh", "radius", "max_angle", "min_sim",
                          "sim_floor"))
def search_lines_by_projection(
        sw_w: jnp.ndarray,      # (M, 3) map line start endpoints (world)
        ew_w: jnp.ndarray,      # (M, 3) map line end endpoints (world)
        desc_m: jnp.ndarray,    # (M, D) map line descriptors
        valid_m: jnp.ndarray,   # (M,) bool
        T_cw: jnp.ndarray,      # (4, 4) world -> camera
        f_uv_s: jnp.ndarray,    # (L, 2) frame segment starts
        f_uv_e: jnp.ndarray,    # (L, 2) frame segment ends
        f_angle: jnp.ndarray,   # (L,)
        f_desc: jnp.ndarray,    # (L, D)
        f_valid: jnp.ndarray,   # (L,) bool
        K: Tuple[float, float, float, float],
        image_wh: Tuple[float, float],
        radius: float = 12.0,
        max_angle: float = 0.26,
        min_sim: float = 0.7,
        sim_floor: float = 0.45,
        ):
    """Guided line matching by projection — `LSDmatcher::SearchByProjection`
    (`src/LSDmatcher.cpp:20,141`): project each map line's endpoints through
    the predicted pose, gate detected segments on (a) endpoint distance to
    the projected INFINITE line, (b) segment overlap along the projected
    extent, (c) direction angle, (d) descriptor similarity; best match per
    map line, duplicates resolved per frame line by similarity.

    Dense (M, L) scoring — no per-line loops; one XLA program.
    Returns (idx (M,) frame-line index or -1, sim (M,)).
    """
    fx, fy, cx, cy = K
    W, H = image_wh
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    ps = sw_w @ R.T + t
    pe = ew_w @ R.T + t
    zs, ze = ps[:, 2], pe[:, 2]
    in_front = (zs > 0.05) & (ze > 0.05)
    us = fx * ps[:, 0] / jnp.maximum(zs, 1e-6) + cx
    vs = fy * ps[:, 1] / jnp.maximum(zs, 1e-6) + cy
    ue = fx * pe[:, 0] / jnp.maximum(ze, 1e-6) + cx
    ve = fy * pe[:, 1] / jnp.maximum(ze, 1e-6) + cy
    # at least one endpoint on-screen (partial visibility allowed, like the
    # reference's fragment handling)
    on_s = (us >= 0) & (us < W) & (vs >= 0) & (vs < H)
    on_e = (ue >= 0) & (ue < W) & (ve >= 0) & (ve < H)
    vis = valid_m & in_front & (on_s | on_e)

    # projected infinite line (a, b, c) through the two projected endpoints
    dx, dy = ue - us, ve - vs
    nrm = jnp.sqrt(dx * dx + dy * dy) + 1e-9
    a = -dy / nrm
    b = dx / nrm
    c = -(a * us + b * vs)
    ang_p = jnp.mod(jnp.arctan2(dy, dx), jnp.pi)

    # (M, L) gates
    def dist_to(uv):
        return jnp.abs(a[:, None] * uv[None, :, 0]
                       + b[:, None] * uv[None, :, 1] + c[:, None])

    d_s = dist_to(f_uv_s)
    d_e = dist_to(f_uv_e)
    close = (d_s < radius) & (d_e < radius)

    # overlap: frame midpoint's parameter along the projected segment
    mid = 0.5 * (f_uv_s + f_uv_e)
    rel_u = mid[None, :, 0] - us[:, None]
    rel_v = mid[None, :, 1] - vs[:, None]
    tpar = (rel_u * dx[:, None] + rel_v * dy[:, None]) / (nrm[:, None] ** 2)
    overlap = (tpar > -0.25) & (tpar < 1.25)

    da = jnp.abs(ang_p[:, None] - f_angle[None, :])
    da = jnp.minimum(da, jnp.pi - da)

    sim = desc_m @ f_desc.T
    gate = (vis[:, None] & f_valid[None, :] & close & overlap
            & (da < max_angle))
    sim = jnp.where(gate, sim, -1.0)
    best = jnp.argmax(sim, axis=1)
    best_sim = jnp.max(sim, axis=1)
    # per-frame MAD-adaptive similarity gate (see _adaptive_sim_gate):
    # tracks global texture-statistic shifts the fixed constant cannot
    ok = _adaptive_sim_gate(best_sim, best_sim > -0.5, min_sim, sim_floor)
    # duplicate resolution: a frame line keeps only its most-similar map line
    back = jnp.argmax(sim, axis=0)
    ok = ok & (back[best] == jnp.arange(sim.shape[0]))
    return jnp.where(ok, best, -1).astype(jnp.int32), best_sim
