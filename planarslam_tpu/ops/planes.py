"""Depth-based plane segmentation and surface normals.

TPU-first redesign of the reference's PEAC agglomerative-hierarchical
clustering (`include/peac/AHCPlaneFitter.hpp:86`: per-block plane fits
`initGraph:786`, min-MSE heap merge `ahCluster:983`, pixel refinement
`refineDetails:299`) and of the PCL integral-image surface normals
(`src/Frame.cc:694-752`):

  - per-block first/second-order moments -> closed-form 3x3 eigen plane fits
    (the Stats::compute / eig33sym path of `AHCPlaneSeg.hpp:51`) — dense
    batched tensor ops;
  - the inherently sequential min-heap merge becomes connected components
    over the "coplanar neighbor" block graph via min-label propagation with
    pointer jumping (log-depth, fixed rounds) — same plane recovery goal,
    compiler-friendly control flow (SURVEY.md §7 hard part #2);
  - per-label refit from aggregated moments, top-P selection by support,
    then one pixel-level refinement pass assigning pixels to their nearest
    plane (point-to-plane distance + normal agreement) and refitting from
    pixel moments via a one-hot matmul (MXU-shaped scatter).

Surface normals come from central differences of the back-projected point
map (cross products of tangents), oriented toward the camera.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from planarslam_tpu.config import CameraConfig, PlaneConfig
from planarslam_tpu.geometry import plane as plane_geo
from planarslam_tpu.ops.eig3 import eigh_sym3x3


class PlaneFeatures(NamedTuple):
    coeffs: jnp.ndarray     # (P, 4) camera-frame plane coeffs (unit n, d >= 0)
    centroid: jnp.ndarray   # (P, 3) camera-frame centroid of supporting pixels
    count: jnp.ndarray      # (P,) int32 supporting pixel count
    valid: jnp.ndarray      # (P,) bool
    pixel_label: jnp.ndarray  # (H, W) int32 plane id in [0, P) or -1


def backproject_depth(depth: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """(H, W) metres -> (H, W, 3) camera-frame points (z=0 where invalid)."""
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = (uu - cam.cx) / cam.fx * depth
    y = (vv - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def box_smooth_depth(depth: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """Edge-preserving depth smoothing for the plane/normal path.

    Stands in for the averaging the reference gets from PCL
    IntegralImageNormalEstimation (smoothing size 10, AVERAGE_3D_GRADIENT
    on a 3x-subsampled cloud, `src/Frame.cc:715-728`): under a realistic
    sensor noise model sigma(z) (`src/LineExtractor.cpp:1182`), raw 1-px
    central differences are noise-dominated. Box-averages valid depths but
    keeps the RAW value where the local mean deviates strongly — depth
    discontinuities must not bleed into slanted ghost surfaces. A box mean
    of a linear ramp equals its center value, so noise-free planes are
    unchanged away from edges."""
    if k <= 1:
        return depth
    valid = (depth > 1e-6).astype(depth.dtype)
    sums = jax.lax.reduce_window(depth * valid, 0.0, jax.lax.add,
                                 (k, k), (1, 1), "SAME")
    cnts = jax.lax.reduce_window(valid, 0.0, jax.lax.add,
                                 (k, k), (1, 1), "SAME")
    mu = sums / jnp.maximum(cnts, 1.0)
    keep = jnp.abs(depth - mu) < 0.03 * jnp.maximum(depth, 1.0)
    return jnp.where((valid > 0) & keep & (cnts > 0), mu, depth)


def surface_normals(points: jnp.ndarray, stride: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normals from the point map via central differences.

    Returns (normals (H', W', 3), valid (H', W')) on the subsampled grid.
    Replaces PCL IntegralImageNormalEstimation (AVERAGE_3D_GRADIENT) used at
    `src/Frame.cc:715-728`; normals oriented toward the camera.

    The difference baseline is b = min(stride, 3) pixels, decoupled from the
    sampling stride — the reference computes its normals on a 3x-subsampled
    cloud for the same reason (`src/Frame.cc:703`): under a realistic
    sigma(z) sensor noise model a 1-px baseline at full resolution is
    noise-dominated (tangent length z/f per px vs depth noise ~ c1 z^2),
    while a 3-px baseline amortizes the noise over a 3x-longer lever arm.
    The baseline is NOT widened to the full sampling stride: every sample
    whose difference span straddles a surface crease (room corner) blends
    two planes into a tilted normal, so a stride-sized span at stride 7-13
    erases small plane regions entirely (measured: wall-axis support 30->15
    samples with in-cone bias 2.7->10.7 deg on the 160x120 test scene).

    Two guards reject blended samples the magnitude gates cannot:
      - occlusion: a full-resolution 1-px jump scan over the difference
        footprint (slope-tolerant, occlusion-strict — a strided jump test
        would reject grazing planes);
      - crease (depth-continuous): forward- and backward-difference normals
        must agree within 45 deg; they disagree by ~90 deg across a corner
        but only mildly under sensor noise.
    """
    if stride <= 1:
        p = points
        z = p[..., 2]
        dx = 0.5 * (jnp.roll(p, -1, axis=1) - jnp.roll(p, 1, axis=1))
        dy = 0.5 * (jnp.roll(p, -1, axis=0) - jnp.roll(p, 1, axis=0))
        n = jnp.cross(dx, dy)
        norm = jnp.sqrt(jnp.sum(n * n, axis=-1) + 1e-18)
        n = n / norm[..., None]
        flip = jnp.sum(n * p, axis=-1) > 0
        n = jnp.where(flip[..., None], -n, n)
        zn = jnp.roll(z, -1, 1) * jnp.roll(z, 1, 1) \
            * jnp.roll(z, -1, 0) * jnp.roll(z, 1, 0)
        jump = jnp.maximum(
            jnp.abs(jnp.roll(z, -1, 1) - jnp.roll(z, 1, 1)),
            jnp.abs(jnp.roll(z, -1, 0) - jnp.roll(z, 1, 0)))
        valid = (z > 1e-6) & (zn > 1e-12) & (norm > 1e-9) \
            & (jump < 0.05 * jnp.maximum(z, 1.0))
        return n, valid

    b = min(stride, 3)
    z_full = points[..., 2]
    # full-res 1-px discontinuity scan over the difference footprint
    jump1 = jnp.maximum(
        jnp.abs(z_full - jnp.roll(z_full, -1, axis=1)),
        jnp.abs(z_full - jnp.roll(z_full, -1, axis=0)))
    span = 2 * b + 1
    jmax = jax.lax.reduce_window(jump1, -jnp.inf, jax.lax.max,
                                 (span, span), (1, 1), "SAME")
    off = stride // 2

    def sub(a):
        return a[off::stride, off::stride]

    p = sub(points)
    pxp = sub(jnp.roll(points, -b, axis=1))
    pxm = sub(jnp.roll(points, b, axis=1))
    pyp = sub(jnp.roll(points, -b, axis=0))
    pym = sub(jnp.roll(points, b, axis=0))
    disc_free = sub(jmax) < 0.05 * jnp.maximum(p[..., 2], 1.0)

    dx = 0.5 * (pxp - pxm)
    dy = 0.5 * (pyp - pym)
    n = jnp.cross(dx, dy)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1) + 1e-18)
    n = n / norm[..., None]
    # orient toward camera: n . p < 0
    flip = jnp.sum(n * p, axis=-1) > 0
    n = jnp.where(flip[..., None], -n, n)
    # crease guard: one-sided normals must agree (45 deg)
    n_f = jnp.cross(pxp - p, pyp - p)
    n_b = jnp.cross(p - pxm, p - pym)
    nf_n = jnp.sqrt(jnp.sum(n_f * n_f, -1) + 1e-18)
    nb_n = jnp.sqrt(jnp.sum(n_b * n_b, -1) + 1e-18)
    agree = jnp.sum(n_f * n_b, -1) / (nf_n * nb_n) > 0.7071
    zn = pxp[..., 2] * pxm[..., 2] * pyp[..., 2] * pym[..., 2]
    valid = (p[..., 2] > 1e-6) & (zn > 1e-12) & (norm > 1e-9) \
        & disc_free & agree
    # the wrapped jnp.roll reads are garbage on the subgrid border (at full
    # res the wrapped jump gate caught them; the disc scan cannot) — mask
    valid = valid.at[0, :].set(False).at[-1, :].set(False)
    valid = valid.at[:, 0].set(False).at[:, -1].set(False)
    return n, valid


class _BlockStats(NamedTuple):
    s1: jnp.ndarray     # (B, 3)  sum of points
    s2: jnp.ndarray     # (B, 3, 3) sum of outer products
    n: jnp.ndarray      # (B,) count of valid pixels


def _plane_from_moments(s1, s2, n):
    """Least-squares plane from moments (the eig33sym fit of
    `AHCPlaneSeg.hpp:125`): smallest-eigenvector of the scatter matrix.

    Returns (normal (...,3), d (...), mse (...), centroid (...,3)).
    """
    n_safe = jnp.maximum(n, 1.0)
    mean = s1 / n_safe[..., None]
    cov = s2 / n_safe[..., None, None] - mean[..., :, None] * mean[..., None, :]
    cov = cov + 1e-12 * jnp.eye(3)
    evals, evecs = eigh_sym3x3(cov)  # ascending (closed-form, see ops/eig3)
    normal = evecs[..., :, 0]
    mse = evals[..., 0]
    # orient toward camera (points have z > 0; camera at origin)
    flip = jnp.sum(normal * mean, axis=-1) > 0
    normal = jnp.where(flip[..., None], -normal, normal)
    d = -jnp.sum(normal * mean, axis=-1)
    return normal, d, mse, mean


def _block_moments(points: jnp.ndarray, valid: jnp.ndarray, block: int
                   ) -> _BlockStats:
    h, w, _ = points.shape
    hb, wb = h // block, w // block
    p = points[:hb * block, :wb * block].reshape(hb, block, wb, block, 3)
    v = valid[:hb * block, :wb * block].reshape(hb, block, wb, block)
    pv = p * v[..., None]
    s1 = pv.sum(axis=(1, 3)).reshape(-1, 3)
    s2 = jnp.einsum("abcdi,abcdj->aci j".replace(" ", ""), pv, p * v[..., None])
    s2 = s2.reshape(-1, 3, 3)
    n = v.sum(axis=(1, 3)).reshape(-1).astype(jnp.float32)
    return _BlockStats(s1, s2, n)


def extract_planes_debug(depth, cam, cfg, stop: str = "full"):
    """extract_planes truncated after a named stage (profiling only)."""
    return extract_planes(depth, cam, cfg, _stop=stop)


def extract_planes(depth: jnp.ndarray, cam: CameraConfig, cfg: PlaneConfig,
                   _stop: str = "full") -> PlaneFeatures:
    """Full plane segmentation for one frame (PEAC-equivalent)."""
    h, w = depth.shape
    block = cfg.block
    hb, wb = h // block, w // block
    n_blocks = hb * wb

    points = backproject_depth(depth, cam)
    depth_ok = (depth > 1e-6) & (depth < cfg.max_distance)

    # per-pixel depth-discontinuity rejection (PEAC depthDisContTol
    # semantics): forward neighbor jumps beyond a depth- and
    # resolution-scaled tolerance invalidate the pixel. A slanted plane has
    # smooth jumps; occlusion boundaries do not. Resolution scaling keeps
    # grazing planes valid on downsampled test frames.
    #
    # The tolerance is additionally floored at ~3 standard deviations of
    # the frame's OWN depth noise, estimated from the median absolute
    # SECOND difference (linear surface slope cancels in a second
    # difference, so the MAD is a pure noise statistic; /0.674/sqrt(6)
    # converts MAD-of-sum-of-3 to per-sample sigma, fitted as sigma(z) =
    # alpha z^2 — the Kinect model's leading term). On quantization-clean
    # depth alpha is sub-millimeter and the geometric 0.02 z term rules, so
    # behavior is unchanged; under real sensor noise the fixed gate
    # shredded plane interiors at random (measured on the reference's own
    # Kinect model at 640x480: 31% of pixels dropped, 8 of 4800 blocks
    # left valid, whole frames with zero planes).
    res_scale = 640.0 / w
    z2 = jnp.maximum(depth, 1.0) ** 2
    d2_r = jnp.abs(depth - 2 * jnp.roll(depth, -1, axis=1)
                   + jnp.roll(depth, -2, axis=1))
    interior = depth_ok & jnp.roll(depth_ok, -1, axis=1) \
        & jnp.roll(depth_ok, -2, axis=1)
    # median over a 4x4-strided subsample: the full-frame nanmedian is a
    # 307K-element SORT on TPU (several ms); ~19K samples estimate the same
    # noise statistic to well under the 3-sigma gate's tolerance
    sub_r = jnp.where(interior, d2_r / z2, jnp.nan)[::4, ::4]
    alpha = jnp.nanmedian(sub_r) / (0.674 * jnp.sqrt(6.0))
    alpha = jnp.nan_to_num(alpha, nan=0.0)
    tol = jnp.maximum(0.02 * res_scale * jnp.maximum(depth, 1.0),
                      3.0 * jnp.sqrt(2.0) * alpha * z2)
    jump_r = jnp.abs(depth - jnp.roll(depth, -1, axis=1))
    jump_d = jnp.abs(depth - jnp.roll(depth, -1, axis=0))
    jump_r = jump_r.at[:, -1].set(0.0)
    jump_d = jump_d.at[-1, :].set(0.0)
    smooth = (jump_r < tol) & (jump_d < tol)
    depth_ok = depth_ok & smooth

    stats = _block_moments(points, depth_ok, block)
    normal_b, d_b, mse_b, mean_b = _plane_from_moments(stats.s1, stats.s2, stats.n)

    # block validity: (near-)full depth coverage + low MSE (depth-dependent
    # threshold, AHCParamSet.hpp:87 semantics). Coverage tolerates a few
    # noise-gated pixels (the 3-sigma jump gate still drops ~0.6% at
    # random, and demanding all block^2 would veto ~1/3 of interior blocks
    # for sensor noise rather than geometry); the MSE gate owns quality.
    z_blk = mean_b[:, 2]
    full = stats.n >= (block * block - 4)
    mse_thresh = (cfg.block_mse_sigma * z_blk * z_blk + cfg.block_mse_tol) ** 2
    block_valid = full & (mse_b < mse_thresh) & (z_blk > 1e-6)
    if _stop == "blocks":
        return normal_b, d_b, mse_b, mean_b, block_valid

    # --- connected components over "coplanar neighbors" ----------------------
    angle_cos = jnp.cos(jnp.deg2rad(cfg.angle_threshold_deg * 2.0))

    def similar(i_flat, j_flat):
        ni, nj = normal_b[i_flat], normal_b[j_flat]
        cos = jnp.sum(ni * nj, axis=-1)
        dist = jnp.abs(jnp.sum(nj * mean_b[i_flat], axis=-1) + d_b[j_flat])
        return ((cos > angle_cos) & (dist < cfg.distance_threshold)
                & block_valid[i_flat] & block_valid[j_flat])

    ids = jnp.arange(n_blocks, dtype=jnp.int32)
    iy, ix = ids // wb, ids % wb
    nbr_right = jnp.where(ix + 1 < wb, ids + 1, ids)
    nbr_down = jnp.where(iy + 1 < hb, ids + wb, ids)
    edge_r = (similar(ids, nbr_right) & (nbr_right != ids)).reshape(hb, wb)
    edge_d = (similar(ids, nbr_down) & (nbr_down != ids)).reshape(hb, wb)
    # pulls from the left/up neighbor reuse the same edges, shifted (the
    # wrap row/column is masked: edge_r is False in the last column and
    # edge_d in the last row by construction)
    edge_l = jnp.roll(edge_r, 1, axis=1)
    edge_u = jnp.roll(edge_d, 1, axis=0)
    big = jnp.int32(n_blocks)

    def prop(labels, _):
        # symmetric 4-neighbor min pull on the 2D block grid — rolls, not
        # scatter-min: TPU lowers .at[].min to a serialized scatter (slow),
        # while rolls are pure vector shifts
        lab2 = labels.reshape(hb, wb)
        new = jnp.minimum(
            jnp.minimum(
                jnp.where(edge_r, jnp.roll(lab2, -1, axis=1), big),
                jnp.where(edge_l, jnp.roll(lab2, 1, axis=1), big)),
            jnp.minimum(
                jnp.where(edge_d, jnp.roll(lab2, -1, axis=0), big),
                jnp.where(edge_u, jnp.roll(lab2, 1, axis=0), big)))
        new = jnp.minimum(lab2, new).reshape(-1)
        new = new[new]  # pointer jumping (path halving)
        return new, None

    labels, _ = jax.lax.scan(prop, ids, None, length=cfg.merge_rounds)
    if _stop == "cc":
        return labels

    # --- per-component refit --------------------------------------------------
    seg = jnp.where(block_valid, labels, n_blocks)  # invalid -> overflow bin
    s1_seg = jax.ops.segment_sum(stats.s1 * block_valid[:, None], seg,
                                 num_segments=n_blocks + 1)
    s2_seg = jax.ops.segment_sum(stats.s2 * block_valid[:, None, None], seg,
                                 num_segments=n_blocks + 1)
    n_seg = jax.ops.segment_sum(stats.n * block_valid, seg,
                                num_segments=n_blocks + 1)
    n_seg = n_seg.at[n_blocks].set(0.0)

    # top-P components by pixel support
    p_cap = cfg.max_planes
    top_n, top_idx = jax.lax.top_k(n_seg[:n_blocks], p_cap)
    cand_valid = top_n >= jnp.float32(min(cfg.min_size, 3 * block * block))
    normal_c, d_c, mse_c, mean_c = _plane_from_moments(
        s1_seg[top_idx], s2_seg[top_idx], top_n)

    # dedup near-identical candidates (the reference's coplanar-merge culling
    # `src/LocalMapping.cc:239-276` at frame level): keep the larger one
    cos_ij = normal_c @ normal_c.T
    d_ij = jnp.abs(d_c[:, None] - d_c[None, :])
    dup = ((cos_ij > cfg.assoc_angle) & (d_ij < 2 * cfg.assoc_dist)
           & cand_valid[:, None] & cand_valid[None, :])
    shadowed = jnp.tril(dup, -1).any(axis=1)  # earlier index = larger support
    cand_valid = cand_valid & ~shadowed
    if _stop == "topk":
        return normal_c, d_c, mse_c, mean_c, cand_valid

    # --- pixel-level refinement ----------------------------------------------
    # assign each valid pixel to the nearest candidate plane. The band is
    # floored at 3 sigma of the self-calibrated noise model (alpha z^2,
    # estimated above): with a fixed distance_threshold band and sigma(z)
    # comparable to it, the band TRUNCATES the noise distribution
    # symmetrically around the CANDIDATE plane, so the refit inherits the
    # candidate's error instead of averaging noise away (measured: plane d
    # errors ~ sigma(z_mean) ~ 5 cm at 4 m instead of mse/sqrt(N)).
    # the assign/refit rounds run on a refine_stride-subsampled grid (the
    # (HW, P) distance matrix + one-hot refit dominate extract_planes at
    # 3.3-3.6 ms/round full-res on TPU; moments from HW/stride^2 samples
    # estimate the same plane parameters). Counts are scaled by stride^2 so
    # min_size and the host-facing support stay in full-res pixel units.
    rs = max(1, int(cfg.refine_stride))
    pts_sub = points[::rs, ::rs].reshape(-1, 3)
    band_sub = jnp.maximum(cfg.distance_threshold,
                           3.0 * alpha * z2[::rs, ::rs]).reshape(-1)
    ok_sub = depth_ok[::rs, ::rs].reshape(-1)
    area = jnp.float32(rs * rs)

    dist_pix = jnp.abs(pts_sub @ normal_c.T + d_c[None, :])  # (S, P)
    dist_pix = jnp.where(cand_valid[None, :], dist_pix, jnp.inf)
    best = jnp.argmin(dist_pix, axis=-1)
    best_dist = jnp.min(dist_pix, axis=-1)
    assigned = (best_dist < band_sub) & ok_sub
    label_sub = jnp.where(assigned, best, p_cap).astype(jnp.int32)

    # refit from pixel moments with a one-hot matmul (MXU)
    x, y, z = pts_sub[:, 0], pts_sub[:, 1], pts_sub[:, 2]
    feats = jnp.stack([x, y, z, x * x, x * y, x * z, y * y, y * z, z * z,
                       jnp.ones_like(x)], axis=-1)  # (S, 10)

    def refit(labels):
        one_hot = jax.nn.one_hot(labels, p_cap + 1, dtype=jnp.float32)
        agg = one_hot.T @ feats * area  # (P+1, 10), full-res pixel units
        s1_p = agg[:p_cap, :3]
        s2_p = jnp.stack([
            jnp.stack([agg[:p_cap, 3], agg[:p_cap, 4], agg[:p_cap, 5]], -1),
            jnp.stack([agg[:p_cap, 4], agg[:p_cap, 6], agg[:p_cap, 7]], -1),
            jnp.stack([agg[:p_cap, 5], agg[:p_cap, 7], agg[:p_cap, 8]], -1),
        ], axis=-2)
        n_p = agg[:p_cap, 9]
        return _plane_from_moments(s1_p, s2_p, n_p) + (n_p,)

    normal_f, d_f, mse_f, mean_f, n_p = refit(label_sub)
    if _stop == "assign":
        return normal_f, d_f, mse_f, mean_f, n_p

    # robust re-assign + re-gated refit (the role of PEAC's refineDetails,
    # `AHCPlaneFitter.hpp`): each round re-assigns every pixel to its
    # NEAREST refined plane and keeps it only within 2.5x that plane's own
    # fitted sigma (~p99 of an inlier Gaussian, self-scaling from
    # quantization-clean to noisy sensors; 1 mm floor against degenerate
    # all-identical fits), then refits from pixel moments. This both trims
    # the corner wedges the coarse band admits (they tilt normals under
    # sensor noise) and starves ghost candidates — tilted fits through a
    # noise slab lose their support to the honest plane they cross and die
    # at the final count/mse gate.
    cos25 = jnp.float32(0.9063)  # cos(25 deg)
    # tau also gates the final full-res labeling when refine_rounds == 0
    tau = jnp.maximum(2.5 * jnp.sqrt(jnp.maximum(mse_f, 0.0)), 1e-3)
    for _ in range(cfg.refine_rounds):
        # ghost merge: a candidate whose CENTROID lies inside a bigger
        # plane's noise band (and within 25 deg of its normal) is a slice
        # of that plane's noise cloud, not a surface — drop it so the next
        # re-assignment hands its pixels to the honest plane. Truly
        # distinct parallel surfaces (table over floor) keep centroids
        # well outside each other's bands and survive.
        alive = cand_valid & (n_p > 3)
        cosm = normal_f @ normal_f.T
        cen_d = jnp.abs(mean_f @ normal_f.T + d_f[None, :])  # [j, i]
        band_j = jnp.maximum(cfg.distance_threshold,
                             3.0 * alpha * jnp.maximum(mean_f[:, 2], 1.0)
                             ** 2)
        bigger = n_p[None, :] > n_p[:, None]                 # i bigger than j
        shadow = (alive[None, :] & alive[:, None] & bigger
                  & (cosm > cos25) & (cen_d < band_j[:, None]))
        alive = alive & ~shadow.any(axis=1)

        tau = jnp.maximum(2.5 * jnp.sqrt(jnp.maximum(mse_f, 0.0)), 1e-3)
        dist_r = jnp.abs(pts_sub @ normal_f.T + d_f[None, :])
        dist_r = jnp.where(alive[None, :], dist_r, jnp.inf)
        best_r = jnp.argmin(dist_r, axis=-1)
        best_rd = jnp.min(dist_r, axis=-1)
        keep = (best_rd < jnp.minimum(tau[best_r], band_sub)) & ok_sub
        label_sub = jnp.where(keep, best_r, p_cap).astype(jnp.int32)
        normal_f, d_f, mse_f, mean_f, n_p = refit(label_sub)
        cand_valid = cand_valid & alive

    count = n_p.astype(jnp.int32)
    # final quality gate, noise-scaled like the pixel band: an honest plane
    # at depth z has mse ~ (alpha z^2)^2 under the calibrated noise model
    mse_gate = jnp.maximum(cfg.distance_threshold,
                           2.0 * alpha * mean_f[:, 2] ** 2) ** 2
    valid = cand_valid & (count >= cfg.min_size) & (mse_f < mse_gate)
    coeffs = jnp.concatenate([normal_f, d_f[:, None]], axis=-1)
    coeffs = plane_geo.normalize(coeffs)
    coeffs = jnp.where(valid[:, None], coeffs, 0.0)

    # final FULL-resolution pixel labeling against the surviving refined
    # planes (the refine rounds ran on the subsampled grid; pixel_label is
    # a per-pixel product) — one (HW, P) distance pass, same tau/band gate
    # as the refine rounds
    if rs == 1:
        label_pix = label_sub
    else:
        pts_flat = points.reshape(-1, 3)
        band_pix = jnp.maximum(cfg.distance_threshold,
                               3.0 * alpha * z2).reshape(-1)
        dist_full = jnp.abs(pts_flat @ normal_f.T + d_f[None, :])
        dist_full = jnp.where(valid[None, :], dist_full, jnp.inf)
        best_f = jnp.argmin(dist_full, axis=-1)
        best_fd = jnp.min(dist_full, axis=-1)
        # tau from the POST-loop mse_f: the loop recomputes tau at iteration
        # top then refits at the bottom, so the loop-carried tau is one
        # refit stale relative to the final planes labeled against here
        tau_f = jnp.maximum(2.5 * jnp.sqrt(jnp.maximum(mse_f, 0.0)), 1e-3)
        keep_f = (best_fd < jnp.minimum(tau_f[best_f], band_pix)) \
            & depth_ok.reshape(-1)
        label_pix = jnp.where(keep_f, best_f, p_cap).astype(jnp.int32)

    pixel_label = jnp.where(
        (label_pix < p_cap) & valid[jnp.clip(label_pix, 0, p_cap - 1)],
        label_pix, -1).reshape(h, w)
    return PlaneFeatures(coeffs=coeffs, centroid=mean_f, count=count,
                         valid=valid, pixel_label=pixel_label)
