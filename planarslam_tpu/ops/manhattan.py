"""Manhattan-frame rotation tracking.

TPU rebuild of the reference's `Tracking::TrackManhattanFrame`
(`src/Tracking.cc:963-1137`) with `ProjectSN2MF` (`:763`) / `ProjectSN2Conic`
(`:888`) and `MeanShift` (`:1139-1157`): surface normals are rotated into the
current Manhattan-frame estimate, classified into cones around the three
axes (cone half-angle sin = 0.2018 for tracking, reference `:919`), each
axis direction is refined by mean-shift on its tangent plane with the
Gaussian kernel exp(-20 ||x||^2) (`:1148`), a missing third axis is
completed by cross product (`:1081-1120`), and the result is
re-orthonormalized by SVD (`:1123-1128`). Per-frame vanishing directions of
detected lines can be appended to the normal set exactly as the reference
mixes line directions into the classification.

Everything is a fixed-shape jitted tensor program over the padded normal
budget; no data-dependent branching.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from planarslam_tpu.config import ManhattanConfig
from planarslam_tpu.geometry import se3


class ManhattanResult(NamedTuple):
    R_cm: jnp.ndarray        # (3, 3) camera-from-Manhattan rotation
    axis_support: jnp.ndarray  # (3,) int32 normals voting per axis
    n_axes: jnp.ndarray      # () int32 number of well-supported axes
    success: jnp.ndarray     # () bool — at least 2 axes found


@partial(jax.jit, static_argnames=("iters", "ms_iters"))
def track_manhattan_frame(
    R_cm_init: jnp.ndarray,   # (3, 3) previous camera-from-Manhattan estimate
    normals: jnp.ndarray,     # (N, 3) unit surface normals (camera frame)
    valid: jnp.ndarray,       # (N,) bool
    cone_sin: float = 0.2018,
    kernel: float = 20.0,
    min_support: int = 20,
    iters: int = 3,
    ms_iters: int = 4,
) -> ManhattanResult:
    """Refine the Manhattan rotation from one frame's surface normals."""
    cos_half = jnp.sqrt(1.0 - cone_sin * cone_sin)

    def one_round(R_cm, _):
        # normals in MF coordinates
        n_m = normals @ R_cm  # (N, 3): R_cm^T n_c ... row i = n_c . columns
        # NB: columns of R_cm are the MF axes in camera frame, so
        # n_m[:, k] = <n_c, axis_k>.
        dots = n_m  # (N, 3)
        sign = jnp.where(dots >= 0, 1.0, -1.0)
        absdot = jnp.abs(dots)
        best_axis = jnp.argmax(absdot, axis=-1)  # (N,)
        best_val = jnp.max(absdot, axis=-1)
        member = (best_val > cos_half) & valid  # (N,)

        axes_new = []
        support = []
        for k in range(3):
            i, j = (k + 1) % 3, (k + 2) % 3
            mk = member & (best_axis == k)
            s = sign[:, k]
            # signed normals into the +axis hemisphere, tangent coords
            denom = jnp.maximum(absdot[:, k], 1e-6)
            u = s * n_m[:, i] / denom
            v = s * n_m[:, j] / denom
            uv = jnp.stack([u, v], axis=-1)
            w_mask = mk.astype(jnp.float32)

            def ms_step(center, _):
                d2 = jnp.sum((uv - center) ** 2, axis=-1)
                w = jnp.exp(-kernel * d2) * w_mask
                wsum = jnp.maximum(jnp.sum(w), 1e-9)
                return jnp.sum(w[:, None] * uv, axis=0) / wsum, None

            center0 = jnp.zeros((2,), normals.dtype)
            center, _ = jax.lax.scan(ms_step, center0, None, length=ms_iters)
            # tangent point -> unit direction in MF coords
            dir_m = jnp.zeros((3,), normals.dtype)
            dir_m = dir_m.at[i].set(center[0]).at[j].set(center[1]).at[k].set(1.0)
            dir_m = dir_m / jnp.linalg.norm(dir_m)
            axes_new.append(R_cm @ dir_m)  # camera frame
            support.append(jnp.sum(mk.astype(jnp.int32)))

        axes_c = jnp.stack(axes_new, axis=-1)  # (3, 3) columns = axes
        supp = jnp.stack(support)
        found = supp >= min_support
        n_found = jnp.sum(found.astype(jnp.int32))

        # keep the previous column where unsupported; complete a single
        # missing axis with the cross product of the other two
        prev = R_cm
        cols = jnp.where(found[None, :], axes_c, prev)
        crosses = jnp.stack([
            jnp.cross(cols[:, 1], cols[:, 2]),
            jnp.cross(cols[:, 2], cols[:, 0]),
            jnp.cross(cols[:, 0], cols[:, 1]),
        ], axis=-1)
        # fix cross sign toward previous estimate
        sgn = jnp.where(jnp.sum(crosses * prev, axis=0) >= 0, 1.0, -1.0)
        crosses = crosses * sgn[None, :]
        use_cross = (~found) & (n_found == 2)
        cols = jnp.where(use_cross[None, :], crosses, cols)

        R_new = se3.orthonormalize(cols)
        ok = n_found >= 2
        R_out = jnp.where(ok, R_new, R_cm)
        return R_out, (supp, n_found, ok)

    R, (supp, n_found, ok) = jax.lax.scan(one_round, R_cm_init, None,
                                          length=iters)
    return ManhattanResult(R_cm=R, axis_support=supp[-1], n_axes=n_found[-1],
                           success=ok[-1])


@jax.jit
def seed_from_plane_normals(normals: jnp.ndarray, counts: jnp.ndarray,
                            valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Initial Manhattan frame from detected plane normals (the role of
    `Map::FindManhattan`, `src/Map.cc:160-364`: seed from perpendicular plane
    pairs). Returns (R_cm (3,3), ok ()).

    Picks the best-supported plane as axis 1, the most-perpendicular
    well-supported plane as axis 2, cross-completes axis 3. Jitted: eager
    ops flip the axon runtime into sync mode.
    """
    normals = jnp.asarray(normals)
    w = jnp.where(valid, counts.astype(jnp.float32), 0.0)
    i0 = jnp.argmax(w)
    a0 = normals[i0]
    perp = jnp.abs(normals @ a0)
    score = jnp.where(valid & (perp < 0.2), w, -1.0)
    i1 = jnp.argmax(score)
    ok = score[i1] > 0
    a1 = normals[i1]
    a1 = a1 - jnp.sum(a1 * a0) * a0
    a1 = a1 / jnp.maximum(jnp.linalg.norm(a1), 1e-9)
    a2 = jnp.cross(a0, a1)
    R = jnp.stack([a0, a1, a2], axis=-1)
    R = se3.orthonormalize(R)
    return R, ok
