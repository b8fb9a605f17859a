"""Oriented BRIEF descriptors: intensity-centroid orientation + steered BRIEF.

TPU-native rebuild of the reference's rBRIEF stage (`src/ORBextractor.cc:77`
IC_Angle, `:108` computeOrbDescriptor): orientation from image moments over a
radius-15 circular patch, then 256 binary intensity comparisons at
orientation-steered offsets on the Gaussian-blurred level image, packed into
8 uint32 words.

The comparison-pair pattern is NOT the OpenCV learned table (no code/data
copied from the reference); it is a deterministic seeded Gaussian pattern in
the style of the original BRIEF paper. The framework controls both sides of
every descriptor comparison, so only internal consistency and
discriminability matter — validated by the matching tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # orientation patch radius (reference HALF_PATCH_SIZE)
N_BITS = 256
PATTERN_RADIUS = 12  # pattern coords clipped so rotated samples stay in-patch


def _circular_mask_and_coords() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = HALF_PATCH
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    mask = (dx ** 2 + dy ** 2 <= r * r).astype(np.float32)
    return mask, dx.astype(np.float32), dy.astype(np.float32)


_MASK, _DX, _DY = _circular_mask_and_coords()


def make_brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 4) int32 pattern (ax, ay, bx, by), Gaussian sigma = patch/5."""
    rng = np.random.default_rng(seed)
    sigma = 31 / 5.0
    pts = rng.normal(0.0, sigma, (N_BITS, 4))
    pts = np.clip(np.round(pts), -PATTERN_RADIUS, PATTERN_RADIUS)
    # avoid degenerate (a == b) pairs
    for i in range(N_BITS):
        while np.all(pts[i, :2] == pts[i, 2:]):
            pts[i, 2:] = np.clip(np.round(rng.normal(0, sigma, 2)),
                                 -PATTERN_RADIUS, PATTERN_RADIUS)
    return pts.astype(np.int32)


_PATTERN = make_brief_pattern()


def orientations(img: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray
                 ) -> jnp.ndarray:
    """Intensity-centroid angle (radians) per keypoint (reference IC_Angle).

    uv: (N, 2) float level-coords. Patch gathers are clamped at borders;
    invalid keypoints get angle 0.
    """
    h, w = img.shape
    size = 2 * HALF_PATCH + 1

    def one(kp):
        y0 = jnp.clip(jnp.round(kp[1]).astype(jnp.int32) - HALF_PATCH, 0, h - size)
        x0 = jnp.clip(jnp.round(kp[0]).astype(jnp.int32) - HALF_PATCH, 0, w - size)
        patch = jax.lax.dynamic_slice(img, (y0, x0), (size, size))
        m10 = jnp.sum(patch * _DX * _MASK)
        m01 = jnp.sum(patch * _DY * _MASK)
        return jnp.arctan2(m01, m10)

    ang = jax.vmap(one)(uv)
    return jnp.where(valid, ang, 0.0)


def descriptors(img_blur: jnp.ndarray, uv: jnp.ndarray, angle: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """Steered-BRIEF descriptors, (N, 8) uint32.

    img_blur: Gaussian-blurred level image; uv: (N, 2) level coords.
    """
    h, w = img_blur.shape
    pat = jnp.asarray(_PATTERN, dtype=jnp.float32)  # (256, 4)
    pa = pat[:, :2]  # (256, 2) first sample offsets (x, y)
    pb = pat[:, 2:]

    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)

    def rotate(offsets):
        # offsets (256, 2) -> (N, 256, 2) rotated by each keypoint angle
        ox, oy = offsets[:, 0], offsets[:, 1]
        rx = ca[:, None] * ox[None] - sa[:, None] * oy[None]
        ry = sa[:, None] * ox[None] + ca[:, None] * oy[None]
        return rx, ry

    flat = img_blur.reshape(-1)

    def sample(rx, ry):
        u = jnp.clip(jnp.round(uv[:, 0:1] + rx).astype(jnp.int32), 0, w - 1)
        v = jnp.clip(jnp.round(uv[:, 1:2] + ry).astype(jnp.int32), 0, h - 1)
        return flat[v * w + u]  # (N, 256)

    ia = sample(*rotate(pa))
    ib = sample(*rotate(pb))
    bits = (ia < ib)  # (N, 256) bool — bit = 1 iff I(a) < I(b)
    return pack_bits(bits) * valid[:, None].astype(jnp.uint32)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) bool -> (N, 8) uint32, bit j of word k = bits[:, 32k + j]."""
    n = bits.shape[0]
    b = bits.reshape(n, 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * weights[None, None, :], axis=-1, dtype=jnp.uint32)


def _unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 packed descriptor -> (N, 256) bfloat16 of ±1."""
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (desc[:, :, None] >> shifts) & jnp.uint32(1)  # (N, 8, 32)
    return (bits.reshape(desc.shape[0], N_BITS).astype(jnp.bfloat16) * 2 - 1)


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distance between packed descriptors.

    a: (M, 8) uint32, b: (N, 8) uint32 -> (M, N) int32. Replaces the
    reference's DescriptorDistance loop (`src/ORBmatcher.cc:1712`) with an
    MXU matmul: unpack each descriptor to a ±1 vector, then
    dot(a, b) = (#same - #diff) = 256 - 2·hamming, so
    h = (256 - dot) / 2 — EXACT (±1 products are exact in bfloat16 and the
    MXU accumulates in float32; |dot| <= 256 < 2^24). The popcount(xor)
    formulation runs 8·M·N XOR+popcount lanes on the VPU; this form is a
    (M, 256) x (256, N) matmul on the systolic array — the units where the
    machine's FLOPs actually are."""
    dot = jax.lax.dot_general(
        _unpack_pm1(a), _unpack_pm1(b),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (M, N)
    return ((jnp.float32(N_BITS) - dot) * 0.5).astype(jnp.int32)
