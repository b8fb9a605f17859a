"""Fused local-mapping device kernel — one XLA program, one host pull per KF.

The reference's LocalMapping thread (`src/LocalMapping.cc:28-99`) does
per-neighbor projection fuse (`SearchInNeighbors :1039`) and epipolar
triangulation (`CreateNewMapPoints :309`) in loops over covisible keyframes.
The round-1 port issued one device call (and one tunnel round-trip) per
neighbor per stage — ~700 ms per keyframe through the axon tunnel. Here all
neighbors are stacked on a leading axis and processed by ONE jitted program
returning ONE packed bundle:

  - fuse search: project the new KF's landmarks into each neighbor and match
    within a window (`ORBmatcher::Fuse` role, `src/ORBmatcher.cc:829`);
  - triangulation: brute-force descriptor matching of the new KF's free
    (depthless) features against each neighbor's free features
    (`SearchForTriangulation` role, `src/ORBmatcher.cc:661`), DLT
    triangulation, and two-view reprojection chi2 acceptance.

Host code applies the results to the map tables (branchy, tiny).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.ops import matching

N_NEIGHBORS = 5  # covisible neighbors processed per KF (reference uses 5-10)


class MappingLayout:
    """Static layout of the packed mapping bundle."""

    def __init__(self, cfg: SystemConfig):
        K = cfg.orb.max_keypoints
        L = cfg.lines.max_lines
        NB = N_NEIGHBORS
        self.fields = [
            ("fuse_idx", (NB, K), np.int32),   # own-landmark slot -> nb feat
            ("tri_idx", (NB, K), np.int32),    # own feat -> nb feat
            ("tri_x", (NB, K, 3), np.float32),  # triangulated world point
            ("tri_good", (NB, K), np.int32),   # acceptance mask
            ("ln_tri_idx", (NB, L), np.int32),  # own line -> nb line
            ("ln_tri_s", (NB, L, 3), np.float32),  # start endpoint (world)
            ("ln_tri_e", (NB, L, 3), np.float32),  # end endpoint (world)
            ("ln_tri_good", (NB, L), np.int32),
        ]
        self.sizes = [int(np.prod(s)) for _, s, _ in self.fields]
        self.total = sum(self.sizes)

    def unpack(self, flat: np.ndarray) -> dict:
        out = {}
        off = 0
        for (name, shape, dtype), size in zip(self.fields, self.sizes):
            chunk = flat[off:off + size]
            if dtype == np.int32:
                chunk = chunk.view(np.int32)
            out[name] = chunk.reshape(shape).copy()
            off += size
        return out


def _mapping_step_impl(
    # own-KF data
    own_T: jnp.ndarray,         # (4, 4)
    own_uv: jnp.ndarray,        # (K, 2)
    own_desc: jnp.ndarray,      # (K, 8) uint32
    own_level: jnp.ndarray,     # (K,)
    own_free: jnp.ndarray,      # (K,) bool: unassociated + depthless
    lm_xyz: jnp.ndarray,        # (K, 3) own landmarks (world)
    lm_desc: jnp.ndarray,       # (K, 8)
    lm_valid: jnp.ndarray,      # (K,) bool
    # stacked neighbors
    nb_T: jnp.ndarray,          # (NB, 4, 4)
    nb_uv: jnp.ndarray,         # (NB, K, 2)
    nb_desc: jnp.ndarray,       # (NB, K, 8)
    nb_level: jnp.ndarray,      # (NB, K)
    nb_valid: jnp.ndarray,      # (NB, K) bool
    nb_ur: jnp.ndarray,         # (NB, K)
    nb_free: jnp.ndarray,       # (NB, K) bool
    nb_ok: jnp.ndarray,         # (NB,) bool neighbor slot is real
    # own-KF / neighbor line data (line triangulation,
    # reference CreateNewMapLines2 `src/LocalMapping.cc:800`)
    own_ln_uvs: jnp.ndarray,    # (L, 2)
    own_ln_uve: jnp.ndarray,    # (L, 2)
    own_ln_l2d: jnp.ndarray,    # (L, 3)
    own_ln_desc: jnp.ndarray,   # (L, D)
    own_ln_angle: jnp.ndarray,  # (L,)
    own_ln_free: jnp.ndarray,   # (L,) bool: valid, unassociated, no 3D lift
    nb_ln_l2d: jnp.ndarray,     # (NB, L, 3)
    nb_ln_desc: jnp.ndarray,    # (NB, L, D)
    nb_ln_angle: jnp.ndarray,   # (NB, L)
    nb_ln_free: jnp.ndarray,    # (NB, L) bool
    cfg: SystemConfig,
) -> jnp.ndarray:
    cam = cfg.camera
    K = (cam.fx, cam.fy, cam.cx, cam.cy)
    Kp = cfg.orb.max_keypoints
    layout = MappingLayout(cfg)
    Kmat = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                     jnp.float32)

    # ---- fuse: project own landmarks into each neighbor -------------------
    def fuse_one(T, uv, desc, level, valid, ur, ok):
        res = matching.search_by_projection(
            lm_xyz, lm_desc, lm_valid & ok, T, uv, desc, level, valid, ur,
            K=K, image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
            scale_factor=cfg.orb.scale_factor, radius=3.0,
            max_dist=cfg.matcher.th_low, level_window=1)
        return res.idx

    fuse_idx = jax.vmap(fuse_one)(nb_T, nb_uv, nb_desc, nb_level, nb_valid,
                                  nb_ur, nb_ok)

    # ---- triangulation: match free features, DLT, two-view checks ---------
    s2 = jnp.power(jnp.float32(cfg.orb.scale_factor),
                   -2.0 * own_level.astype(jnp.float32))
    P1 = Kmat @ own_T[:3]

    def tri_one(T, uv, desc, level, free, ok):
        res = matching.match_descriptors(
            own_desc, desc, own_free & ok, free,
            max_dist=cfg.matcher.th_low, ratio=0.8)
        idx = res.idx
        has = idx >= 0
        j = jnp.clip(idx, 0, Kp - 1)
        uv2 = uv[j]
        P2 = Kmat @ T[:3]

        def one(u1, u2):
            A = jnp.stack([
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ])
            # nullspace via the smallest right singular vector of A (4x4):
            # smallest eigenvector of A^T A, closed form (ops/eig3 is 3x3;
            # here use two Jacobi-free steps: solve (A^T A) v = min-eig v by
            # inverse iteration is overkill — plain SVD on 4x4 batches is
            # acceptable at (NB*K) size)
            _, _, Vt = jnp.linalg.svd(A)
            Xh = Vt[-1]
            w = Xh[3]
            return Xh[:3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)

        X = jax.vmap(one)(own_uv, uv2)
        finite = jnp.all(jnp.isfinite(X), axis=-1)

        def proj_gate(Tc, uvp, inv_s2):
            pc = X @ Tc[:3, :3].T + Tc[:3, 3]
            z = pc[:, 2]
            u = cam.fx * pc[:, 0] / jnp.maximum(z, 1e-9) + cam.cx
            v = cam.fy * pc[:, 1] / jnp.maximum(z, 1e-9) + cam.cy
            err = ((u - uvp[:, 0]) ** 2 + (v - uvp[:, 1]) ** 2) * inv_s2
            return (z > 0.05) & (err < 5.991)

        s2b = jnp.power(jnp.float32(cfg.orb.scale_factor),
                        -2.0 * level[j].astype(jnp.float32))
        good = (has & finite & proj_gate(own_T, own_uv, s2)
                & proj_gate(T, uv2, s2b))
        return idx, X, good

    tri_idx, tri_x, tri_good = jax.vmap(tri_one)(
        nb_T, nb_uv, nb_desc, nb_level, nb_free, nb_ok)

    # ---- line triangulation (CreateNewMapLines2, `LocalMapping.cc:800`) ---
    # each 2D segment back-projects to a plane through its camera center
    # (pi = P^T l); two views' planes intersect in the 3D line; the own
    # segment's endpoint RAYS cut the neighbor's plane at the endpoints.
    Rw1 = own_T[:3, :3]
    C1 = -Rw1.T @ own_T[:3, 3]
    Kinv = jnp.linalg.inv(Kmat)

    def ray_dir(uv):  # world-frame ray directions for own pixels (L, 2)
        h = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
        return (Kinv @ h.T).T @ Rw1  # (L, 3): R1^T K^-1 u

    d_s = ray_dir(own_ln_uvs)
    d_e = ray_dir(own_ln_uve)

    def ln_tri_one(T, l2d_nb, desc_nb, ang_nb, free_nb, ok):
        sim = own_ln_desc @ desc_nb.T
        gate = own_ln_free[:, None] & free_nb[None, :] & ok
        sim = jnp.where(gate, sim, -1.0)
        idx = jnp.argmax(sim, axis=1)
        has = jnp.max(sim, axis=1) > 0.75
        j = jnp.clip(idx, 0, l2d_nb.shape[0] - 1)
        # neighbor back-projection plane pi2 = (K P2)^T l2  (4-vector)
        P2 = Kmat @ T[:3]
        pi2 = (P2.T @ l2d_nb[j][..., None])[..., 0]  # (L, 4)
        n2 = pi2[:, :3]
        # own back-projection plane normal (for the parallax gate)
        P1w = Kmat @ own_T[:3]
        pi1 = (P1w.T @ own_ln_l2d[..., None])[..., 0]
        cosp = jnp.abs(jnp.sum(pi1[:, :3] * n2, axis=-1)) / (
            jnp.linalg.norm(pi1[:, :3], axis=-1)
            * jnp.linalg.norm(n2, axis=-1) + 1e-12)

        def cut(dirs):
            denom = jnp.sum(n2 * dirs, axis=-1)
            t = -(n2 @ C1 + pi2[:, 3]) / jnp.where(
                jnp.abs(denom) < 1e-9, 1e-9, denom)
            return C1[None, :] + t[:, None] * dirs, t

        Xs, ts = cut(d_s)
        Xe, te = cut(d_e)
        # depth in the own camera + sane segment length
        zs = (Xs @ Rw1.T)[:, 2] + own_T[2, 3]
        ze = (Xe @ Rw1.T)[:, 2] + own_T[2, 3]
        seg = jnp.linalg.norm(Xe - Xs, axis=-1)
        good = (has & (cosp < 0.998)             # parallax >= ~3.6 deg
                & (ts > 0) & (te > 0)
                & (zs > 0.1) & (zs < 40.0) & (ze > 0.1) & (ze < 40.0)
                & (seg > 0.05) & (seg < 20.0)
                & jnp.all(jnp.isfinite(Xs), axis=-1)
                & jnp.all(jnp.isfinite(Xe), axis=-1))
        return idx, Xs, Xe, good

    ln_tri_idx, ln_tri_s, ln_tri_e, ln_tri_good = jax.vmap(ln_tri_one)(
        nb_T, nb_ln_l2d, nb_ln_desc, nb_ln_angle, nb_ln_free, nb_ok)

    parts = [
        jax.lax.bitcast_convert_type(fuse_idx.astype(jnp.int32),
                                     jnp.float32).reshape(-1),
        jax.lax.bitcast_convert_type(tri_idx.astype(jnp.int32),
                                     jnp.float32).reshape(-1),
        tri_x.astype(jnp.float32).reshape(-1),
        jax.lax.bitcast_convert_type(tri_good.astype(jnp.int32),
                                     jnp.float32).reshape(-1),
        jax.lax.bitcast_convert_type(ln_tri_idx.astype(jnp.int32),
                                     jnp.float32).reshape(-1),
        ln_tri_s.astype(jnp.float32).reshape(-1),
        ln_tri_e.astype(jnp.float32).reshape(-1),
        jax.lax.bitcast_convert_type(ln_tri_good.astype(jnp.int32),
                                     jnp.float32).reshape(-1),
    ]
    del layout
    return jnp.concatenate(parts)


mapping_step = partial(jax.jit, static_argnames=("cfg",))(_mapping_step_impl)


class PackedInputLayout:
    """Static layout for packing a device program's whole input list into
    ONE float32 buffer — a per-leaf eager `jnp.asarray` upload costs one
    tunnel transaction each (2-60 ms under load); a 10-26-leaf argument
    list costs more than the program itself on every keyframe. Ints/uints
    ride as bitcast float32 (exact), bools as 0/1."""

    KINDS = {"f": np.float32, "u": np.uint32, "i": np.int32, "b": bool}

    def __init__(self, fields):
        self.fields = fields
        self.sizes = [int(np.prod(s)) for _, s, _ in self.fields]
        self.total = sum(self.sizes)

    def pack(self, arrays: dict) -> np.ndarray:
        parts = []
        for (name, shape, kind), size in zip(self.fields, self.sizes):
            a = np.ascontiguousarray(arrays[name])
            assert a.shape == shape, (name, a.shape, shape)
            if kind == "f":
                p = a.astype(np.float32, copy=False)
            elif kind in ("u", "i"):
                p = a.astype(self.KINDS[kind], copy=False).view(np.float32)
            else:
                p = a.astype(np.float32)
            parts.append(p.reshape(-1))
        return np.concatenate(parts)

    def unpack_device(self, flat: jnp.ndarray) -> list:
        out = []
        off = 0
        for (name, shape, kind), size in zip(self.fields, self.sizes):
            x = flat[off:off + size].reshape(shape)
            if kind == "u":
                x = jax.lax.bitcast_convert_type(x, jnp.uint32)
            elif kind == "i":
                x = jax.lax.bitcast_convert_type(x, jnp.int32)
            elif kind == "b":
                x = x > 0.5
            out.append(x)
            off += size
        return out


class MappingInputLayout(PackedInputLayout):
    """mapping_step inputs (26 leaves) as one packed upload."""

    def __init__(self, cfg: SystemConfig):
        K = cfg.orb.max_keypoints
        L = cfg.lines.max_lines
        D = cfg.lines.desc_dim
        NB = N_NEIGHBORS
        # (name, shape, kind) in _mapping_step_impl argument order
        super().__init__([
            ("own_T", (4, 4), "f"), ("own_uv", (K, 2), "f"),
            ("own_desc", (K, 8), "u"), ("own_level", (K,), "i"),
            ("own_free", (K,), "b"), ("lm_xyz", (K, 3), "f"),
            ("lm_desc", (K, 8), "u"), ("lm_valid", (K,), "b"),
            ("nb_T", (NB, 4, 4), "f"), ("nb_uv", (NB, K, 2), "f"),
            ("nb_desc", (NB, K, 8), "u"), ("nb_level", (NB, K), "i"),
            ("nb_valid", (NB, K), "b"), ("nb_ur", (NB, K), "f"),
            ("nb_free", (NB, K), "b"), ("nb_ok", (NB,), "b"),
            ("own_ln_uvs", (L, 2), "f"), ("own_ln_uve", (L, 2), "f"),
            ("own_ln_l2d", (L, 3), "f"), ("own_ln_desc", (L, D), "f"),
            ("own_ln_angle", (L,), "f"), ("own_ln_free", (L,), "b"),
            ("nb_ln_l2d", (NB, L, 3), "f"), ("nb_ln_desc", (NB, L, D), "f"),
            ("nb_ln_angle", (NB, L), "f"), ("nb_ln_free", (NB, L), "b"),
        ])


@partial(jax.jit, static_argnames=("cfg",))
def mapping_step_packed(flat: jnp.ndarray, cfg: SystemConfig) -> jnp.ndarray:
    """mapping_step over ONE packed input upload (see MappingInputLayout)."""
    return _mapping_step_impl(*MappingInputLayout(cfg).unpack_device(flat),
                              cfg)


class FuseSetInputLayout(PackedInputLayout):
    """fuse_set_step inputs (10 leaves) as one packed upload."""

    def __init__(self, cfg: SystemConfig):
        K = cfg.orb.max_keypoints
        C = cfg.orb.max_keypoints  # landmark set capacity (== K)
        NB = N_NEIGHBORS
        super().__init__([
            ("lm_xyz", (C, 3), "f"), ("lm_desc", (C, 8), "u"),
            ("lm_valid", (C,), "b"), ("nb_T", (NB, 4, 4), "f"),
            ("nb_uv", (NB, K, 2), "f"), ("nb_desc", (NB, K, 8), "u"),
            ("nb_level", (NB, K), "i"), ("nb_valid", (NB, K), "b"),
            ("nb_ur", (NB, K), "f"), ("nb_ok", (NB,), "b"),
        ])


@partial(jax.jit, static_argnames=("cfg", "radius"))
def fuse_set_step_packed(flat: jnp.ndarray, cfg: SystemConfig,
                         radius: float = 4.0) -> jnp.ndarray:
    """fuse_set_step over ONE packed input upload (see FuseSetInputLayout)."""
    return _fuse_set_impl(*FuseSetInputLayout(cfg).unpack_device(flat),
                          cfg, radius=radius)


def _fuse_set_impl(
    lm_xyz: jnp.ndarray,    # (C, 3) landmark positions (world)
    lm_desc: jnp.ndarray,   # (C, 8)
    lm_valid: jnp.ndarray,  # (C,) bool
    nb_T: jnp.ndarray,      # (NB, 4, 4) target KF poses
    nb_uv: jnp.ndarray,     # (NB, K, 2)
    nb_desc: jnp.ndarray,   # (NB, K, 8)
    nb_level: jnp.ndarray,  # (NB, K)
    nb_valid: jnp.ndarray,  # (NB, K) bool
    nb_ur: jnp.ndarray,     # (NB, K)
    nb_ok: jnp.ndarray,     # (NB,) bool
    cfg: SystemConfig,
    radius: float = 4.0,
) -> jnp.ndarray:
    """Project a landmark SET into several target keyframes and match —
    the `ORBmatcher::Fuse` loop of loop closing's SearchAndFuse
    (`src/LoopClosing.cc:587`, `src/ORBmatcher.cc:829`), all targets in one
    program. Returns (NB, C) int32 feature index or -1."""
    cam = cfg.camera
    K = (cam.fx, cam.fy, cam.cx, cam.cy)

    def one(T, uv, desc, level, valid, ur, ok):
        res = matching.search_by_projection(
            lm_xyz, lm_desc, lm_valid & ok, T, uv, desc, level, valid, ur,
            K=K, image_wh=(float(cam.width), float(cam.height)), bf=cam.bf,
            scale_factor=cfg.orb.scale_factor, radius=radius,
            max_dist=cfg.matcher.th_low, level_window=1)
        return res.idx

    return jax.vmap(one)(nb_T, nb_uv, nb_desc, nb_level, nb_valid, nb_ur,
                         nb_ok)


fuse_set_step = partial(jax.jit,
                        static_argnames=("cfg", "radius"))(_fuse_set_impl)


def run_fuse_set(slam_map, lm_ids: np.ndarray, target_kfs, cfg: SystemConfig,
                 radius: float = 4.0) -> dict:
    """Host wrapper for fuse_set_step over up to N_NEIGHBORS target KFs.
    ONE packed upload + ONE program + ONE pull."""
    m = slam_map
    C = cfg.orb.max_keypoints
    ids = np.full(C, 0, np.int64)
    n = min(len(lm_ids), C)
    ids[:n] = lm_ids[:n]
    valid = np.zeros(C, bool)
    valid[:n] = m.pt_valid[ids[:n]]
    NB = N_NEIGHBORS
    tg = list(target_kfs)[:NB]
    nb_ids = (tg + [0] * NB)[:NB]
    nb_ok = np.zeros(NB, bool)
    nb_ok[:len(tg)] = True
    nb_arr = np.asarray(nb_ids)
    flat = FuseSetInputLayout(cfg).pack({
        "lm_xyz": m.pt_xyz[ids], "lm_desc": m.pt_desc[ids],
        "lm_valid": valid, "nb_T": m.kf_pose[nb_arr],
        "nb_uv": m.kf_uv[nb_arr], "nb_desc": m.kf_desc[nb_arr],
        "nb_level": m.kf_level[nb_arr], "nb_valid": m.kf_feat_valid[nb_arr],
        "nb_ur": m.kf_ur[nb_arr], "nb_ok": nb_ok})
    idx = fuse_set_step_packed(jnp.asarray(flat), cfg, radius=radius)
    return {"idx": np.asarray(idx), "lm_ids": ids, "lm_valid": valid,
            "nb_ids": nb_arr, "nb_ok": nb_ok}


def run_mapping_step(slam_map, kf: int, cfg: SystemConfig) -> dict:
    """Gather inputs from the host map, run the fused kernel, unpack.
    Synchronous convenience wrapper over dispatch + join."""
    return join_mapping_step(dispatch_mapping_step(slam_map, kf, cfg))


def join_mapping_step(pending: dict) -> dict:
    """Block on a dispatch_mapping_step pull and unpack the bundle."""
    fut = pending.pop("future", None)
    dev = pending.pop("packed")
    packed = fut.result() if fut is not None else np.asarray(dev)
    out = pending.pop("layout").unpack(packed)
    out.update(pending)
    return out


def dispatch_mapping_step(slam_map, kf: int, cfg: SystemConfig,
                          pull_pool=None) -> dict:
    """Gather inputs from the host map and dispatch the fused mapping
    kernel; the D2H pull rides `pull_pool` (or stays lazy) so the caller
    can overlap the round-trip with subsequent tracking frames and
    join_mapping_step later — the synchronous pull blocked the frame loop
    ~30-130 ms per keyframe behind in-flight uploads (round-5 frame
    budget). The uploaded snapshot is self-contained: later host map
    mutations cannot corrupt the in-flight program."""
    m = slam_map
    Kp = cfg.orb.max_keypoints
    layout = MappingLayout(cfg)

    own_row = m.kf_pt_idx[kf]
    lm_ids = np.clip(own_row, 0, None)
    lm_valid = (own_row >= 0) & m.pt_valid[lm_ids]
    own_free = (own_row < 0) & m.kf_feat_valid[kf] & (m.kf_depth[kf] <= 0)

    nbs = [int(n) for n in m.covisible_kfs(kf)[:N_NEIGHBORS]]
    NB = N_NEIGHBORS
    nb_ids = (nbs + [0] * NB)[:NB]
    nb_ok = np.zeros(NB, bool)
    nb_ok[:len(nbs)] = True
    # baseline gate for triangulation (reference skips close neighbors)
    c1 = -m.kf_pose[kf][:3, :3].T @ m.kf_pose[kf][:3, 3]
    tri_ok = nb_ok.copy()
    for i, nb in enumerate(nb_ids):
        c2 = -m.kf_pose[nb][:3, :3].T @ m.kf_pose[nb][:3, 3]
        if np.linalg.norm(c1 - c2) < 0.02:
            tri_ok[i] = False
    nb_ids_arr = np.asarray(nb_ids)
    nb_free = ((m.kf_pt_idx[nb_ids_arr] < 0)
               & m.kf_feat_valid[nb_ids_arr]) & tri_ok[:, None]

    # free lines: valid detections with neither a map-line association nor a
    # depth-based 3D lift left to create (the depth path created those at KF
    # insertion) — these are the CreateNewMapLines2 candidates
    own_ln_row = m.kf_ln_idx[kf]
    own_ln_free = (own_ln_row < 0) & m.kf_ln_valid[kf]
    nb_ln_free = ((m.kf_ln_idx[nb_ids_arr] < 0)
                  & m.kf_ln_valid[nb_ids_arr]) & tri_ok[:, None]

    in_layout = MappingInputLayout(cfg)
    flat = in_layout.pack({
        "own_T": m.kf_pose[kf], "own_uv": m.kf_uv[kf],
        "own_desc": m.kf_desc[kf], "own_level": m.kf_level[kf],
        "own_free": own_free, "lm_xyz": m.pt_xyz[lm_ids],
        "lm_desc": m.pt_desc[lm_ids], "lm_valid": lm_valid,
        "nb_T": m.kf_pose[nb_ids_arr], "nb_uv": m.kf_uv[nb_ids_arr],
        "nb_desc": m.kf_desc[nb_ids_arr], "nb_level": m.kf_level[nb_ids_arr],
        "nb_valid": m.kf_feat_valid[nb_ids_arr],
        "nb_ur": m.kf_ur[nb_ids_arr], "nb_free": nb_free, "nb_ok": nb_ok,
        "own_ln_uvs": m.kf_ln_uv_s[kf], "own_ln_uve": m.kf_ln_uv_e[kf],
        "own_ln_l2d": m.kf_ln_line2d[kf], "own_ln_desc": m.kf_ln_desc[kf],
        "own_ln_angle": m.kf_ln_angle[kf], "own_ln_free": own_ln_free,
        "nb_ln_l2d": m.kf_ln_line2d[nb_ids_arr],
        "nb_ln_desc": m.kf_ln_desc[nb_ids_arr],
        "nb_ln_angle": m.kf_ln_angle[nb_ids_arr], "nb_ln_free": nb_ln_free,
    })
    # ONE upload + ONE program + ONE (deferred) pull per keyframe (the
    # per-leaf argument list cost ~26 tunnel transactions each insertion)
    packed = mapping_step_packed(jnp.asarray(flat), cfg)
    fut = None
    if pull_pool is not None:
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        fut = pull_pool.submit(np.asarray, packed)
    return {
        "future": fut, "packed": packed, "layout": layout, "kf": kf,
        "nb_ids": nb_ids_arr, "nb_ok": nb_ok, "tri_ok": tri_ok,
        "own_free": own_free, "own_ln_free": own_ln_free,
        "lm_valid": lm_valid,
    }
