"""Keyframe slot recycling (`SlamMap.compact_keyframes`).

The reference keeps culled KeyFrames alive as husks holding mTcp chains
(`src/KeyFrame.cc:560-620`) and its lifecycle is unbounded; this build's
fixed-capacity slots are reclaimed by compaction instead. These tests cover
the map-level remap semantics and the full-system path where a long run
with culling churn would exhaust the monotonic allocator.
"""

import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.evaluation.ate import ate_rmse
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.map import SlamMap
from planarslam_tpu.slam.system import System


def _mini_map(cfg, n_kf):
    m = SlamMap(cfg)
    rng = np.random.default_rng(7)
    for k in range(n_kf):
        m.alloc_keyframe()
        m.kf_valid[k] = True
        m.kf_frame_id[k] = k
        m.kf_timestamp[k] = float(k)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(size=3).astype(np.float32)
        m.kf_pose[k] = T
        m.kf_parent[k] = k - 1
    return m


def test_compact_folds_parents_and_loop_edges():
    cfg = SystemConfig.tiny()
    m = _mini_map(cfg, 8)
    # landmark anchored at KF 3; loop edge 1 <-> 6
    m.pt_valid[0] = True
    m.pt_first_kf[0] = 3
    T16 = m.kf_pose[1] @ np.linalg.inv(m.kf_pose[6])
    m.add_loop_edge(1, 6, T16)
    # cull 3 and 5 (stores cull-time relatives, reparents children)
    pose3 = m.kf_pose[3].copy()
    m.cull_keyframe(3)
    m.cull_keyframe(5)
    # resolved pose of the culled KF before compaction
    a, rel = m.resolve_kf(3)
    resolved3 = rel @ m.kf_pose[a]

    remap = m.compact_keyframes()
    assert remap is not None
    assert m.n_kf == 6
    assert m.kf_valid[:6].all() and not m.kf_valid[6:].any()
    # insertion order preserved
    assert list(m.kf_frame_id[:6]) == [0, 1, 2, 4, 6, 7]
    # the culled KF's resolved pose was exact at cull time
    np.testing.assert_allclose(resolved3, pose3, atol=1e-5)
    # landmark anchor folded to the nearest valid ancestor's NEW id
    assert m.pt_first_kf[0] == remap[2] == 2
    # loop edge endpoints remapped; constraint still consistent
    assert m.n_loop_edges == 1
    na, nb = m.loop_edge_ab[0]
    assert (na, nb) == (remap[1], remap[6])
    np.testing.assert_allclose(
        m.loop_edge_T[0] @ m.kf_pose[nb], m.kf_pose[na], atol=1e-5)
    # parents fold through culled husks
    assert m.kf_parent[remap[6]] == remap[4]  # 6's parent 5 -> ancestor 4
    # nothing to reclaim the second time
    assert m.compact_keyframes() is None


def test_system_compacts_before_capacity_and_ate_stays_flat():
    """A run that inserts more KFs than there are slots must recycle culled
    slots (never raise 'keyframe capacity exhausted') and keep trajectory
    accuracy — records re-anchor through the remap."""
    import dataclasses

    cfg = SystemConfig.tiny()
    # a slow orbit revisits overlapping views: forced-cadence KFs become
    # redundant (>=90% of their points seen elsewhere) and get culled,
    # creating the slot churn that would exhaust a monotonic allocator
    cfg = cfg.replace(map=dataclasses.replace(cfg.map, max_keyframes=14),
                      tracking=dataclasses.replace(
                          cfg.tracking, max_frames_between_kf=1))
    n = 60
    seq = synthetic.make_sequence(n_frames=n, width=cfg.camera.width,
                                  height=cfg.camera.height, kind="still")
    slam = System(config=cfg)
    for i in range(n):
        gray, depth = seq.render(i)
        slam.track_rgbd(gray, depth, seq.timestamps[i])
    slam.shutdown()
    assert slam.compactions >= 1, "compaction never triggered"
    assert slam.map.n_kf < cfg.map.max_keyframes
    est = slam.frame_poses_wc()
    ok = ~np.asarray([r.lost for r in slam.tracker.records])
    err = ate_rmse(est[ok][:, :3, 3], seq.poses_wc[ok][:, :3, 3])
    assert err < 0.06, f"ATE RMSE {err:.4f} m after compaction"
