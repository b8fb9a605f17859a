"""Batched multi-sequence SLAM over the virtual 8-device CPU mesh.

VERDICT round-1 item 2 acceptance: 8 synthetic sequences replayed through
FULL System-equivalent tracking (keyframing + local mapping + loop closing
per sequence) with the dense per-frame compute batched in one vmapped,
mesh-sharded `fused_track_step` program (BASELINE config 5 workload).
"""

import numpy as np
import pytest

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.evaluation.ate import ate_rmse
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.tracking import TrackingState


@pytest.mark.slow
def test_batched_slam_8_sequences():
    import jax

    from planarslam_tpu.parallel.replay import BatchedSLAM, make_mesh

    B = 8
    assert len(jax.devices()) >= B, "conftest provides the 8-device mesh"
    cfg = SystemConfig.tiny()
    # different trajectory shapes per sequence -> genuinely independent maps
    kinds = ["arc", "still"] * (B // 2)
    seqs = [synthetic.make_sequence(n_frames=10, width=cfg.camera.width,
                                    height=cfg.camera.height, kind=k,
                                    seed=100 + i)
            for i, k in enumerate(kinds)]
    mesh = make_mesh(B)
    batched = BatchedSLAM(cfg, B, mesh=mesh)
    out = batched.run(seqs)

    assert out.shape == (B, 10, 4, 4)
    assert np.isfinite(out).all()
    for b, (s, seq) in enumerate(zip(batched.systems, seqs)):
        # every sequence ran a real SLAM instance: initialized, kept
        # tracking, and built its own keyframes/map
        assert s.get_tracking_state() == TrackingState.OK, f"seq {b}"
        assert len(s.map.valid_kf_ids()) >= 1, f"seq {b}"
        est = s.frame_poses_wc()
        err = ate_rmse(est[:, :3, 3], seq.poses_wc[:len(est), :3, 3])
        assert err < 0.08, f"seq {b} ATE {err:.4f} m"
    # the batch really fused: after warmup every frame ran the vmapped step
    assert batched._n_last == B
