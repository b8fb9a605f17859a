"""Reproduce the bench kinect-noise stress run on CPU with per-frame
diagnostics: pose error, tracker state, match counts — find where/why the
tracker loses frames under the reference's sigma(z) noise model."""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.evaluation.ate import ate_rmse
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.system import System


def main():
    import sys
    lba = "--lba" in sys.argv
    cfg = SystemConfig()
    factor = cfg.camera.depth_map_factor
    seq = synthetic.make_sequence(n_frames=48, width=cfg.camera.width,
                                  height=cfg.camera.height,
                                  depth_noise=1.0, noise_model="kinect")
    s = System(config=cfg)
    if lba:
        s.local_mapper.enable_local_ba = True
        print("local BA ON")
    for i in range(len(seq)):
        g, d = seq.render(i)
        g8 = np.clip(np.round(g), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(d * factor), 0, 65535).astype(np.uint16)
        s.track_rgbd(g8, d16, seq.timestamps[i])
        st = s.tracker.stats
        est = s.frame_poses_wc()
        err = float("nan")
        if len(est) > i:
            err = float(np.linalg.norm(est[i, :3, 3]
                                       - seq.poses_wc[i, :3, 3]))
        print(f"f{i:02d} state={s.tracker.state.name:>4} "
              f"err={err*100:6.2f}cm lost={st.get('lost', 0)} "
              f"manh={st.get('manhattan_success', 0)} "
              f"full={st.get('full_pose', 0)} kfs={st.get('kfs', 0)}")
    s.shutdown()
    est = s.frame_poses_wc()
    print("ATE:", ate_rmse(est[:, :3, 3], seq.poses_wc[:len(est), :3, 3]))
    print("stats:", dict(s.tracker.stats))


if __name__ == "__main__":
    main()
