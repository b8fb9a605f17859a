"""Per-stage breakdown of the bench loop."""
import time
import numpy as np

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.system import System

N = 40
cfg = SystemConfig()
seq = synthetic.make_sequence(n_frames=N, width=cfg.camera.width,
                              height=cfg.camera.height)
frames = [seq.render(i) for i in range(N)]

slam = System(config=cfg)

# monkeypatch timers
import planarslam_tpu.slam.tracking as trk
import planarslam_tpu.slam.device_tracker as dt

orig_fused = dt.fused_track_step
fused_times = []
def timed_fused(*a, **k):
    t0 = time.perf_counter()
    r = orig_fused(*a, **k)
    fused_times.append(time.perf_counter() - t0)
    return r
dt.fused_track_step = timed_fused
trk_mod_fused = trk.__dict__  # imported inside method, so patch module

orig_unpack = slam.tracker._layout.unpack
unpack_times = []
def timed_unpack(x):
    t0 = time.perf_counter()
    r = orig_unpack(x)
    unpack_times.append(time.perf_counter() - t0)
    return r
slam.tracker._layout.unpack = timed_unpack

orig_ckf = slam.tracker._create_keyframe
ckf_times = []
def timed_ckf(*a, **k):
    t0 = time.perf_counter()
    r = orig_ckf(*a, **k)
    ckf_times.append(time.perf_counter() - t0)
    return r
slam.tracker._create_keyframe = timed_ckf

orig_lm = slam.local_mapper.process_keyframe
lm_times = []
def timed_lm(*a, **k):
    t0 = time.perf_counter()
    r = orig_lm(*a, **k)
    lm_times.append(time.perf_counter() - t0)
    return r
slam.local_mapper.process_keyframe = timed_lm

orig_lc = slam.loop_closer.process_keyframe
lc_times = []
def timed_lc(*a, **k):
    t0 = time.perf_counter()
    r = orig_lc(*a, **k)
    lc_times.append(time.perf_counter() - t0)
    return r
slam.loop_closer.process_keyframe = timed_lc

orig_rw = slam.tracker._refresh_window
rw_times = []
def timed_rw(*a, **k):
    t0 = time.perf_counter()
    r = orig_rw(*a, **k)
    rw_times.append(time.perf_counter() - t0)
    return r
slam.tracker._refresh_window = timed_rw

frame_times = []
for i, (gray, depth) in enumerate(frames):
    t0 = time.perf_counter()
    slam.track_rgbd(gray, depth, seq.timestamps[i])
    frame_times.append(time.perf_counter() - t0)

def stats(name, v):
    if not v:
        print(f"{name:16s} n=0")
        return
    v = np.asarray(v) * 1e3
    print(f"{name:16s} n={len(v):3d} median={np.median(v):8.1f}ms "
          f"mean={v.mean():8.1f}ms total={v.sum():8.0f}ms")

stats("frame", frame_times[3:])
stats("fused_dispatch", fused_times[3:])
stats("unpack(sync)", unpack_times[3:])
stats("refresh_window", rw_times)
stats("create_kf", ckf_times)
stats("local_mapping", lm_times)
stats("loop_closing", lc_times)
print("total all frames:", sum(frame_times)*1e3, "ms; kfs:", slam.map.n_kf)
