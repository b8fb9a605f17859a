"""Instrument the phases inside _track_frame_fused during a bench run."""
import sys; sys.path.insert(0, ".")
import time
import numpy as np
import jax.numpy as jnp

from planarslam_tpu.config import SystemConfig
from planarslam_tpu.io import synthetic
from planarslam_tpu.slam.system import System
import planarslam_tpu.slam.tracking as trk

cfg = SystemConfig()
N = 40
seq = synthetic.make_sequence(n_frames=N, width=cfg.camera.width,
                              height=cfg.camera.height)
frames = [seq.render(i) for i in range(N)]
slam = System(config=cfg)

phases = {"upload": [], "dispatch": [], "pull": [], "host": [], "total": []}

orig = trk.Tracking._track_frame_fused
def patched(self, gray, depth, timestamp):
    from planarslam_tpu.slam.device_tracker import fused_track_step
    cfg = self.cfg
    t0 = time.perf_counter()
    if self._window_dirty or self._window is None:
        self._refresh_window()
    manh_enabled = self.R_wm is not None
    R_wm = self.R_wm if manh_enabled else np.eye(3, dtype=np.float32)
    use_ovr = self._pose_override is not None
    T_ovr = self._pose_override if use_ovr else np.eye(4, dtype=np.float32)
    self._pose_override = None
    g = jnp.asarray(gray, dtype=jnp.float32)
    d = jnp.asarray(depth, dtype=jnp.float32)
    import jax
    jax.block_until_ready((g, d))
    t1 = time.perf_counter()
    result = fused_track_step(
        g, d, jnp.asarray(T_ovr.astype(np.float32)), jnp.asarray(use_ovr),
        jnp.asarray(R_wm.astype(np.float32)), jnp.asarray(manh_enabled),
        self._fused_state, self._window, self._pose_weights, cfg)
    try:
        result.packed.copy_to_host_async()
    except Exception:
        pass
    t2 = time.perf_counter()
    self._pending.append({
        "packed": result.packed, "state": result.new_state,
        "timestamp": timestamp, "frame_id": self.frame_id,
        "depth": self._last_depth})
    self._fused_state = result.new_state
    ok = True
    t_pull = 0.0
    t3 = time.perf_counter()
    while len(self._pending) > self.pipeline_depth:
        prev = self._pending.pop(0)
        tp = time.perf_counter()
        flat = np.asarray(prev["packed"])
        t_pull += time.perf_counter() - tp
        prev["packed"] = flat
        if not self._process_bundle(prev):
            for dropped in self._pending:
                self._append_record(dropped["timestamp"], lost=True)
            self._pending.clear()
            self._fused_state = None
            ok = False
            break
    t4 = time.perf_counter()
    phases["upload"].append(t1 - t0)
    phases["dispatch"].append(t2 - t1)
    phases["pull"].append(t_pull)
    phases["host"].append((t4 - t3) - t_pull)
    phases["total"].append(t4 - t0)
    return ok

# _process_bundle must accept pre-pulled ndarray
orig_unpack = slam.tracker._layout.unpack
def unpack2(x):
    if isinstance(x, np.ndarray):
        return orig_unpack(x)
    return orig_unpack(np.asarray(x))
slam.tracker._layout.unpack = unpack2
trk.Tracking._track_frame_fused = patched

ft = []
for i, (g, d) in enumerate(frames):
    t0 = time.perf_counter()
    slam.track_rgbd(g, d, seq.timestamps[i])
    ft.append(time.perf_counter() - t0)

for k, v in phases.items():
    v = np.asarray(v[5:]) * 1e3
    print(f"{k:10s} median {np.median(v):7.2f} ms  mean {v.mean():7.2f} ms")
print(f"frame      median {np.median(np.asarray(ft[5:])*1e3):7.2f} ms")
