import time
import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
img = jnp.asarray(np.random.rand(H, W).astype(np.float32) * 255)

base = jax.jit(lambda x: jnp.sum(x))
np.asarray(base(img))
t0 = time.perf_counter()
for _ in range(10):
    np.asarray(base(img))
RTT = (time.perf_counter() - t0) / 10 * 1e3
print(f"RTT {RTT:.1f} ms")


def timeit(name, f, *args, n=5):
    jf = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), f(*a))))
    np.asarray(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(jf(*args))
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3 - RTT:8.2f} ms")


from planarslam_tpu.ops.image import blur, gaussian_kernel_1d

timeit("blur conv 7x7", blur, img)


def blur_shift(x, ksize=7, sigma=2.0):
    k = gaussian_kernel_1d(ksize, sigma)
    pad = ksize // 2
    xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    acc = 0.
    for i in range(ksize):
        acc = acc + float(k[i]) * jax.lax.dynamic_slice_in_dim(xp, i, x.shape[0], 0)
    xp = jnp.pad(acc, ((0, 0), (pad, pad)), mode="edge")
    acc2 = 0.
    for i in range(ksize):
        acc2 = acc2 + float(k[i]) * jax.lax.dynamic_slice_in_dim(xp, i, x.shape[1], 1)
    return acc2

timeit("blur shift-add", blur_shift, img)
a = np.asarray(blur(img)); b = np.asarray(blur_shift(img))
print("blur diff:", np.abs(a - b).max())

# batched 3x3 eigh
covs = jnp.asarray(np.random.rand(4800, 3, 3).astype(np.float32))
covs = covs @ covs.transpose(0, 2, 1) + 0.1 * jnp.eye(3)
timeit("eigh 4800x3x3", jnp.linalg.eigh, covs)

# top_k over 307k
flat = img.reshape(-1)
big = jnp.concatenate([flat] * 1)
timeit("top_k 307k k=6144", lambda x: jax.lax.top_k(x, 6144), big)
timeit("top_k 307k k=1024", lambda x: jax.lax.top_k(x, 1024), big)

# scan longest-run 64x96
occ = jnp.asarray(np.random.rand(64, 96) > 0.5)
def longest_run(occ_row):
    def body(carry, o):
        cur, best, best_end, idx = carry
        cur = jnp.where(o, cur + 1, 0)
        better = cur > best
        best = jnp.where(better, cur, best)
        best_end = jnp.where(better, idx, best_end)
        return (cur, best, best_end, idx + 1), None
    (cur, best, best_end, _), _ = jax.lax.scan(
        body, (jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(0)), occ_row)
    return best, best_end
timeit("scan longest_run 64x96", jax.vmap(longest_run), occ)

# pose_opt cost under jit
from planarslam_tpu.config import SystemConfig
from planarslam_tpu.solvers import pose_opt
cfg = SystemConfig()
w = pose_opt.PoseOptWeights.from_config(cfg.planes)
K = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx, cfg.camera.cy)
Kp = cfg.orb.max_keypoints
obs = pose_opt.PointObs(xw=jnp.zeros((Kp, 3)), uv=jnp.zeros((Kp, 2)),
                        u_right=jnp.full((Kp,), -1.0),
                        inv_sigma2=jnp.ones((Kp,)),
                        valid=jnp.ones((Kp,), bool))
timeit("pose_optimize", lambda o: pose_opt.pose_optimize(
    jnp.eye(4), K, cfg.camera.bf, points=o, weights=w).T_cw, obs)

# plane pixel refinement one_hot matmul
pts = jnp.asarray(np.random.rand(H * W, 3).astype(np.float32))
nc = jnp.asarray(np.random.rand(8, 3).astype(np.float32))
def refine(pts, nc):
    d = jnp.abs(pts @ nc.T + 0.1)
    best = jnp.argmin(d, -1)
    oh = jax.nn.one_hot(best, 9, dtype=jnp.float32)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    feats = jnp.stack([x, y, z, x*x, x*y, x*z, y*y, y*z, z*z,
                       jnp.ones_like(x)], -1)
    return oh.T @ feats
timeit("plane pixel refine", refine, pts, nc)

from planarslam_tpu.ops import manhattan as m_ops
nrm = jnp.asarray(np.random.rand(H//2 * W//2, 3).astype(np.float32))
nv = jnp.ones((H//2 * W//2,), bool)
timeit("manhattan", lambda n, v: m_ops.track_manhattan_frame(
    jnp.eye(3), n, v, cone_sin=cfg.manhattan.cone_sin_track,
    kernel=cfg.manhattan.mean_shift_kernel,
    min_support=cfg.manhattan.min_axis_support), nrm, nv)
