"""planarslam_tpu — a TPU-native RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PlanarSLAM
(yanyan-li/PlanarSLAM, ICRA'21 "RGB-D SLAM with Structural Regularities"):
point / line / plane landmarks, Manhattan-frame rotation tracking,
rotation-decoupled translation estimation, structural (parallel /
perpendicular plane) constraints in the optimizers, loop closing, and
planar-mesh reconstruction.

Design stance (see SURVEY.md §7):
  - arrays, not object graphs: the map is a struct-of-arrays pytree of
    fixed-capacity device tensors with validity masks;
  - host orchestrates, device computes: the per-frame state machine is
    host Python, every O(pixels)/O(features^2)/O(iterations) block is a
    jitted kernel;
  - batched from day one: per-frame kernels are written single-frame and
    vmap/shard_map-composable for multi-sequence replay across chips.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compile cache: the fused per-frame program takes minutes
# to compile on a weak host CPU; caching it makes every process after the
# first (bench runs, CLI runs, profilers) start hot. Opt out by setting
# JAX_COMPILATION_CACHE_DIR="" in the environment. The path is per-user
# (a world-shared /tmp dir could be pre-owned/poisoned by another user),
# and the setdefault only takes effect if this package is imported BEFORE
# jax — jax reads the env var at its own import.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "planarslam_jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax as _jax

# Geometry/solver math is precision-critical (float32 poses, metre-scale
# scenes): keep MXU matmuls at float32 unless a kernel opts into bf16
# explicitly via preferred_element_type / precision arguments.
_jax.config.update("jax_default_matmul_precision", "highest")

from planarslam_tpu.config import SystemConfig, load_yaml_config  # noqa: F401
