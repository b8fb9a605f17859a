"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware available); bench.py runs on the real chip instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: repeated test runs skip recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env vars above are ignored if an environment hook (TPU-tunnel
# sitecustomize) already overrode jax_platforms programmatically at
# interpreter start; config.update wins while no backend is initialized.
import jax  # noqa: E402

try:
    from jax._src import xla_bridge as _xb

    if not _xb.backends_are_initialized():
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (excluded from the quick tier)")


@pytest.fixture(scope="session")
def tiny_config():
    from planarslam_tpu.config import SystemConfig

    return SystemConfig.tiny()


@pytest.fixture(scope="session")
def tiny_sequence():
    from planarslam_tpu.io import synthetic

    cfg_wh = (160, 120)
    return synthetic.make_sequence(n_frames=12, width=cfg_wh[0], height=cfg_wh[1])


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
