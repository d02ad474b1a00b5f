"""Test configuration.

Forces CPU with 8 virtual devices so multi-chip sharding paths compile and
execute without TPU hardware, and enables the persistent compilation cache
(first full run pays one-time XLA compiles; reruns are seconds).

Tip: when the container injects the `axon` PJRT sitecustomize via PYTHONPATH,
`env -u PYTHONPATH python -m pytest tests/` skips plugin registration and
shaves per-compile overhead on cold caches.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The container's axon sitecustomize leaves matmul precision at a bf16-class
# default; geometry kernels need full fp32 contractions.
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lv_slam_jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# Plugins may have imported jax before this conftest ran, in which case the
# env vars above were read too late and tests would silently target the
# tunneled TPU (slow remote compiles + transfers). Config updates are applied
# post-import, before any backend is initialized, so they always win.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_sequence():
    """A short synthetic HDL-64 sequence shared across tests."""
    from lv_slam_tpu.io import synthetic

    scans, poses, world = synthetic.make_sequence(
        6, seed=3, trajectory="figure8", step=1.0, n_rings=32, n_azimuth=450
    )
    return scans, poses, world


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
