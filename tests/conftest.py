"""Test configuration.

Device tests run on a virtual 8-device CPU mesh (multi-chip shardings are
validated without TPU hardware, per the build contract); host-layer tests
never touch JAX.  Must set env vars before anything imports jax.
"""

import os

# The environment ships JAX_PLATFORMS=axon (one tunneled TPU chip); tests
# must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

import pytest  # noqa: E402

from zkecdsa_tpu.utils import rng  # noqa: E402


@pytest.fixture(autouse=True)
def deterministic_rng():
    """Every test runs on a reproducible random tape."""
    with rng.deterministic(0xC0FFEE):
        yield


def pytest_configure(config):
    # Persistent XLA compilation cache: the limb/curve kernels are large
    # graphs; caching makes repeated test runs cheap.
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
