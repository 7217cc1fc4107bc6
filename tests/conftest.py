"""Test configuration: force an 8-device virtual CPU platform.

Must run before any jax import (pytest imports conftest first).  All tests
run on CPU with 8 virtual devices so mesh/sharding/psum paths are exercised
without TPU hardware (SURVEY.md §4.4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The session environment pins JAX_PLATFORMS=axon (TPU); tests must run on
# the virtual 8-device CPU platform, and config.update wins over the env.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: repeated test runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/cnf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
