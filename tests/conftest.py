"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference CI's threads-{1,2,16} matrix role (SURVEY §4):
results must be invariant under device-count / sharding choices, so
tests run on 8 virtual CPU devices and sharded paths are exercised
against single-device results.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import jax
import pytest

# persistent compile cache: the u64-heavy kernels are slow to build on
# the CPU backend; cache across pytest runs
jax.config.update("jax_compilation_cache_dir", "/tmp/kmerdb_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_test_dir():
    d = REFERENCE_ROOT / "test"
    if not d.exists():
        pytest.skip("reference test fixtures not available")
    return d
