"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference CI's threads-{1,2,16} matrix role (SURVEY §4):
results must be invariant under device-count / sharding choices, so
tests run on 8 virtual CPU devices and sharded paths are exercised
against single-device results.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize registers the tunneled TPU plugin whenever
# PALLAS_AXON_POOL_IPS is set and then REWRITES jax_platforms to
# "axon,cpu" — so a CPU-only test process still initializes the remote
# client, and hangs for minutes whenever the shared service stalls
# (measured 2026-08-17: plain `jax.devices()` held >4 min).  Dropping
# the variable before jax import keeps the suite service-independent;
# the compiled-on-hardware tests (test_tpu_hardware.py) spawn their
# own subprocesses with a clean env and are the only TPU-touching
# path.
_axon_ips = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
if _axon_ips is not None:
    # stashed so the compiled-on-hardware suite's clean-env subprocesses
    # can re-register the tunneled TPU plugin (test_tpu_hardware._clean_env)
    os.environ["KMERDB_STASHED_AXON_IPS"] = _axon_ips

import pathlib

import jax
import pytest

# The axon sitecustomize force-registers its TPU plugin and rewrites
# jax_platforms; override back to an 8-device virtual CPU mesh (env vars
# alone are too late — jax is imported at interpreter start).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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
