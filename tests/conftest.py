"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated the way JAX projects do it — CPU
devices standing in for a slice (SURVEY.md §4). Pallas kernels run in
interpreter mode on CPU; real-TPU runs happen in benchmarks/driver.
Env vars must be set before jax is imported anywhere.
"""

import os

# The environment presets JAX_PLATFORMS=axon (TPU tunnel); tests must run
# on host CPU devices, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides the env var — override it back before
# any backend is initialized.
jax.config.update("jax_platforms", "cpu")
# 8 virtual devices on a small host: async CPU dispatch has intermittently
# livelocked inside device_put (100% CPU spin); synchronous dispatch is
# reliable and barely slower at test sizes.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The single-process full-suite run has intermittently SIGSEGV'd inside
    jax CPU pjit after ~130 green tests (r3 VERDICT weak #1) — hundreds of
    accumulated executables across 8 virtual devices; each file passes in
    isolation. Clearing jit/pjit caches at module teardown bounds that
    accumulation. Costs only recompiles across module boundaries (~tens of
    seconds over an ~11-minute suite)."""
    yield
    jax.clear_caches()
