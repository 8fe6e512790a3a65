"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths compile and run without TPU hardware (the standard JAX approach)."""

import os

# Force the CPU backend: the ambient environment points JAX at a TPU tunnel
# (registered by a sitecustomize hook before pytest even loads), so plain env
# vars are not enough — override the jax config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep subprocesses off the tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: OPT-IN for tests via
# WSSDL_JAX_CACHE_DIR=<dir>.  Enabling it by default made the full suite
# segfault/abort inside jax's cache write (executable.serialize() in
# compilation_cache.put_executable_and_time, XLA:CPU, jax 0.9.0) after
# ~150 tests — reproduced twice at different tests, never in short runs.
# Cached reruns of the slow suites start in seconds when opted in; the
# default lane relies on `-m "not slow"` for wall time instead.
if os.environ.get("WSSDL_JAX_CACHE_DIR"):
    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache

    enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(3)
