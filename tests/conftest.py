"""Test harness backend setup.

Default (CPU) lanes: force the CPU backend — the ambient environment
points JAX at a TPU tunnel (registered by a sitecustomize hook before
pytest even loads), so plain env vars are not enough and the jax config
is overridden directly as well.

The 8-device virtual CPU mesh is forced ONLY when the selected tests
include ``mesh``-marked ones (a collection-time decision, made before the
backend initializes): the multi-chip sharding paths then compile and run
without TPU hardware (the standard JAX approach), while a pure
single-device selection keeps the host's full XLA thread pool and skips
the 8-way device setup entirely (r04 review, Weak #2).  Mixing mesh and
single-device tests in one invocation is still fine — single-device tests
pass under the 8-device mesh exactly as before.

TPU lane (hardware evidence, tests/tpu/): ``WSSDL_TPU_LANE=1 python -m
pytest tests/tpu -q`` — no CPU forcing, tests skip unless a real TPU is
attached.  See tests/tpu/conftest.py.
"""

import os

TPU_LANE = os.environ.get("WSSDL_TPU_LANE") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep subprocesses off the tunnel

import jax  # noqa: E402

if not TPU_LANE:
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


def pytest_collection_finish(session):
    """Decide the virtual device count from the FINAL test selection,
    before any test runs (and hence before the first backend init in the
    default lanes — module import at collection time never initializes a
    backend in this suite)."""
    if TPU_LANE:
        return
    if not any(item.get_closest_marker("mesh") for item in session.items):
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # initializes the CPU backend NOW, with the flag set; if some future
    # module-level code beats us to it, fail loudly rather than letting
    # every mesh test die on cryptic sharding errors
    assert jax.device_count() >= 8, (
        f"mesh tests selected but the JAX backend initialized with "
        f"{jax.device_count()} device(s) — something initialized the "
        "backend before tests/conftest.py could force the 8-device mesh")


@pytest.fixture
def rng():
    return np.random.RandomState(3)
