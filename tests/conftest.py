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

# Persistent XLA compilation cache (same recipe as __graft_entry__.py): the
# engine/parallel/CLI suites pay multi-minute cold compiles; cached reruns
# start in seconds.  Opt out with WSSDL_JAX_CACHE_DIR="".
from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(3)
