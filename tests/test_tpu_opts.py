"""utils/tpu_opts.py: measured per-program TPU compiler options and the
lazy-jit descriptor that applies them (r05 flag sweep — tools/PROBES.md
"XLA compiler-option sweep")."""

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.utils import tpu_opts
from wssdl_bus_tpu.utils.tpu_opts import (lazy_jit, serving_compiler_options,
                                          train_compiler_options)


def test_options_none_off_tpu():
    # the suite runs on CPU: both helpers must return None (the CPU
    # compiler rejects unknown TPU option names)
    assert jax.devices()[0].platform != "tpu"
    assert serving_compiler_options() is None
    assert train_compiler_options() is None


def test_options_on_tpu(monkeypatch):
    monkeypatch.setattr(tpu_opts, "_on_tpu", lambda: True)
    assert serving_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}
    assert train_compiler_options() == {
        "xla_tpu_enable_multi_level_nested_loop_fusion": "true"}


def test_env_overrides(monkeypatch):
    monkeypatch.setattr(tpu_opts, "_on_tpu", lambda: True)
    monkeypatch.setenv("WSSDL_SERVING_VMEM_KIB", "98304")
    assert serving_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "98304"}
    monkeypatch.setenv("WSSDL_SERVING_VMEM_KIB", "0")
    assert serving_compiler_options() is None
    monkeypatch.setenv("WSSDL_TRAIN_FLM", "0")
    assert train_compiler_options() is None


def test_lazy_jit_free_function():
    calls = []

    def opts():
        calls.append(1)
        return None

    @lazy_jit(opts)
    def f(x):
        return x * 2 + 1

    # options are computed lazily, once, at first call
    assert not calls
    np.testing.assert_allclose(f(jnp.float32(3.0)), 7.0)
    np.testing.assert_allclose(f(jnp.float32(4.0)), 9.0)
    assert calls == [1]


def test_lazy_jit_method_binding_and_forwarding():
    class Box:
        def __init__(self, k):
            self.k = k

        def __hash__(self):
            return hash(self.k)

        def __eq__(self, other):
            return isinstance(other, Box) and self.k == other.k

        @lazy_jit(lambda: None, static_argnums=(0,))
        def scale(self, x):
            return x * self.k

    b = Box(3.0)
    np.testing.assert_allclose(b.scale(jnp.float32(2.0)), 6.0)
    # class-level attribute access forwards to the underlying PjitFunction
    # (tests/test_engine.py uses Engine.train_step._cache_size())
    before = Box.scale._cache_size()
    # a value-equal twin must hit the shared static-self jit cache
    np.testing.assert_allclose(Box(3.0).scale(jnp.float32(5.0)), 15.0)
    assert Box.scale._cache_size() == before
    assert Box(4.0).scale(jnp.float32(5.0)) == 20.0
    assert Box.scale._cache_size() == before + 1
