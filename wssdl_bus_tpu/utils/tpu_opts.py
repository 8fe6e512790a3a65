"""Measured TPU compiler options for the hot programs (leaf module).

The r05 XLA compiler-option sweep (``tools/sweep_xla_flags.py``, v5e via
the axon relay, 2026-08-21, recorded in tools/PROBES.md "XLA
compiler-option sweep") found exactly two reproducible wins, each
specific to one program class:

- SERVING inference: ``xla_tpu_scoped_vmem_limit_kib=65536`` — 288.0
  img/s vs 277.5 base on the b32 VGG pipeline (+3.8%), a sharp optimum
  (48 MiB 278.5, 56 MiB 282.0, 64 MiB 288.0+288.0, 72 MiB 282.7,
  80 MiB 278.2, 96 MiB 282.0, 128 MiB 280.5).  The same raise HURTS the
  train step (64 MiB: 22.9 vs 23.4 base; 128 MiB: 20.2), so it must not
  be applied process-wide.
- TRAIN step: ``xla_tpu_enable_multi_level_nested_loop_fusion=true`` —
  23.9/24.1 it/s vs 23.4/23.6 base (+2%), neutral on serving.

Everything else measured neutral (latency-hiding scheduler, licm ratio,
dot-strength-reduction, rwb fusion, dot-dot fusion, async-copy
bandwidth scale, broadcast priority) or negative (fusion cost model
-5%, ``xla_jf_conv_full_precision`` 3x — confirming the default bf16
conv passes).  Options reach the remote TPU compiler per-program via
``jax.jit(compiler_options=...)``; the local OSS XLA build rejects
every ``--xla_tpu_*`` name in ``XLA_FLAGS``, so per-program application
is also the only way to give serving and train different options in one
process.

Env overrides: ``WSSDL_SERVING_VMEM_KIB`` (KiB; 0/empty disables),
``WSSDL_TRAIN_FLM`` (0 disables).  Off-TPU both helpers return ``None``
(the CPU compiler rejects unknown TPU option names).
"""

import functools
import os


def _on_tpu() -> bool:
    """True when jax's default backend is a TPU.

    Evaluated lazily (first traced call), never at import: querying
    devices initializes the backend, and callers (tests/conftest.py)
    must be able to pick the platform first.  Not cached — test
    processes legitimately flip platforms between fixtures, and the
    result is only consulted once per lazy jit anyway.
    """
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def serving_compiler_options():
    """Compiler options for SERVING inference programs (or ``None``)."""
    kib = os.environ.get("WSSDL_SERVING_VMEM_KIB", "65536")
    if not kib or kib == "0" or not _on_tpu():
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


def train_compiler_options():
    """Compiler options for TRAIN step programs (or ``None``)."""
    if os.environ.get("WSSDL_TRAIN_FLM", "1") == "0" or not _on_tpu():
        return None
    return {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}


def _tracing(args, kwargs) -> bool:
    """True when called under an active jax trace."""
    try:
        from jax._src.core import trace_state_clean

        return not trace_state_clean()
    except Exception:  # private API moved: fall back to a tracer-arg scan
        import jax

        return any(isinstance(leaf, jax.core.Tracer)
                   for leaf in jax.tree_util.tree_leaves((args, kwargs)))


class lazy_jit:  # noqa: N801 — decorator, reads like jax.jit
    """``jax.jit`` deferred to the first call so ``compiler_options`` can
    depend on the active backend (a class-body decorator runs at import,
    before any backend exists).

    One underlying PjitFunction per decorated function — class-level use
    keeps the static-``self`` jit cache shared across value-equal
    engines exactly like a plain ``@partial(jax.jit, static_argnums=(0,))``
    (tests/test_engine.py:test_engine_value_identity).  Attribute access
    (``_cache_size`` etc.) forwards to the jit object.
    """

    def __init__(self, opts_fn=None, **jit_kwargs):
        self._opts_fn = opts_fn
        self._jit_kwargs = jit_kwargs
        self._fn = None
        self._jit = None

    def __call__(self, *args, **kwargs):
        if self._fn is None:  # decorating: @lazy_jit(opts_fn, ...) \n def f
            (self._fn,) = args
            functools.update_wrapper(self, self._fn)
            return self
        if _tracing(args, kwargs):
            # called inside an enclosing jit/scan/vmap trace: inline the
            # plain function — a nested jit inlines anyway, and jax
            # REJECTS compiler_options on non-top-level jits (the
            # enclosing program's options govern)
            return self._fn(*args, **kwargs)
        return self._ensure()(*args, **kwargs)

    def _ensure(self):
        if self._jit is None:
            import jax

            opts = self._opts_fn() if self._opts_fn is not None else None
            self._jit = jax.jit(self._fn, compiler_options=opts,
                                **self._jit_kwargs)
        return self._jit

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        return functools.partial(self, obj)

    def __getattr__(self, name):
        # only reached for names not on the wrapper itself
        return getattr(self._ensure(), name)
