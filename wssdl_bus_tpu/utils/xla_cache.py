"""Persistent XLA compilation cache (leaf module: no heavy imports).

A cold run spends minutes compiling the fused train/eval/inference programs
on the remote-attached TPU; cached, later runs of the same canvas/budgets
start in seconds.  (The reference has no analog — TF1 sessions rebuilt the
graph per process too, but its graph construction was cheap because all
detection ops ran as py_funcs.)
"""

import os


def _host_fingerprint() -> str:
    """A short tag identifying the host CPU's ISA feature set.

    The XLA:CPU AOT cache embeds the *compile-time* machine features; an
    entry written on one host and loaded on another with different features
    is at best a warning flood and at worst a SIGILL.  Scoping the cache
    directory by a feature-set hash keeps entries host-compatible (the
    shared home directory travels across driver hosts)."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    tag = hashlib.sha1(feats.encode()).hexdigest()[:10]
    return f"{platform.machine()}-{tag}"


def enable_compilation_cache():
    """Point JAX's persistent compilation cache at a package-scoped default
    (keyed by a host-CPU fingerprint — see ``_host_fingerprint``).

    Respects configuration the host process already made: if
    ``jax_compilation_cache_dir`` is set (via ``jax.config.update`` or the
    ``JAX_COMPILATION_CACHE_DIR`` env var) this is a no-op.  Override the
    default location with ``WSSDL_JAX_CACHE_DIR``; set it empty to disable.
    """
    cache = os.environ.get(
        "WSSDL_JAX_CACHE_DIR",
        os.path.expanduser(
            f"~/.cache/wssdl_bus_tpu/jax-cache-{_host_fingerprint()}"))
    if not cache or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # the host already configured a cache; don't clobber it
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache disabled: {e}")
