"""Real-TPU validation + timing of the fused VGG stem kernel.

Checks vgg_stem_fused against the XLA stem on device (bf16-rounding
tolerance), then races both at serving shape with the chained-dispatch
protocol (see bench.py methodology notes).

    python tools/check_stem_tpu.py [--batch 8] [--iters 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args_list, iters, warmup=3):
    c = jnp.float32(0.0)
    for i in range(warmup):
        c = fn(c, args_list[i % len(args_list)])
    float(c)
    t0 = time.perf_counter()
    for i in range(iters):
        c = fn(c, args_list[i % len(args_list)])
    float(c)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()
    from wssdl_bus_tpu.ops.conv1_pallas import (vgg_stem_fused,
                                               vgg_stem_reference,
                                               fused_stem_ok)

    os.environ.setdefault("WSSDL_FUSED_STEM", "1")  # the tool measures it
    rng = np.random.RandomState(0)
    nb, H, W = args.batch, 608, 800
    ok = fused_stem_ok((nb, H, W, 3))
    print("fused_stem_ok:", ok, "backend:", jax.default_backend())
    if not ok:
        print("SKIP: fused stem not eligible here (needs a TPU backend and "
              "an eligible [B, H, W, 3] shape); nothing to measure")
        return

    w1 = jax.device_put((rng.randn(3, 3, 3, 64) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w2 = jax.device_put((rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b2 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))

    # correctness on a small image first
    xs = jax.device_put(rng.randn(2, 64, 96, 3).astype(np.float32))
    ref = np.asarray(vgg_stem_reference(xs, w1, b1, w2, b2))
    out = np.asarray(vgg_stem_fused(xs, w1, b1, w2, b2))
    err = np.abs(out - ref)
    rms = float(np.sqrt((err ** 2).mean()) / np.sqrt((ref ** 2).mean()))
    print(f"small-image: max abs {err.max():.5f}  rms rel {rms:.5f}")
    assert rms < 0.01, "fused stem diverges from the XLA stem"

    datas = [jax.device_put(rng.rand(nb, H, W, 3).astype(np.float32))
             for _ in range(2)]

    @jax.jit
    def s_ref(c, x):
        y = vgg_stem_reference(x + c * 1e-9, w1, b1, w2, b2)
        return c + y[0, 0, 0, 0] * 1e-9

    @jax.jit
    def s_fused(c, x):
        y = vgg_stem_fused(x + c * 1e-9, w1, b1, w2, b2)
        return c + y[0, 0, 0, 0] * 1e-9

    dt_r = timed(s_ref, datas, args.iters)
    dt_f = timed(s_fused, datas, args.iters)
    print(f"XLA stem   b{nb}: {dt_r * 1e3:8.2f} ms ({dt_r / nb * 1e3:6.3f} "
          f"ms/img)")
    print(f"fused stem b{nb}: {dt_f * 1e3:8.2f} ms ({dt_f / nb * 1e3:6.3f} "
          f"ms/img)  speedup {dt_r / dt_f:4.2f}x")


if __name__ == "__main__":
    main()
