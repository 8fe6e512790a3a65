"""Real-TPU validation + timing of the fused stem-TAIL kernel
(ops/conv2_pool_pallas.py: conv1_2 + relu + 2x2 maxpool).

Checks vgg_conv2_pool against the XLA tail on device (bf16-rounding
tolerance on raw f32 inputs, f32-roundoff on bf16-rounded inputs), then
races three full-stem strategies at serving shape with the
chained-dispatch protocol (bench.py methodology notes):

  * the plain XLA stem (conv1_1 + conv1_2 + pool, what the trunk builds);
  * XLA conv1_1 + the Pallas tail (the production dispatch);
  * the full fused stem kernel (ops/conv1_pallas.py), for the record.

    python tools/check_stem_tail_tpu.py [--batch 8] [--iters 30]
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
    from wssdl_bus_tpu.ops.conv1_pallas import (fused_stem_ok,
                                                vgg_stem_fused,
                                                vgg_stem_reference)
    from wssdl_bus_tpu.ops.conv2_pool_pallas import (conv2_pool_ok,
                                                     vgg_conv1_1,
                                                     vgg_conv2_pool)

    rng = np.random.RandomState(0)
    nb, H, W = args.batch, 608, 800
    os.environ["WSSDL_STEM_TAIL"] = "1"  # the kernel is opt-in (demoted:
    # measured slower end-to-end, conv2_pool_pallas.py STATUS) — this tool
    # exists precisely to measure it, so force the gate open
    ok = conv2_pool_ok((nb, H, W, 64))
    print("conv2_pool_ok:", ok, "backend:", jax.default_backend())
    if not ok:
        print("SKIP: stem tail not eligible here (needs a TPU backend and "
              "an eligible shape)")
        return

    w1 = jax.device_put((rng.randn(3, 3, 3, 64) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w2 = jax.device_put((rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b2 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))

    # correctness on a small feature map first
    from wssdl_bus_tpu.ops.conv2_pool_pallas import vgg_conv2_pool_reference
    a1s = jax.device_put(
        np.abs(rng.randn(2, 64, 96, 64)).astype(np.float32))
    ref = np.asarray(vgg_conv2_pool_reference(a1s, w2, b2))
    out = np.asarray(vgg_conv2_pool(a1s, w2, b2))
    err = np.abs(out - ref)
    rms = float(np.sqrt((err ** 2).mean()) / np.sqrt((ref ** 2).mean()))
    print(f"small-map: max abs {err.max():.5f}  rms rel {rms:.5f}")
    assert rms < 0.01, "stem tail diverges from the XLA tail"

    datas = [jax.device_put(rng.rand(nb, H, W, 3).astype(np.float32))
             for _ in range(2)]

    @jax.jit
    def s_ref(c, x):
        y = vgg_stem_reference(x + c * 1e-9, w1, b1, w2, b2)
        return c + y[0, 0, 0, 0] * 1e-9

    @jax.jit
    def s_tail(c, x):
        a1 = vgg_conv1_1(x + c * 1e-9, w1, b1, out_dtype=jnp.bfloat16)
        y = vgg_conv2_pool(a1, w2, b2)
        return c + y[0, 0, 0, 0] * 1e-9

    dt_r = timed(s_ref, datas, args.iters)
    dt_t = timed(s_tail, datas, args.iters)
    print(f"XLA stem        b{nb}: {dt_r * 1e3:8.2f} ms "
          f"({dt_r / nb * 1e3:6.3f} ms/img)")
    print(f"conv1_1 + tail  b{nb}: {dt_t * 1e3:8.2f} ms "
          f"({dt_t / nb * 1e3:6.3f} ms/img)  speedup {dt_r / dt_t:4.2f}x")

    os.environ["WSSDL_FUSED_STEM"] = "1"
    if fused_stem_ok((nb, H, W, 3)):
        @jax.jit
        def s_fused(c, x):
            y = vgg_stem_fused(x + c * 1e-9, w1, b1, w2, b2)
            return c + y[0, 0, 0, 0] * 1e-9

        dt_f = timed(s_fused, datas, args.iters)
        print(f"full fused stem b{nb}: {dt_f * 1e3:8.2f} ms "
              f"({dt_f / nb * 1e3:6.3f} ms/img)  vs tail "
              f"{dt_f / dt_t:4.2f}x")


if __name__ == "__main__":
    main()
