"""Decompose the VGG conv1 stem cost and race XLA-level alternatives.

profile_vgg_blocks.py showed the conv1 block (conv1_1 3->64, conv1_2
64->64, 2x2 pool, all at full 608x800 resolution) costs ~1.7 ms/img —
~64% of the trunk.  Ideal cost is far lower: ~37.5 GF of compute
(~0.2-0.4 ms at the small-K MXU rates) plus 5.8 MB in / 31 MB out of
HBM traffic IF nothing round-trips the ~124 MB intermediates.  This
tool times each stage alone and a few alternative formulations so the
fused-stem kernel (ops/conv1_pallas.py) has an honest XLA baseline.

    python tools/profile_conv1.py [--batch 8] [--iters 30]
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

    rng = np.random.RandomState(0)
    nb = args.batch
    H, W = 608, 800
    xs3 = [jax.device_put(rng.rand(nb, H, W, 3).astype(np.float32))
           for _ in range(2)]
    xs64 = [jax.device_put(rng.rand(nb, H, W, 64).astype(np.float32))
            for _ in range(2)]
    w1 = jax.device_put(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    w2 = jax.device_put(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)

    def report(name, dt, flops=None):
        extra = f"  ({flops / dt / 1e12:6.1f} TF/s)" if flops else ""
        print(f"{name:28s}: {dt * 1e3:8.2f} ms ({dt / nb * 1e3:6.3f} "
              f"ms/img){extra}")

    def conv(x, w):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    # --- stage-by-stage -------------------------------------------------
    @jax.jit
    def s_conv11(c, x):
        y = jnp.maximum(conv(x + c * 1e-9, w1), 0.0)
        return c + y[0, 0, 0, 0] * 1e-9

    @jax.jit
    def s_conv12(c, x):
        y = jnp.maximum(conv(x + c * 1e-9, w2), 0.0)
        return c + y[0, 0, 0, 0] * 1e-9

    @jax.jit
    def s_pool(c, x):
        y = jax.lax.reduce_window(
            x + c * 1e-9, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
            (1, 2, 2, 1), "VALID")
        return c + y[0, 0, 0, 0] * 1e-9

    f11 = 2 * nb * H * W * 27 * 64
    f12 = 2 * nb * H * W * 9 * 64 * 64
    report("conv1_1 (XLA conv)", timed(s_conv11, xs3, args.iters), f11)
    report("conv1_2 (XLA conv)", timed(s_conv12, xs64, args.iters), f12)
    report("pool1 (reduce_window)", timed(s_pool, xs64, args.iters))

    # --- conv1_1 via explicit patches + matmul --------------------------
    @jax.jit
    def s_conv11_mm(c, x):
        p = jax.lax.conv_general_dilated_patches(
            x + c * 1e-9, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches channel order is (c, dy, dx) = w1 transposed accordingly
        wm = jnp.transpose(w1, (2, 0, 1, 3)).reshape(27, 64)
        y = jnp.maximum(jnp.einsum("bhwk,kc->bhwc", p, wm), 0.0)
        return c + y[0, 0, 0, 0] * 1e-9

    report("conv1_1 patches+matmul", timed(s_conv11_mm, xs3, args.iters),
           f11)

    # --- conv1_2 in bf16 ------------------------------------------------
    xb = [x.astype(jnp.bfloat16) for x in xs64]
    w2b = w2.astype(jnp.bfloat16)

    @jax.jit
    def s_conv12_bf(c, x):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w2b.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x + c.astype(jnp.bfloat16) * 1e-9, w2b, (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return c + jnp.maximum(y, 0.0)[0, 0, 0, 0] * 1e-9

    report("conv1_2 bf16 in/f32 out", timed(s_conv12_bf, xb, args.iters),
           f12)

    # --- whole stem as XLA composes it today ----------------------------
    @jax.jit
    def s_stem(c, x):
        a = jnp.maximum(conv(x + c * 1e-9, w1), 0.0)
        a = jnp.maximum(conv(a, w2), 0.0)
        a = jax.lax.reduce_window(a, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        return c + a[0, 0, 0, 0] * 1e-9

    report("stem (conv+conv+pool XLA)", timed(s_stem, xs3, args.iters),
           f11 + f12)


if __name__ == "__main__":
    main()
