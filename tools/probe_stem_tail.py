"""Decompose the stem-tail composite (tools/check_stem_tail_tpu.py showed
conv1_1 + vgg_conv2_pool at 2.50 ms/img vs 2.03 for the XLA stem).

Pieces timed (chained-dispatch protocol, one jit each):

  conv11_f32   conv1_1 + relu, f32 out (124 MB/img write)
  conv11_bf16  conv1_1 + relu + bf16 cast fused (62 MB/img write)
  assemble     the th/a1c/bh halo assembly from a prebuilt bf16 a1
  kernel       pallas_call alone on prebuilt th/a1c/bh
  tail         cast + assembly + kernel from a prebuilt f32 a1
  xla_tail     conv1_2 + relu + pool in XLA from the same f32 a1

    python tools/probe_stem_tail.py [--batch 8] [--iters 30]
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
    from wssdl_bus_tpu.ops import conv2_pool_pallas as cp

    rng = np.random.RandomState(0)
    nb, H, W = args.batch, 608, 800
    R = cp.R
    nch, m2, halo = H // R, R * W, W + 8
    print("backend:", jax.default_backend(), "R:", R)

    w1 = jax.device_put((rng.randn(3, 3, 3, 64) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w2 = jax.device_put((rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b2 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))

    xs = [jax.device_put(rng.rand(nb, H, W, 3).astype(np.float32))
          for _ in range(2)]
    a1s = [jax.device_put(np.asarray(
        cp.vgg_conv1_1(x, w1, b1))) for x in xs]

    def assemble(a1):
        a1c = a1.astype(jnp.bfloat16).reshape(nb, nch, m2, 64)
        zer = jnp.zeros((nb, 1, halo, 64), jnp.bfloat16)
        th = jnp.concatenate([zer, a1c[:, :-1, m2 - halo:, :]], axis=1)
        bh = jnp.concatenate([a1c[:, 1:, :halo, :], zer], axis=1)
        return th, a1c, bh

    th0, a1c0, bh0 = jax.jit(assemble)(a1s[0])
    th0, a1c0, bh0 = map(jax.device_put, map(np.asarray, (th0, a1c0, bh0)))
    w2m = jax.device_put(np.asarray(
        jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 192, 64)
           .astype(jnp.bfloat16)))
    b2m = jax.device_put(np.asarray(b2.reshape(1, 64)))

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def raw_kernel(th, a1c, bh):
        kern = functools.partial(cp._tail_kernel, w=W, halo=halo)
        return pl.pallas_call(
            kern,
            grid=(nb, nch),
            in_specs=[
                pl.BlockSpec((1, 1, halo, 64), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, m2, 64), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, halo, 64), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2 * halo + m2, 64), jnp.float32)],
            out_specs=pl.BlockSpec((1, R // 2, W // 2, 64),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, H // 2, W // 2, 64),
                                           jnp.float32),
        )(th, a1c, bh, w2m, b2m)

    variants = {
        "conv11_f32": (lambda c, x: c + cp.vgg_conv1_1(
            x + c * 1e-9, w1, b1)[0, 0, 0, 0] * 1e-9, xs),
        "conv11_bf16": (lambda c, x: c + cp.vgg_conv1_1(
            x + c * 1e-9, w1, b1).astype(jnp.bfloat16)[0, 0, 0, 0]
            .astype(jnp.float32) * 1e-9, xs),
        "assemble": (lambda c, a: c + assemble(
            a + c * 1e-9)[0][0, -1, 0, 0].astype(jnp.float32) * 1e-9, a1s),
        "kernel": (lambda c, a1c: c + raw_kernel(
            th0, a1c + (c * 1e-9).astype(jnp.bfloat16), bh0)
            [0, 0, 0, 0] * 1e-9,
            [a1c0, jax.device_put(np.asarray(a1c0) * np.float32(0.5))]),
        "tail": (lambda c, a: c + cp.vgg_conv2_pool(
            a + c * 1e-9, w2, b2)[0, 0, 0, 0] * 1e-9, a1s),
        "xla_tail": (lambda c, a: c + cp.vgg_conv2_pool_reference(
            a + c * 1e-9, w2, b2)[0, 0, 0, 0] * 1e-9, a1s),
    }
    for name, (fn, data) in variants.items():
        try:
            dt = timed(jax.jit(fn), data, args.iters)
            print(f"{name:12s} {dt * 1e3:8.2f} ms  "
                  f"({dt / nb * 1e3:6.3f} ms/img)")
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
