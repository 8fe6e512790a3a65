"""Trunk-only decomposition of the int8 serving win: times the f32 VGG
trunk, the int8 trunk, and an s8-vs-bf16 conv microbenchmark on the
current backend (chained-dispatch protocol, see bench.py).

Answers: does XLA lower `conv_general_dilated(s8, s8,
preferred_element_type=int32)` to the doubled-rate int8 MXU path on this
chip, and how much of the int8 pipeline's time is the quantize /
dequantize elementwise traffic vs the convs themselves?

Run from the repo root on the TPU-attached host:

    python tools/profile_int8_trunk.py [--batch 8] [--iters 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import build_detector
from wssdl_bus_tpu.models.quantize import quant_trunk_apply
from wssdl_bus_tpu.train.engine import Engine


def timed(fn, args_list, iters, warmup=3):
    """Chained-dispatch timing: fn(c, x) -> scalar carry."""
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

    cfg = Config()
    canvas = (608, 800)
    model = build_detector("VGGnet_train", num_classes=3)
    eng = Engine(model, cfg, canvas)
    variables, _ = eng.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    nb = args.batch
    datas = [jax.device_put(rng.rand(nb, *canvas, 3).astype(np.float32))
             for _ in range(4)]
    qtrunk = eng.quantize_for_serving(variables, [datas[0]])

    trunk = model._trunk(train=False)

    @jax.jit
    def f32_trunk(c, data):
        feat, cls, _ = trunk.apply(variables["trunk"], data + c * 1e-9)
        return c + cls[0, 0, 0, 0] * 1e-9

    @jax.jit
    def int8_trunk(c, data):
        feat, cls, _ = quant_trunk_apply(qtrunk, data + c * 1e-9)
        return c + cls[0, 0, 0, 0] * 1e-9

    dt_f = timed(f32_trunk, datas, args.iters)
    dt_q = timed(int8_trunk, datas, args.iters)
    print(f"f32 trunk+rpn  b{nb}: {dt_f * 1e3:8.2f} ms "
          f"({dt_f / nb * 1e3:6.2f} ms/img)")
    print(f"int8 trunk+rpn b{nb}: {dt_q * 1e3:8.2f} ms "
          f"({dt_q / nb * 1e3:6.2f} ms/img)  "
          f"speedup {dt_f / dt_q:4.2f}x")

    # conv microbenchmark at a VGG-conv5-like shape: C=512, 38x50 grid,
    # and at a conv3-like shape: C=256, 152x200
    for (h, w, cio) in ((152, 200, 256), (38, 50, 512)):
        xs8 = [jax.device_put(rng.randint(-127, 128, (nb, h, w, cio))
                              .astype(np.int8)) for _ in range(2)]
        xbf = [x.astype(jnp.bfloat16) for x in xs8]
        ks8 = jax.device_put(
            rng.randint(-127, 128, (3, 3, cio, cio)).astype(np.int8))
        kbf = ks8.astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(
            (nb, h, w, cio), ks8.shape, ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_s8(c, x):
            y = jax.lax.conv_general_dilated(
                (x.astype(jnp.int32) + c.astype(jnp.int32) * 0).astype(jnp.int8),
                ks8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return c + y[0, 0, 0, 0].astype(jnp.float32) * 1e-9

        @jax.jit
        def conv_bf(c, x):
            y = jax.lax.conv_general_dilated(
                x + c.astype(jnp.bfloat16) * 1e-9, kbf, (1, 1), "SAME",
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return c + y[0, 0, 0, 0] * 1e-9

        dt8 = timed(conv_s8, xs8, args.iters)
        dtb = timed(conv_bf, xbf, args.iters)
        flops = 2 * nb * h * w * cio * cio * 9
        print(f"conv {h}x{w}x{cio}: s8 {dt8 * 1e3:7.2f} ms "
              f"({flops / dt8 / 1e12:6.1f} TOP/s)   "
              f"bf16 {dtb * 1e3:7.2f} ms ({flops / dtb / 1e12:6.1f} TF/s)"
              f"   s8/bf16 {dtb / dt8:4.2f}x")


if __name__ == "__main__":
    main()
