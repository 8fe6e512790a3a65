"""Real-TPU experiment: explicit bf16 activation-storage casts in the VGG
trunk are a NO-OP (recorded in models/vgg.py's precision note).

Measured here (v5e, batch 4, 608x800): trunk output BIT-IDENTICAL with the
casts on vs off, and wall time identical (15.16 vs 15.19 ms) — because
XLA's excess-precision elimination already demotes the whole conv/pool
chain (weights and activations) to bf16 storage in the optimized HLO
(749 bf16 occurrences with the casts OFF).  The standalone-stem win in
tools/probe_stem_xla.py (2.06 -> 1.35 ms/img) is an artifact of that
probe's jit output boundary pinning the final activation to f32.

Kept as the reproduction harness: an explicitly cast-inserting trunk
variant (parameter-compatible with VGG16Backbone) raced and diffed against
the production module.

    python tools/check_bf16_store_tpu.py [--batch 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timed(fn, args_list, iters=20, warmup=3):
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 800))
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(f"backend is {jax.default_backend()!r}, not tpu — the "
              "auto-demotion under test is a TPU lowering behavior.")
        return

    from wssdl_bus_tpu.models.layers import ConvBlock, max_pool
    from wssdl_bus_tpu.models.vgg import VGG16Backbone

    class CastedTrunk(nn.Module):
        """VGG16Backbone with explicit bf16 storage casts between the
        full-resolution stages (the variant shown to be redundant)."""

        @nn.compact
        def __call__(self, x):
            def conv(name, feats, inp):
                return ConvBlock(feats, kernel=3, stride=1, name=name,
                                 train=False)(inp)

            bf16 = lambda t: t.astype(jnp.bfloat16)  # noqa: E731
            x = bf16(conv("conv1_1", 64, x))
            x = bf16(conv("conv1_2", 64, x))
            x = max_pool(x, 2, 2, "VALID")
            x = bf16(conv("conv2_1", 128, x))
            x = bf16(conv("conv2_2", 128, x))
            x = max_pool(x, 2, 2, "VALID")
            x = conv("conv3_1", 256, x)
            x = conv("conv3_2", 256, x)
            x = conv("conv3_3", 256, x)
            x = max_pool(x, 2, 2, "VALID")
            x = conv("conv4_1", 512, x)
            x = conv("conv4_2", 512, x)
            x = conv("conv4_3", 512, x)
            x = max_pool(x, 2, 2, "VALID")
            x = conv("conv5_1", 512, x)
            x = conv("conv5_2", 512, x)
            x = conv("conv5_3", 512, x)
            return x.astype(jnp.float32)

    nb = args.batch
    rng = np.random.RandomState(0)
    xs = [jax.device_put(rng.rand(nb, *args.canvas, 3).astype(np.float32))
          for _ in range(2)]
    variables = VGG16Backbone(train=False).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    outs, times = {}, {}
    for name, mod in (("plain", VGG16Backbone(train=False)),
                      ("casted", CastedTrunk())):
        y = jax.jit(lambda x, mod=mod: mod.apply(variables, x))(xs[0])
        outs[name] = np.asarray(jax.device_get(y))

        @jax.jit
        def g(c, x, mod=mod):
            y = mod.apply(variables, x + c * 1e-9)
            return c + y[0, 0, 0, 0] * 1e-9

        times[name] = timed(g, xs, args.iters)

    bitwise = np.array_equal(outs["plain"], outs["casted"])
    print(f"bitwise={bitwise}  plain {times['plain'] * 1e3:7.2f} ms  "
          f"casted {times['casted'] * 1e3:7.2f} ms  "
          f"({times['plain'] / times['casted']:4.2f}x)")
    if not bitwise:
        d = np.abs(outs["plain"] - outs["casted"])
        print(f"  max abs diff {d.max():.3e}")
    print("OK" if bitwise else "MISMATCH (auto-demotion premise changed)")
    sys.exit(0 if bitwise else 1)


if __name__ == "__main__":
    main()
