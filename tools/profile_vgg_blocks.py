"""Per-block decomposition of the VGG16 trunk on the current backend.

Times cumulative PREFIXES of the conv stack (conv1 block, +conv2, ... full
trunk) with the chained-dispatch protocol (see bench.py's methodology notes
for why prefix sums are the only trustworthy per-stage numbers through the
remote TPU relay: individual-op microbenchmarks there can report
above-peak rates when the relay dedupes dispatches).  Successive
differences give the per-block device cost, which tells us where the
trunk's gap to the conv roofline lives (conv1's K=3/K=64 MXU inefficiency
+ full-resolution HBM traffic vs the 512-channel tail).

Run from the repo root on the TPU-attached host:

    python tools/profile_vgg_blocks.py [--batch 8] [--iters 30] [--bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.models.layers import ConvBlock, compute_dtype_scope, max_pool
from flax import linen as nn


# (name, feats, pool_after) in reference order (VGGnet_train_bus.py:43-60)
VGG_PLAN = [
    ("conv1_1", 64, False), ("conv1_2", 64, True),
    ("conv2_1", 128, False), ("conv2_2", 128, True),
    ("conv3_1", 256, False), ("conv3_2", 256, False), ("conv3_3", 256, True),
    ("conv4_1", 512, False), ("conv4_2", 512, False), ("conv4_3", 512, True),
    ("conv5_1", 512, False), ("conv5_2", 512, False), ("conv5_3", 512, False),
]


class VGGPrefix(nn.Module):
    n_layers: int

    @nn.compact
    def __call__(self, x):
        for name, feats, pool in VGG_PLAN[: self.n_layers]:
            x = ConvBlock(feats, kernel=3, stride=1, name=name,
                          train=False)(x)
            if pool:
                x = max_pool(x, 2, 2, "VALID")
        return x


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
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 800))
    args = ap.parse_args()

    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.RandomState(0)
    nb = args.batch
    canvas = tuple(args.canvas)
    datas = [jax.device_put(rng.rand(nb, *canvas, 3).astype(np.float32))
             for _ in range(4)]
    dt_scope = "bfloat16" if args.bf16 else None

    # one shared full-trunk param set; prefixes reuse the leading subtrees
    full = VGGPrefix(len(VGG_PLAN))
    with compute_dtype_scope(dt_scope):
        params = full.init(jax.random.PRNGKey(0), datas[0][:1])

    prev = 0.0
    # breakpoints: after each pooled block + the full stack
    points = [i + 1 for i, (_, _, p) in enumerate(VGG_PLAN) if p]
    points.append(len(VGG_PLAN))
    for n in points:
        sub = VGGPrefix(n)
        sub_params = {"params": {
            k: v for k, v in params["params"].items()
            if any(k == VGG_PLAN[i][0] for i in range(n))}}

        @jax.jit
        def step(c, data, sub=sub, sub_params=sub_params):
            with compute_dtype_scope(dt_scope):
                y = sub.apply(sub_params, data + c * 1e-9)
            return c + y[0, 0, 0, 0].astype(jnp.float32) * 1e-9

        dt = timed(step, datas, args.iters)
        name = VGG_PLAN[n - 1][0]
        print(f"through {name:8s}: {dt * 1e3:8.2f} ms total "
              f"({dt / nb * 1e3:6.3f} ms/img)   block "
              f"{(dt - prev) / nb * 1e3:+6.3f} ms/img")
        prev = dt


if __name__ == "__main__":
    main()
