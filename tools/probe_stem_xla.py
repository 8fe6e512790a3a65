"""Race XLA-level recompositions of the VGG stem (no Pallas).

VERDICT ON THE bf16 VARIANTS (see tools/check_bf16_store_tpu.py): the
bf16_act*/bf16_up wins measured here do NOT transfer to the full trunk.
This probe's jit boundary pins its output (and, transitively, the last
stage) to f32, which blocks XLA's excess-precision auto-demotion; inside
the real trunk XLA already stores the whole conv chain in bf16 and the
explicit casts are a bit-identical no-op.  The p_mm/s2d/pool results
stand (all slower than XLA's own conv strategy at these shapes).

The fused Pallas stem (ops/conv1_pallas.py) is gated opt-in because its
chunk-DMA lane padding makes it 2x slower than XLA's stem.  Before the
channels-in-sublanes kernel redesign, measure how far PLAIN XLA can be
pushed by recomposing the graph:

  base        conv1_1 + conv1_2 + reduce_window pool (the production stem)
  p_mm        conv1_1 as conv_general_dilated_patches + K=27 matmul
  p_mm_rp     p_mm + pool as reshape(B,H/2,2,W/2,2,C) + max (no
              reduce_window)
  bf16_act    base, but the inter-stage activations stored bf16 (halves
              the 124 MB/img round-trips); matmul accumulation stays f32
  p_mm_bf16   p_mm_rp with bf16 activations
  s2d         conv1_1 via 2x2 space-to-depth (K=48, 4 output phases as
              one (2,2,12,256) conv) + depth-to-space, then conv1_2+pool

Each variant is a small jit program (cheap axon compile).  Numerics are
checked against base (max |diff| printed; bf16 variants are expected to
differ at ~1e-2 relative).

    python tools/probe_stem_xla.py [--batch 8] [--iters 30]
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

    rng = np.random.RandomState(0)
    nb = args.batch
    H, W = 608, 800
    xs = [jax.device_put(rng.rand(nb, H, W, 3).astype(np.float32))
          for _ in range(2)]
    w1 = jax.device_put(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b1 = jax.device_put(rng.randn(64).astype(np.float32) * 0.1)
    w2 = jax.device_put(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jax.device_put(rng.randn(64).astype(np.float32) * 0.1)

    def conv(x, w, dtype=None):
        if dtype is not None:
            x = x.astype(dtype)
            w = w.astype(dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    def pool_rw(a):
        return jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def pool_rs(a):
        b, h, w, c = a.shape
        return a.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))

    def conv11_mm(x, dtype=jnp.float32):
        p = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wm = jnp.transpose(w1, (2, 0, 1, 3)).reshape(27, 64)
        return jnp.einsum("bhwk,kc->bhwc", p.astype(dtype),
                          wm.astype(dtype),
                          preferred_element_type=jnp.float32)

    variants = {}

    def stem_base(x):
        a = jnp.maximum(conv(x, w1) + b1, 0.0)
        a = jnp.maximum(conv(a, w2) + b2, 0.0)
        return pool_rw(a)
    variants["base"] = stem_base

    def stem_p_mm(x):
        a = jnp.maximum(conv11_mm(x) + b1, 0.0)
        a = jnp.maximum(conv(a, w2) + b2, 0.0)
        return pool_rw(a)
    variants["p_mm"] = stem_p_mm

    def stem_p_mm_rp(x):
        a = jnp.maximum(conv11_mm(x) + b1, 0.0)
        a = jnp.maximum(conv(a, w2) + b2, 0.0)
        return pool_rs(a)
    variants["p_mm_rp"] = stem_p_mm_rp

    def stem_bf16(x):
        a = jnp.maximum(conv(x, w1) + b1, 0.0).astype(jnp.bfloat16)
        a = jnp.maximum(conv(a, w2, jnp.bfloat16) + b2, 0.0)
        return pool_rw(a).astype(jnp.float32)
    variants["bf16_act"] = stem_bf16

    def stem_bf16_2(x):
        # BOTH inter-stage activations stored bf16 and the pool runs on the
        # bf16 values (max commutes with the monotone bf16 rounding, and the
        # next conv would truncate its input to bf16 anyway -> on TPU this
        # is bit-identical to the f32 graph)
        a = jnp.maximum(conv(x, w1) + b1, 0.0).astype(jnp.bfloat16)
        a = jnp.maximum(conv(a, w2, jnp.bfloat16) + b2, 0.0)
        a = a.astype(jnp.bfloat16)
        return pool_rw(a).astype(jnp.float32)
    variants["bf16_act2"] = stem_bf16_2

    def stem_p_mm_bf16(x):
        a = jnp.maximum(conv11_mm(x, jnp.bfloat16) + b1, 0.0)
        a = a.astype(jnp.bfloat16)
        a = jnp.maximum(conv(a, w2, jnp.bfloat16) + b2, 0.0)
        return pool_rs(a).astype(jnp.float32)
    variants["p_mm_bf16"] = stem_p_mm_bf16

    # space-to-depth conv1_1: out(2y+py, 2x+px) needs input rows
    # 2y+py-1..2y+py+1; across phases py,px in {0,1} the union spans s2d
    # rows/cols y-1..y+1, so one 3x3 conv over the (B,H/2,W/2,12) s2d
    # input covers every phase (K = 3*3*12 = 108 -> 84% MXU K-util vs 27/128
    # for the direct conv, at 4x the MACs -- zeros fill the unused taps);
    # output phases split back via depth-to-space.
    w_s2d = np.zeros((3, 3, 12, 256), np.float32)
    w1_np = np.asarray(jax.device_get(w1))
    for py in range(2):
        for px in range(2):
            for dy in range(3):
                for dx in range(3):
                    # original input row 2y+py-1+dy = 2*(y + qy) + ry
                    r = py - 1 + dy
                    qy, ry = r // 2, r % 2
                    s = px - 1 + dx
                    qx, rx = s // 2, s % 2
                    # s2d window taps at (1+qy, 1+qx) relative to padded
                    # window start (qy,qx in {-1,0}); s2d channel = ry*2+rx
                    # interleaved with input channel c -> 12 = (2*2*3)
                    for c in range(3):
                        w_s2d[1 + qy, 1 + qx, (ry * 2 + rx) * 3 + c,
                              (py * 2 + px) * 64:(py * 2 + px + 1) * 64] \
                            += w1_np[dy, dx, c]
    w_s2d = jax.device_put(jnp.asarray(w_s2d))

    def stem_s2d(x):
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        xs2 = x.reshape(b, h // 2, 2, w // 2, 2, 3)
        xs2 = xs2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)
        xp = jnp.pad(xs2, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dn = jax.lax.conv_dimension_numbers(
            xp.shape, w_s2d.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xp, w_s2d, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32)  # (b, h/2, w/2, 256)
        y = y.reshape(b, h // 2, w // 2, 2, 2, 64)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, 64)
        a = jnp.maximum(y + b1, 0.0)
        a = jnp.maximum(conv(a, w2) + b2, 0.0)
        return pool_rw(a)
    variants["s2d"] = stem_s2d

    def stem_bf16_up(x):
        # like bf16_act2 but the stored bf16 activations are UPCAST to f32
        # before each consumer (what flax promotion would do): answers
        # whether XLA materializes the f32 upcast buffer (erasing the HBM
        # win) or fuses it into the conv read
        a = jnp.maximum(conv(x, w1) + b1, 0.0).astype(jnp.bfloat16)
        a = jnp.maximum(conv(a.astype(jnp.float32), w2) + b2, 0.0)
        a = a.astype(jnp.bfloat16)
        return pool_rw(a).astype(jnp.float32)
    variants["bf16_up"] = stem_bf16_up

    # conv2-block extension: does bf16 activation storage keep paying at
    # 304x400x128?  (separate output shape -> compared only to each other)
    w3 = jax.device_put(rng.randn(3, 3, 64, 128).astype(np.float32) * 0.05)
    b3 = jax.device_put(rng.randn(128).astype(np.float32) * 0.1)
    w4 = jax.device_put(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    b4 = jax.device_put(rng.randn(128).astype(np.float32) * 0.1)

    def block2(a, dtype=None):
        a = jnp.maximum(conv(a, w3, dtype) + b3, 0.0)
        if dtype is not None:
            a = a.astype(dtype)
        a = jnp.maximum(conv(a, w4, dtype) + b4, 0.0)
        if dtype is not None:
            a = a.astype(dtype)
        return pool_rw(a).astype(jnp.float32)

    def stem12_base(x):
        return block2(stem_base(x))
    variants["stem12_base"] = stem12_base

    def stem12_bf16(x):
        return block2(stem_bf16_2(x), jnp.bfloat16)
    variants["stem12_bf16"] = stem12_bf16

    # numerics vs base on a small input (cheap)
    xsm = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    refs = {}  # output shape -> reference output
    for name, fn in variants.items():
        out = np.asarray(jax.device_get(jax.jit(fn)(xsm)))
        ref = refs.get(out.shape)
        if ref is None:
            refs[out.shape] = out
            print(f"{name:12s}: reference")
        else:
            d = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
            print(f"{name:12s}: max rel diff vs ref {d:.3e}")

    print(f"\nbackend: {jax.default_backend()}  batch {nb}  {H}x{W}")
    for name, fn in variants.items():
        @jax.jit
        def step(c, x, fn=fn):
            out = fn(x + c * 1e-9)
            return c + out[0, 0, 0, 0] * 1e-9

        dt = timed(step, xs, args.iters)
        print(f"{name:12s}: {dt * 1e3:8.2f} ms  ({dt / nb * 1e3:6.3f} ms/img)")


if __name__ == "__main__":
    main()
