"""Hybrid stem probe v2: XLA conv1_1 + Pallas fused [zero-halo -> conv1_2
-> relu -> pool] on a dense 64-channel flat stream.

probe_mosaic4 failed to lower: bf16 offset loads feeding tpu.concatenate
hit "result/input offset mismatch on non-concat dimension" (the packed
(16,128) bf16 layout carries per-operand sublane/lane offsets the concat
can't reconcile).  The PROVEN idiom (ops/conv1_pallas.py) is offset loads
from an **f32 VMEM scratch** -> concatenate -> bf16 cast.  So v2 stages:

  * XLA conv1_1 with padding ((2,2),(2,2)) emits the halo'd a1 directly
    (bf16, half the HBM);  halo ring values are WRONG (conv over the
    zero-extended image, not zero) — fixed in-kernel;
  * window materialisation: overlapping (BH+2)-row dense 64-lane windows
    (the 1.25x copy);
  * in-kernel: ONE masked cast of the whole window block into an f32
    scratch (zeroing the halo ring + wrap columns; VPU-cheap) -> the
    proven f32 offset-load concat -> 3 accumulated K=192 bf16 matmuls
    -> relu -> reshape-pool -> NHWC f32 out.

Variants: A = f32 stream (no in-kernel cast needed, 2x window bytes),
B = bf16 stream + in-kernel masked cast (half the stream bytes).

Run on the TPU:  python tools/probe_mosaic5.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, H, W = 8, 608, 800
BH = 8
Wr = W + 2                       # a1p columns: global cols -1 .. W
NROW = H // BH
M2 = BH * Wr
WIN = (BH + 2) * Wr + 2          # +2: the dx=2 taps of the last row
WOUT = W // 2


def timed(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv1_1_pad(x, w1, b1, out_dtype):
    y = jax.lax.conv_general_dilated(
        x, w1, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y + b1, 0.0).astype(out_dtype)


def _k_hybrid(a_ref, w2_ref, b2_ref, out_ref, a1s_ref):
    """One (batch, row-chunk) grid step.
    a_ref: (1, 1, WIN, 64) f32/bf16 flat halo window.
    a1s_ref: (WIN, 64) f32 scratch — masked/cast copy so the shifted views
    are f32 ref loads (the proven concat idiom)."""
    c = pl.program_id(1)
    f = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1), 0)
    col = f % Wr
    halo = ((col == 0) | (col >= W + 1)
            | jnp.logical_and(c == 0, f < Wr)
            | jnp.logical_and(c == pl.num_programs(1) - 1,
                              f >= (BH + 1) * Wr))
    a1s_ref[:] = jnp.where(halo, 0.0, a_ref[0, 0].astype(jnp.float32))

    acc = jnp.zeros((M2, 64), jnp.float32)
    for dx in range(3):
        lhs = jnp.concatenate(
            [a1s_ref[pl.ds(dy * Wr + dx, M2), :] for dy in range(3)],
            axis=1).astype(jnp.bfloat16)          # (M2, 192)
        acc = acc + jnp.dot(lhs, w2_ref[dx],
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b2_ref[0, :], 0.0)
    # output at flat p = conv1_2 at (global row c*BH + p//Wr, col p%Wr);
    # cols W..W+1 are cross-row wrap garbage, dropped after the pool
    yv = y.reshape(BH // 2, 2, Wr // 2, 2, 64)
    pooled = jnp.max(jnp.max(yv, axis=3), axis=1)
    out_ref[0] = pooled[:, :WOUT, :]


def hybrid_tail(a1p):
    """a1p (B, H+2, W+2, 64) -> pooled (B, H//2, W//2, 64) f32."""
    flat = a1p.reshape(NB, (H + 2) * Wr, 64)
    flat = jnp.pad(flat, ((0, 0), (0, 2), (0, 0)))
    wins = [flat[:, c * BH * Wr: c * BH * Wr + WIN] for c in range(NROW)]
    xc = jnp.stack(wins, axis=1)                  # (B, NROW, WIN, 64)
    return xc


def run_tail(xc, w2m, b2m):
    return pl.pallas_call(
        _k_hybrid,
        grid=(NB, NROW),
        in_specs=[
            pl.BlockSpec((1, 1, WIN, 64), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BH // 2, WOUT, 64),
                               lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, H // 2, W // 2, 64),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((WIN, 64), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * NB * H * W * 64 * 64 * 9,
            bytes_accessed=xc.size * xc.dtype.itemsize
            + NB * (H // 2) * (W // 2) * 64 * 4,
            transcendentals=0),
    )(xc, w2m, b2m)


def make_stem(stream_dtype):
    @jax.jit
    def stem(x, w1, b1, w2, b2):
        a1p = conv1_1_pad(x, w1, b1, stream_dtype)
        w2m = jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 192, 64) \
                 .astype(jnp.bfloat16)
        b2m = b2.reshape(1, 64).astype(jnp.float32)
        return run_tail(hybrid_tail(a1p), w2m, b2m)
    return stem


@jax.jit
def stem_xla(x, w1, b1, w2, b2):
    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y + b, 0.0)
    v = conv(conv(x, w1, b1), w2, b2)
    return jax.lax.reduce_window(v, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(NB, H, W, 3).astype(np.float32))
    w1 = jax.device_put((rng.randn(3, 3, 3, 64) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w2 = jax.device_put((rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b2 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))

    want = np.asarray(stem_xla(x, w1, b1, w2, b2))
    t = timed(stem_xla, x, w1, b1, w2, b2)
    print(f"XLA stem      {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")

    for name, dt in [("A/f32", jnp.float32), ("B/bf16", jnp.bfloat16)]:
        stem = make_stem(dt)
        try:
            got = np.asarray(stem(x, w1, b1, w2, b2))
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}")
            continue
        rms = float(np.sqrt(((got - want) ** 2).mean())
                    / np.sqrt((want ** 2).mean()))
        t = timed(stem, x, w1, b1, w2, b2)
        print(f"{name}: rms_rel={rms:.2e} max={np.abs(got - want).max():.2e} "
              f" {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")

        # phase isolation
        c11 = jax.jit(lambda v: conv1_1_pad(v, w1, b1, dt))
        tc = timed(c11, x)
        a1p = jax.block_until_ready(c11(x))
        mat = jax.jit(hybrid_tail)
        tm = timed(mat, a1p)
        xc = jax.block_until_ready(mat(a1p))
        w2m = jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 192, 64) \
                 .astype(jnp.bfloat16)
        b2m = b2.reshape(1, 64).astype(jnp.float32)
        tail = jax.jit(lambda a: run_tail(a, w2m, b2m))
        tt = timed(tail, xc)
        print(f"  conv1_1+pad {tc / NB * 1e3:.3f}  window mat "
              f"{tm / NB * 1e3:.3f}  pallas tail {tt / NB * 1e3:.3f} ms/img")


if __name__ == "__main__":
    main()
