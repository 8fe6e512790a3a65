"""Hybrid stem probe: XLA conv1_1 + Pallas fused [relu -> conv1_2 -> relu
-> pool] on a dense 64-channel flat stream.

probe_stem_phases.py showed the current fully-fused kernel's compute is
fast (conv1_2+pool ~0.23 ms/img, conv1_1 ~0.13) and its cost is ENTIRELY
the narrow 3-lane input path (2.94 ms/img); probe_mosaic3.py showed the
lane-offset/channels-planar alternatives don't lower and XLA relayouts
cost ~0.57 ms/img.  The hybrid sidesteps both:

  * XLA computes conv1_1 with padding=(2,2) so its output IS the
    halo-padded a1 — no separate pad copy;  cast to bf16 (the MXU rounding
    the conv pays anyway) to halve HBM;
  * a1 reshapes (free, contiguous) to a flat (B, (H+2)*Wr, 64) stream;
    overlapping (BH+2)-row windows are materialised by XLA (1.25x copy)
    exactly like the current kernel's xc — but DENSE 64-lane rows, not
    3-lane;
  * in-kernel: the PROVEN idiom — sublane-offset ref loads -> lane concat
    (m2, 192) -> 3 accumulated K=192 matmuls -> relu -> reshape-pool ->
    NHWC output block.  No transposes anywhere.

Timings at batch 8, 608x800 vs the XLA stem and the current fused kernel.
Run on the TPU:  python tools/probe_mosaic4.py
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
Wr = W + 2


def timed(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv1_1_pad(x, w1, b1, out_dtype=jnp.bfloat16):
    """relu(conv1_1(x)+b1) with 2px padding: output (B, H+2, W+2, 64) is
    a1 WITH the 1px halo conv1_2 needs (plus nothing else)."""
    y = jax.lax.conv_general_dilated(
        x, w1, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y + b1, 0.0).astype(out_dtype)


def _k_hybrid(a_ref, w2_ref, b2_ref, out_ref, *, m2, wout):
    """One (batch, row-chunk) grid step.
    a_ref: (1, 1, (BH+2)*Wr + 2, 64) bf16 flat halo window (+2: the
    dx=2 taps read two elements past the last row).
    w2_ref: (3, 192, 64) bf16 per-dx regrouped conv1_2 kernel.
    out_ref: (1, BH//2, wout, 64) f32 pooled NHWC tile."""
    acc = jnp.zeros((m2, 64), jnp.float32)
    for dx in range(3):
        lhs = jnp.concatenate(
            [a_ref[0, 0, pl.ds(dy * Wr + dx, m2), :] for dy in range(3)],
            axis=1)                                  # (m2, 192) bf16
        acc = acc + jnp.dot(lhs, w2_ref[dx],
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b2_ref[0, :], 0.0)
    yv = y.reshape(BH // 2, 2, Wr // 2, 2, 64)
    pooled = jnp.max(jnp.max(yv, axis=3), axis=1)
    out_ref[0] = pooled[:, :wout, :]


def hybrid_tail(a1p, w2m, b2m, out_dtype=jnp.float32):
    """a1p (B, H+2, W+2, 64) bf16 -> pooled (B, H//2, W//2, 64)."""
    nrow = H // BH
    m2 = BH * Wr
    win = (BH + 2) * Wr + 2             # +2: dx=2 taps read past row end
    flat = a1p.reshape(NB, (H + 2) * Wr, 64)
    flat = jnp.pad(flat, ((0, 0), (0, 2), (0, 0)))
    # overlapping windows (BlockSpec can't express overlap)
    wins = [flat[:, c * BH * Wr: c * BH * Wr + win] for c in range(nrow)]
    xc = jnp.stack(wins, axis=1)        # (B, nrow, win, 64)
    return pl.pallas_call(
        functools.partial(_k_hybrid, m2=m2, wout=W // 2),
        grid=(NB, nrow),
        in_specs=[
            pl.BlockSpec((1, 1, win, 64),
                         lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BH // 2, W // 2, 64),
                               lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, H // 2, W // 2, 64), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * NB * H * W * 64 * 64 * 9,
            bytes_accessed=xc.size * 2 + NB * (H // 2) * (W // 2) * 64 * 4,
            transcendentals=0),
    )(xc, w2m, b2m)


@jax.jit
def stem_hybrid(x, w1, b1, w2, b2):
    a1p = conv1_1_pad(x, w1, b1)
    w2m = jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 192, 64) \
             .astype(jnp.bfloat16)
    b2m = b2.reshape(1, 64).astype(jnp.float32)
    return hybrid_tail(a1p, w2m, b2m)


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

    # correctness: vs the plain XLA stem, at the bf16-a1 rounding level
    want = np.asarray(stem_xla(x, w1, b1, w2, b2))
    got = np.asarray(stem_hybrid(x, w1, b1, w2, b2))
    rms = float(np.sqrt(((got - want) ** 2).mean())
                / np.sqrt((want ** 2).mean()))
    print(f"hybrid vs XLA: rms_rel={rms:.2e} "
          f"max_abs={np.abs(got - want).max():.2e}")

    t = timed(stem_xla, x, w1, b1, w2, b2)
    print(f"XLA stem      {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")
    t = timed(stem_hybrid, x, w1, b1, w2, b2)
    print(f"hybrid stem   {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")

    # phase isolation
    c11 = jax.jit(lambda v: conv1_1_pad(v, w1, b1))
    t = timed(c11, x)
    print(f"  conv1_1+pad {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")

    a1p = jax.block_until_ready(c11(x))
    w2m = jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 192, 64) \
             .astype(jnp.bfloat16)
    b2m = b2.reshape(1, 64).astype(jnp.float32)
    tail = jax.jit(lambda a: hybrid_tail(a, w2m, b2m))
    t = timed(tail, a1p)
    print(f"  pallas tail {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")

    # window materialisation alone (the 1.25x copy)
    @jax.jit
    def mat(a):
        win = (BH + 2) * Wr + 2
        flat = jnp.pad(a.reshape(NB, (H + 2) * Wr, 64), ((0, 0), (0, 2),
                                                         (0, 0)))
        return jnp.stack([flat[:, c * BH * Wr: c * BH * Wr + win]
                          for c in range(H // BH)], axis=1)
    t = timed(mat, a1p)
    print(f"  window mat  {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")


if __name__ == "__main__":
    main()
