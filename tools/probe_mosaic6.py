"""Bisect probe_mosaic5's compiler crash: which kernel feature kills the
TPU compiler (HTTP 500 / subprocess exit, no Mosaic diagnostic)?

Stages, each a separate pallas_call on the same window stream:
  S1  copy window block -> f32 scratch, ONE offset dot (no concat)
  S2  + per-dx concat of 3 dy-shifted scratch loads (the full conv)
  S3  + the halo iota/where mask in the scratch copy
  S4  + the 2x2 pool reshape (odd Wr//2 = 401 inner dim)  [suspect]
  S5  S3 with pool via strided slices instead of reshape

Run on the TPU:  python tools/probe_mosaic6.py [bf16]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, H, W = 2, 64, 800            # small: fast compiles for bisecting
BH = 8
Wr = W + 2
NROW = H // BH
M2 = BH * Wr
WIN = (BH + 2) * Wr + 2
WOUT = W // 2


def mk_kernel(stage):
    def k(a_ref, w2_ref, b2_ref, out_ref, a1s_ref):
        if stage >= 3:
            c = pl.program_id(1)
            f = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1), 0)
            col = f % Wr
            halo = ((col == 0) | (col >= W + 1)
                    | jnp.logical_and(c == 0, f < Wr)
                    | jnp.logical_and(c == pl.num_programs(1) - 1,
                                      f >= (BH + 1) * Wr))
            a1s_ref[:] = jnp.where(halo, 0.0,
                                   a_ref[0, 0].astype(jnp.float32))
        else:
            a1s_ref[:] = a_ref[0, 0].astype(jnp.float32)

        if stage == 1:
            lhs = a1s_ref[pl.ds(0, M2), :].astype(jnp.bfloat16)
            y = jnp.dot(lhs, w2_ref[0, :64, :],
                        preferred_element_type=jnp.float32)
        else:
            acc = jnp.zeros((M2, 64), jnp.float32)
            for dx in range(3):
                lhs = jnp.concatenate(
                    [a1s_ref[pl.ds(dy * Wr + dx, M2), :] for dy in range(3)],
                    axis=1).astype(jnp.bfloat16)
                acc = acc + jnp.dot(lhs, w2_ref[dx],
                                    preferred_element_type=jnp.float32)
            y = jnp.maximum(acc + b2_ref[0, :], 0.0)

        if stage <= 3:
            out_ref[0] = y.reshape(1, M2, 64)[0]
        elif stage == 4:
            yv = y.reshape(BH // 2, 2, Wr // 2, 2, 64)
            pooled = jnp.max(jnp.max(yv, axis=3), axis=1)
            out_ref[0] = pooled[:, :WOUT, :]
        else:  # stage 5: pool via strided slices on the (BH, Wr, 64) view
            yr = y.reshape(BH, Wr, 64)
            a = jnp.maximum(yr[0::2, 0:2 * WOUT:2, :],
                            yr[0::2, 1:2 * WOUT:2, :])
            b = jnp.maximum(yr[1::2, 0:2 * WOUT:2, :],
                            yr[1::2, 1:2 * WOUT:2, :])
            out_ref[0] = jnp.maximum(a, b)
    return k


def run_stage(stage, xc, w2m, b2m):
    if stage <= 3:
        out_spec = pl.BlockSpec((1, 1, M2, 64), lambda b, c: (b, c, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NB, NROW, M2, 64), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, BH // 2, WOUT, 64),
                                lambda b, c: (b, c, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NB, H // 2, WOUT, 64), jnp.float32)
    return pl.pallas_call(
        mk_kernel(stage),
        grid=(NB, NROW),
        in_specs=[
            pl.BlockSpec((1, 1, WIN, 64), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((WIN, 64), jnp.float32)],
    )(xc, w2m, b2m)


def main():
    dt = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    print("backend:", jax.default_backend(), "stream dtype:", dt.__name__)
    rng = np.random.RandomState(0)
    a1p = rng.randn(NB, (H + 2) * Wr + 2, 64).astype(np.float32)
    wins = np.stack([a1p[:, c * BH * Wr: c * BH * Wr + WIN]
                     for c in range(NROW)], axis=1)
    xc = jax.device_put(wins.astype(dt))
    w2m = jax.device_put(rng.randn(3, 192, 64).astype(np.float32)
                         .astype(jnp.bfloat16))
    b2m = jax.device_put(rng.randn(1, 64).astype(np.float32))

    for stage in (1, 2, 3, 4, 5):
        try:
            f = jax.jit(functools.partial(run_stage, stage))
            out = jax.block_until_ready(f(xc, w2m, b2m))
            print(f"S{stage}: OK  out={out.shape} "
                  f"finite={bool(np.isfinite(np.asarray(out)).all())}")
        except Exception as e:
            print(f"S{stage}: FAIL {str(e)[:300]}")


if __name__ == "__main__":
    main()
