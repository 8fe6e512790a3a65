"""Phase isolation for the fused stem kernel: which in-kernel idiom burns
the time?  Runs stripped-down kernel variants over the REAL grid/shapes
(batch 8, 608x800) and reports ms/img each, plus two correctness probes
(Q/R) for candidate conv1_2 restructures.

Variants:
  full        — the production kernel (ops/conv1_pallas.py)
  input_only  — DMA in + dummy pooled write (grid/DMA floor)
  conv1_only  — 9 narrow offset loads + concat + K=27 matmul + a1 store
  conv2_only  — skip conv1_1 (a1 = broadcast of input mean); 3 dx concats
                + matmuls + pool
  conv2_1dx   — conv2_only with a single dx tap (concat+matmul count /3)

Probes:
  Q: offset ref-loads feeding ADD — value-correct? (load->matmul is not)
  R: offset VALUE-slices feeding ADD — compiles? value-correct?
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wssdl_bus_tpu.ops.conv1_pallas import BH, _HALO, vgg_stem_fused

NB, H, W = 8, 608, 800


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def variant_call(kernel_body, extra_scratch=True):
    nrow = H // BH
    wout = W // 4
    wloc = W // 2 + 4
    rows = BH + _HALO + 1
    m1 = (BH + 2) * wloc + 2
    scratch = [pltpu.VMEM((m1, 64), jnp.float32)] if extra_scratch else []

    @jax.jit
    def run(x, w1m, b1m, w2m, b2m):
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (2, 3), (2, 2), (0, 0)))
        row_chunks = [xp[:, i * BH: i * BH + rows] for i in range(nrow)]
        xr = jnp.stack(row_chunks, axis=1)
        halves = [xr[:, :, :, :wloc], xr[:, :, :, W // 2: W // 2 + wloc]]
        xc = jnp.stack(halves, axis=2).reshape(NB, nrow, 2, rows * wloc, 3)
        return pl.pallas_call(
            functools.partial(kernel_body, wloc=wloc, wout=wout),
            grid=(NB, nrow, 2),
            in_specs=[
                pl.BlockSpec((1, 1, 1, rows * wloc, 3),
                             lambda b, i, j: (b, i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BH // 2, wout, 64),
                                   lambda b, i, j: (b, i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NB, H // 2, W // 2, 64),
                                           jnp.float32),
            scratch_shapes=scratch,
        )(xc, w1m, b1m, w2m, b2m)

    return run


def k_input_only(xc_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                 *, wloc, wout):
    s = jnp.sum(xc_ref[0, 0, 0, :8, :])
    out_ref[0] = jnp.full((BH // 2, wout, 64), s, jnp.float32)


def k_conv1_only(xc_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, a1_ref,
                 *, wloc, wout):
    m1 = (BH + 2) * wloc + 2
    taps = [xc_ref[0, 0, 0, pl.ds(dy * wloc + dx, m1), :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(taps, axis=1).astype(jnp.bfloat16)
    a1 = jnp.dot(patches, w1_ref[:], preferred_element_type=jnp.float32)
    a1_ref[:] = jnp.maximum(a1 + b1_ref[0, :], 0.0)
    out_ref[0] = jnp.full((BH // 2, wout, 64), a1_ref[0, 0], jnp.float32)


def _conv2_pool(a1_ref, w2_ref, b2_ref, out_ref, wloc, wout, ndx):
    m2 = BH * wloc
    acc = jnp.zeros((m2, 64), jnp.float32)
    for dx in range(ndx):
        lhs = jnp.concatenate(
            [a1_ref[pl.ds(dy * wloc + dx, m2), :] for dy in range(3)],
            axis=1).astype(jnp.bfloat16)
        acc = acc + jnp.dot(lhs, w2_ref[dx],
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b2_ref[0, :], 0.0)
    yv = y.reshape(BH // 2, 2, wloc // 2, 2, 64)
    pooled = jnp.max(jnp.max(yv, axis=3), axis=1)
    out_ref[0] = pooled[:, :wout, :]


def k_conv2_only(xc_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, a1_ref,
                 *, wloc, wout):
    a1_ref[:] = jnp.zeros_like(a1_ref) + xc_ref[0, 0, 0, 0, 0]
    _conv2_pool(a1_ref, w2_ref, b2_ref, out_ref, wloc, wout, 3)


def k_conv2_1dx(xc_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, a1_ref,
                *, wloc, wout):
    a1_ref[:] = jnp.zeros_like(a1_ref) + xc_ref[0, 0, 0, 0, 0]
    _conv2_pool(a1_ref, w2_ref, b2_ref, out_ref, wloc, wout, 1)


def probe_qr():
    m = 512
    x = jnp.asarray(np.random.RandomState(0).randn(m + 8, 64)
                    .astype(np.float32))
    want = np.asarray(x)[0:m] + np.asarray(x)[1:m + 1] + np.asarray(x)[2:m + 2]

    def k_q(x_ref, o_ref, s_ref):
        s_ref[:] = x_ref[:]
        o_ref[:] = (s_ref[pl.ds(0, m), :] + s_ref[pl.ds(1, m), :]
                    + s_ref[pl.ds(2, m), :])
    try:
        out = np.asarray(pl.pallas_call(
            k_q, out_shape=jax.ShapeDtypeStruct((m, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m + 8, 64), jnp.float32)])(x))
        ok = np.allclose(out, want, rtol=1e-6, atol=1e-6)
        print(f"Q offset-load -> add: OK match={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"Q offset-load -> add: FAIL {str(e).splitlines()[0][:120]}")

    def k_r(x_ref, o_ref):
        xv = x_ref[:]
        o_ref[:] = xv[0:m, :] + xv[1:m + 1, :] + xv[2:m + 2, :]
    try:
        out = np.asarray(pl.pallas_call(
            k_r, out_shape=jax.ShapeDtypeStruct((m, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
        ok = np.allclose(out, want, rtol=1e-6, atol=1e-6)
        print(f"R offset value-slice -> add: OK match={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"R offset value-slice -> add: FAIL "
              f"{str(e).splitlines()[0][:120]}")


def main():
    print("backend:", jax.default_backend())
    probe_qr()

    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(NB, H, W, 3).astype(np.float32))
    w1 = jax.device_put((rng.randn(3, 3, 3, 64) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w2 = jax.device_put((rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b2 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))

    t = timed(functools.partial(vgg_stem_fused, x, w1, b1, w2, b2))
    print(f"full        {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")

    w1m = jnp.asarray(w1).reshape(27, 64).astype(jnp.bfloat16)
    w2m = jnp.transpose(jnp.asarray(w2), (1, 0, 2, 3)).reshape(3, 192, 64) \
             .astype(jnp.bfloat16)
    b1m = jnp.asarray(b1).reshape(1, 64)
    b2m = jnp.asarray(b2).reshape(1, 64)
    for name, body, scr in (("input_only", k_input_only, False),
                            ("conv1_only", k_conv1_only, True),
                            ("conv2_only", k_conv2_only, True),
                            ("conv2_1dx", k_conv2_1dx, True)):
        try:
            fn = variant_call(body, extra_scratch=scr)
            t = timed(fn, x, w1m, b1m, w2m, b2m)
            print(f"{name:11s} {t * 1e3:7.2f} ms ({t / NB * 1e3:.3f} ms/img)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:11s} FAIL {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
