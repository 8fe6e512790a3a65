"""Probes for the channels-planar fused-stem redesign ("F2").

Design under test (see ops/conv1_pallas.py STATUS note for why the current
rows-in-sublanes kernel loses): put CHANNELS in sublanes and the flattened
(row, x) stream in LANES, so

  * the input ships dense (3 sublanes x rows*Wp lanes) instead of
    (rows*wloc sublanes x 3-padded-to-128 lanes)  -> ~40x less DMA;
  * conv1_1 is ONE (64, 27) @ (27, rows1*Wp) matmul per chunk (taps are
    lane-offset loads of the (3, rows*Wp) input, sublane-concatenated);
  * conv1_2 is ONE (64, 576) @ (576, 8*Wpa) matmul per chunk (taps are
    lane-offset loads of the (64, rows1*Wpa) a1 scratch);
  * the wrap garbage each lane shift drags across row boundaries lands in
    the x-padding columns, exactly like the original kernel's sublane wrap.

What must hold for this to work (probes):
  L  lane-offset ref loads -> concat(sublanes) -> values correct
  M  lane-offset ref loads -> concat(sublanes) -> MATMUL -> values correct
  N  strided lane slice z[:, 0::2] (horizontal pool compaction)
  O  reshape (m, 2k)->(m, k, 2) + max over minor (pool alternative)
  P  lane-offset value-slices of a VALUE -> max (vertical pool pairs)
  T1 perf: conv1_2-shaped matmul (64,576)@(576,6448) from 9 offset loads
  T2 perf: conv1_1-shaped matmul (64,27)@(27,9648)
  T3 perf: XLA-side input prep (NHWC -> planar flat) + output
     (planar pooled -> NHWC) relayouts at real scale

Run on the TPU:  python tools/probe_mosaic3.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, want=None, atol=1e-5):
    try:
        out = np.asarray(jax.jit(fn)())
        if want is not None:
            ok = np.allclose(out, want, rtol=1e-5, atol=atol)
            print(f"{'OK  ' if ok else 'BAD '}  {name}: match={ok} "
                  f"maxdiff={np.abs(out - want).max():.2e}")
            return ok
        print(f"OK    {name}: out_sum={out.sum():.3f}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")
        key = next((ln for ln in msg if "implemented" in ln.lower()
                    or "mismatch" in ln.lower() or "unsupported" in ln.lower()),
                   msg[0])
        print(f"FAIL  {name}: {key.strip()[:140]}")
        return False


def vmem_call(kernel, out_shape, n_in=1, scratch=None):
    return pl.pallas_call(
        kernel, out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch or [])


def timed(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)

    # ---- correctness probes ------------------------------------------- #
    m, w = 64, 512
    x = jnp.asarray(rng.randn(m, w + 8).astype(np.float32))
    xn = np.asarray(x)

    # L: lane-offset ref loads -> concat along sublanes
    def k_l(x_ref, o_ref):
        t = [x_ref[:, pl.ds(i, w)] for i in range(3)]
        o_ref[:] = jnp.concatenate(t, axis=0)
    want_l = np.concatenate([xn[:, i:i + w] for i in range(3)], axis=0)
    run("L lane-offset ref-load -> concat(sublanes)",
        lambda: vmem_call(k_l, jax.ShapeDtypeStruct((3 * m, w), jnp.float32))(x),
        want_l)

    # M: same concat feeding a matmul (the conv1_2 core idiom)
    wt = jnp.asarray(rng.randn(64, 3 * m).astype(np.float32) * 0.1)
    def k_m(x_ref, w_ref, o_ref):
        t = [x_ref[:, pl.ds(i, w)] for i in range(3)]
        rhs = jnp.concatenate(t, axis=0).astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(w_ref[:].astype(jnp.bfloat16), rhs,
                           preferred_element_type=jnp.float32)
    want_m = np.asarray(wt).astype(np.float32) @ want_l
    run("M lane-offset loads -> concat -> matmul",
        lambda: vmem_call(k_m, jax.ShapeDtypeStruct((64, w), jnp.float32),
                          n_in=2)(x, wt), want_m, atol=0.35)

    # M2: loads from a SCRATCH ref (a1 staging) -> concat -> matmul
    def k_m2(x_ref, w_ref, o_ref, s_ref):
        s_ref[:] = x_ref[:]
        t = [s_ref[:, pl.ds(i, w)] for i in range(3)]
        rhs = jnp.concatenate(t, axis=0).astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(w_ref[:].astype(jnp.bfloat16), rhs,
                           preferred_element_type=jnp.float32)
    run("M2 scratch lane-offset loads -> concat -> matmul",
        lambda: vmem_call(k_m2, jax.ShapeDtypeStruct((64, w), jnp.float32),
                          n_in=2,
                          scratch=[pltpu.VMEM((m, w + 8), jnp.float32)])(x, wt),
        want_m, atol=0.35)

    # N: strided lane slice (pool compaction)
    def k_n(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, 0::2]
    run("N strided lane value-slice [:, 0::2]",
        lambda: vmem_call(k_n, jax.ShapeDtypeStruct((m, (w + 8) // 2),
                                                    jnp.float32))(x),
        xn[:, 0::2])

    # O: reshape minor (m, k, 2) + max (pool alternative)
    def k_o(x_ref, o_ref):
        v = x_ref[:].reshape(m, (w + 8) // 2, 2)
        o_ref[:] = jnp.max(v, axis=2)
    run("O reshape (m,k,2) -> max(minor)",
        lambda: vmem_call(k_o, jax.ShapeDtypeStruct((m, (w + 8) // 2),
                                                    jnp.float32))(x),
        np.maximum(xn[:, 0::2], xn[:, 1::2]))

    # P: lane-offset value-slices -> max (vertical pool pairs)
    def k_p(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = jnp.maximum(v[:, 0:w], v[:, 8:w + 8])
    run("P lane-offset value-slices -> max",
        lambda: vmem_call(k_p, jax.ShapeDtypeStruct((m, w), jnp.float32))(x),
        np.maximum(xn[:, 0:w], xn[:, 8:w + 8]))

    # ---- perf probes (real chunk shapes, batch-8 grid scale) ----------- #
    # conv1_2 core: grid of 76*2... use grid=(152,) chunks like one image,
    # each ONE (64,576)@(576,6448) matmul from 9 offset loads of scratch.
    Wpa, rows_m2 = 806, 8
    n2 = rows_m2 * Wpa                      # 6448 lanes out
    m1lanes = 10 * Wpa                      # a1 scratch lanes
    NCHUNK = 76                             # chunks per 608-row image

    a1h = jnp.asarray(rng.randn(64, m1lanes).astype(np.float32))
    w2h = jnp.asarray(rng.randn(576, 64).astype(np.float32) * 0.05)

    def k_t1(a_ref, w_ref, o_ref, s_ref):
        s_ref[:] = a_ref[0]
        taps = [s_ref[:, pl.ds(dy * Wpa + dx, n2)]
                for dy in range(3) for dx in range(3)]
        rhs = jnp.concatenate(taps, axis=0).astype(jnp.bfloat16)
        o_ref[0] = jax.lax.dot_general(
            rhs, w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).T

    @jax.jit
    def t1(a1b, w2):
        return pl.pallas_call(
            k_t1, grid=(NCHUNK,),
            in_specs=[pl.BlockSpec((1, 64, m1lanes), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 64, n2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NCHUNK, 64, n2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, m1lanes), jnp.float32)],
        )(a1b, w2)

    a1b = jnp.broadcast_to(a1h[None], (NCHUNK, 64, m1lanes))
    try:
        t = timed(t1, a1b, w2h)
        gf = 2 * 64 * 576 * n2 * NCHUNK / 1e9
        print(f"T1 conv1_2 matmul/img-equiv: {t * 1e3:7.2f} ms "
              f"({gf / t:.0f} GF/s, {gf:.1f} GF)")
    except Exception as e:  # noqa: BLE001
        print(f"T1 FAIL {str(e).splitlines()[0][:140]}")

    # T2 conv1_1 core: (64,27)@(27, 12*804) per chunk
    Wp, rows_in = 804, 12
    n1 = rows_in * Wp
    xin = jnp.asarray(rng.randn(3, n1 + 8).astype(np.float32))
    w1h = jnp.asarray(rng.randn(27, 64).astype(np.float32) * 0.1)

    def k_t2(x_ref, w_ref, o_ref, s_ref):
        s_ref[:] = x_ref[0]
        taps = [s_ref[:, pl.ds(dy * Wp + dx, 10 * Wp)]
                for dy in range(3) for dx in range(3)]
        rhs = jnp.concatenate(taps, axis=0).astype(jnp.bfloat16)
        o_ref[0] = jax.lax.dot_general(
            rhs, w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).T

    @jax.jit
    def t2(xb, w1):
        return pl.pallas_call(
            k_t2, grid=(NCHUNK,),
            in_specs=[pl.BlockSpec((1, 3, n1 + 8), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 64, 10 * Wp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NCHUNK, 64, 10 * Wp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((3, n1 + 8), jnp.float32)],
        )(xb, w1)

    xb = jnp.broadcast_to(xin[None], (NCHUNK, 3, n1 + 8))
    try:
        t = timed(t2, xb, w1h)
        gf = 2 * 64 * 27 * 10 * Wp * NCHUNK / 1e9
        print(f"T2 conv1_1 matmul/img-equiv: {t * 1e3:7.2f} ms "
              f"({gf / t:.0f} GF/s, {gf:.1f} GF)")
    except Exception as e:  # noqa: BLE001
        print(f"T2 FAIL {str(e).splitlines()[0][:140]}")

    # T3 XLA-side relayouts at real scale (batch 8, 608x800)
    NB, H, W = 8, 608, 800
    img = jnp.asarray(rng.randn(NB, H, W, 3).astype(np.float32))

    @jax.jit
    def prep(v):
        vp = jnp.pad(v, ((0, 0), (2, 2), (2, 2), (0, 0)))
        return jnp.transpose(vp, (0, 3, 1, 2)).reshape(NB, 3, -1)
    t = timed(prep, img)
    print(f"T3a input prep NHWC->planar-flat: {t * 1e3:7.2f} ms "
          f"({t / NB * 1e3:.3f} ms/img)")

    pooled = jnp.asarray(rng.randn(NB, 64, (H // 2) * (W // 2))
                         .astype(np.float32))

    @jax.jit
    def unprep(v):
        return jnp.transpose(v.reshape(NB, 64, H // 2, W // 2), (0, 2, 3, 1))
    t = timed(unprep, pooled)
    print(f"T3b output planar->NHWC: {t * 1e3:7.2f} ms "
          f"({t / NB * 1e3:.3f} ms/img)")


if __name__ == "__main__":
    main()
