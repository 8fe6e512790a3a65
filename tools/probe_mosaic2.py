"""Round-2 Mosaic probes: the exact shapes/idioms the fused VGG stem needs
(see tools/probe_mosaic.py for the support matrix already measured —
ref-loads at sublane offsets feeding concat/matmul lower fine; value-slices
at offsets do not).  These pin down the remaining unknowns:

  L. 9x ref-load (m1, 3) at offsets -> lane concat to (m1, 27)   [conv1_1]
  M. 3x ref-load (m2+2, 64) from scratch -> lane concat to 192   [conv1_2 dy]
  N. strided value slice [::2] on (404, 64)                       [pool alt]
  O. reshape (416, 64) -> (4, 2, 52, 2, 64) + max (original pool)
  P. matmul lhs direct from ref-load at sublane offset            [conv1_2 dx]
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WLOC = 52          # the W=96 test case: wloc = 96//2 + 4
M1 = (8 + 2) * WLOC + 2
M2 = 8 * WLOC


def run(name, fn, want=None):
    try:
        out = np.asarray(jax.jit(fn)())
        tag = ""
        if want is not None:
            ok = np.allclose(out, want, rtol=1e-5, atol=1e-5)
            tag = " MATCH" if ok else " *** VALUE MISMATCH ***"
        print(f"OK    {name}: sum={out.sum():.3f}{tag}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")
        key = next((ln for ln in msg if "implemented" in ln.lower()
                    or "mismatch" in ln.lower()
                    or "unsupported" in ln.lower()), msg[0])
        print(f"FAIL  {name}: {key.strip()[:140]}")


def vspec(n=1):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn((8 + 5) * WLOC, 3).astype(np.float32))
    x64 = jnp.asarray(rng.randn(M1, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(192, 64).astype(np.float32) * 0.1)

    # L: conv1_1 tap gather — 9 ref-loads at sublane offsets, 3-lane inputs
    def k_l(x_ref, o_ref):
        taps = [x_ref[pl.ds(dy * WLOC + dx, M1), :]
                for dy in range(3) for dx in range(3)]
        o_ref[:] = jnp.concatenate(taps, axis=1)
    want_l = np.concatenate(
        [np.asarray(xs)[o:o + M1] for o in
         [dy * WLOC + dx for dy in range(3) for dx in range(3)]], axis=1)
    run("L 9x ref-load (m1,3) -> concat 27 lanes",
        lambda: pl.pallas_call(
            k_l, out_shape=jax.ShapeDtypeStruct((M1, 27), jnp.float32),
            in_specs=vspec(), out_specs=vspec()[0])(xs), want_l)

    # M: scratch store + 3 dy ref-loads (64-lane inputs) -> concat 192
    def k_m(x_ref, o_ref, s_ref):
        s_ref[:] = x_ref[:] * 2.0
        taps = [s_ref[pl.ds(dy * WLOC, M2 + 2), :] for dy in range(3)]
        o_ref[:] = jnp.concatenate(taps, axis=1)
    want_m = np.concatenate(
        [2.0 * np.asarray(x64)[dy * WLOC: dy * WLOC + M2 + 2]
         for dy in range(3)], axis=1)
    run("M scratch + 3x ref-load (m2+2,64) -> concat 192",
        lambda: pl.pallas_call(
            k_m, out_shape=jax.ShapeDtypeStruct((M2 + 2, 192), jnp.float32),
            in_specs=vspec(), out_specs=vspec()[0],
            scratch_shapes=[pltpu.VMEM((M1, 64), jnp.float32)])(x64), want_m)

    # N: strided value slice [::2]
    def k_n(x_ref, o_ref):
        o_ref[:] = x_ref[:][::2, :]
    run("N value[::2] (m1,64)",
        lambda: pl.pallas_call(
            k_n, out_shape=jax.ShapeDtypeStruct(((M1 + 1) // 2, 64),
                                                jnp.float32),
            in_specs=vspec(), out_specs=vspec()[0])(x64),
        np.asarray(x64)[::2])

    # O: the original pool reshape (m2,64)->(4,2,wloc//2,2,64) + max
    def k_o(x_ref, o_ref):
        y = x_ref[pl.ds(0, M2), :]
        yv = y.reshape(4, 2, WLOC // 2, 2, 64)
        o_ref[:] = jnp.max(jnp.max(yv, axis=3), axis=1)
    y_np = np.asarray(x64)[:M2].reshape(4, 2, WLOC // 2, 2, 64)
    run("O pool reshape (m2,64)->(4,2,w/2,2,64) + max",
        lambda: pl.pallas_call(
            k_o, out_shape=jax.ShapeDtypeStruct((4, WLOC // 2, 64),
                                                jnp.float32),
            in_specs=vspec(), out_specs=vspec()[0])(x64),
        y_np.max(axis=(1, 3)))

    # P: matmul lhs directly from a ref-load at a sublane offset
    def k_p(x_ref, w_ref, o_ref, s_ref):
        s_ref[:] = jnp.concatenate(
            [x_ref[pl.ds(dy * WLOC, M2 + 2), :] for dy in range(3)], axis=1)
        acc = jnp.zeros((M2, 64), jnp.float32)
        for dx in range(3):
            acc = acc + jnp.dot(s_ref[pl.ds(dx, M2), :], w_ref[:],
                                preferred_element_type=jnp.float32)
        o_ref[:] = acc
    a1cat = np.concatenate(
        [np.asarray(x64)[dy * WLOC: dy * WLOC + M2 + 2] for dy in range(3)],
        axis=1)
    want_p = sum(a1cat[dx: dx + M2] @ np.asarray(w) for dx in range(3))
    run("P ref-load offset lhs -> 3 matmuls K=192",
        lambda: pl.pallas_call(
            k_p, out_shape=jax.ShapeDtypeStruct((M2, 64), jnp.float32),
            in_specs=vspec(2), out_specs=vspec()[0],
            scratch_shapes=[pltpu.VMEM((M2 + 2, 192), jnp.float32)])(x64, w),
        want_p)


if __name__ == "__main__":
    main()
