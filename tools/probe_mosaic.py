"""Probe which Mosaic lowering patterns this TPU toolchain supports.

The fused-stem kernel (ops/conv1_pallas.py) needs shifted views of VMEM
values feeding lane-concatenates and matmuls.  Several candidate idioms
exist; this Mosaic build (axon remote compile) rejects some of them:

  * ``tpu.dynamic_rotate`` on non-32-bit data       -> "not implemented"
  * constant rolls / offset value-slices fold into lazy vpad layout
    offsets, and ``tpu.concatenate`` then fails with "result/input offset
    mismatch on non-concat dimension"
  * ``tpu.dynamic_rotate`` on lane-unaligned shapes (e.g. (676, 3))
    -> "unsupported unaligned shape"

Each probe below compiles (and runs) one micro-kernel exercising one
idiom and reports ok/fail, so kernel designs can be chosen against the
measured support matrix instead of guesswork.  Run on the TPU:

    python tools/probe_mosaic.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = np.asarray(jax.jit(fn)())
        print(f"OK    {name}: out_sum={out.sum():.3f}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")
        key = next((ln for ln in msg if "implemented" in ln.lower()
                    or "mismatch" in ln.lower() or "unsupported" in ln.lower()),
                   msg[0])
        print(f"FAIL  {name}: {key.strip()[:140]}")
        return False


def pcall(kernel, out_shape, n_in=1, smem_zero=False):
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in
    if smem_zero:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    return pl.pallas_call(kernel, out_shape=out_shape, in_specs=in_specs,
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))


def main():
    print("backend:", jax.default_backend())
    x = jnp.arange(288 * 128, dtype=jnp.float32).reshape(288, 128) * 1e-4
    xs = jnp.arange(288 * 3, dtype=jnp.float32).reshape(288, 3) * 1e-4
    w = jnp.ones((128, 128), jnp.float32) * 1e-2
    zero = jnp.zeros((1,), jnp.int32)
    out256x384 = jax.ShapeDtypeStruct((256, 384), jnp.float32)
    out256x128 = jax.ShapeDtypeStruct((256, 128), jnp.float32)

    # A. value-slice at sublane offsets -> lane concat (the original design)
    def k_a(x_ref, o_ref):
        t = [x_ref[:][i:i + 256, :] for i in range(3)]
        o_ref[:] = jnp.concatenate(t, axis=1)
    run("A value-slice offsets 0/1/2 -> concat(lanes)",
        lambda: pcall(k_a, out256x384)(x))

    # B. ref-slice loads at static sublane offsets -> lane concat
    def k_b(x_ref, o_ref):
        t = [x_ref[pl.ds(i, 256), :] for i in range(3)]
        o_ref[:] = jnp.concatenate(t, axis=1)
    run("B ref-load ds(0/1/2) -> concat(lanes)",
        lambda: pcall(k_b, out256x384)(x))

    # C. ref loads at DYNAMIC (SMEM zero + i) offsets -> lane concat
    def k_c(z_ref, x_ref, o_ref):
        z = z_ref[0]
        t = [x_ref[pl.ds(z + i, 256), :] for i in range(3)]
        o_ref[:] = jnp.concatenate(t, axis=1)
    run("C ref-load ds(zero+i) -> concat(lanes)",
        lambda: pcall(k_c, out256x384, smem_zero=True)(zero, x))

    # D. dynamic rotate, fully (8,128)-aligned shape
    def k_d(z_ref, x_ref, o_ref):
        r = pltpu.roll(x_ref[:], z_ref[0] + 1, 0)
        o_ref[:] = r[:256, :]
    run("D dyn-rotate (288,128) aligned",
        lambda: pcall(k_d, out256x128, smem_zero=True)(zero, x))

    # E. dynamic rotate -> front slice -> lane concat
    def k_e(z_ref, x_ref, o_ref):
        z = z_ref[0]
        t = [pltpu.roll(x_ref[:], z + 288 - i, 0)[:256, :] for i in range(3)]
        o_ref[:] = jnp.concatenate(t, axis=1)
    run("E dyn-rotate aligned -> concat(lanes)",
        lambda: pcall(k_e, out256x384, smem_zero=True)(zero, x))

    # F. value-slices at sublane offsets feeding MATMULS (no concat)
    def k_f(x_ref, o_ref):
        xv = x_ref[:]
        acc = jnp.zeros((256, 128), jnp.float32)
        for i in range(3):
            acc = acc + jnp.dot(xv[i:i + 256, :], w,
                                preferred_element_type=jnp.float32)
        o_ref[:] = acc
    run("F value-slice offsets -> matmul accumulate",
        lambda: pcall(k_f, out256x128)(x))

    # G. static roll -> concat (folds to lazy offsets; expected fail)
    def k_g(x_ref, o_ref):
        t = [pltpu.roll(x_ref[:], 288 - i, 0)[:256, :] for i in range(3)]
        o_ref[:] = jnp.concatenate(t, axis=1)
    run("G static-roll -> concat(lanes)",
        lambda: pcall(k_g, out256x384)(x))

    # H. dynamic rotate on narrow lanes (256,3)
    def k_h(z_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], z_ref[0] + 1, 0)
    run("H dyn-rotate (288,3) narrow lanes",
        lambda: pcall(k_h, jax.ShapeDtypeStruct((288, 3), jnp.float32),
                      smem_zero=True)(zero, xs))

    # I. dynamic rotate on (288,64) half-lane
    x64 = x[:, :64]
    def k_i(z_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], z_ref[0] + 1, 0)
    run("I dyn-rotate (288,64) lanes=64",
        lambda: pcall(k_i, jax.ShapeDtypeStruct((288, 64), jnp.float32),
                      smem_zero=True)(zero, x64))

    # J. sublane-dim concat of offset slices (concat on the OFFSET dim)
    def k_j(x_ref, o_ref):
        t = [x_ref[:][i:i + 128, :] for i in range(2)]
        o_ref[:] = jnp.concatenate(t, axis=0)
    run("J value-slice offsets -> concat(sublanes)",
        lambda: pcall(k_j, out256x128)(x))

    # K. store value-slices into scratch at lane offsets, then one load
    def k_k(x_ref, o_ref, s_ref):
        xv = x_ref[:]
        for i in range(3):
            s_ref[:, i * 128:(i + 1) * 128] = xv[i:i + 256, :]
        o_ref[:] = s_ref[:]
    run("K slice -> scratch stores at lane offsets -> load",
        lambda: pl.pallas_call(
            k_k, out_shape=out256x384,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((256, 384), jnp.float32)])(x))


if __name__ == "__main__":
    main()
