"""Microbenchmark: ResNet stem conv0 (7x7/2 on a 3-channel canvas) vs a
space-to-depth-equivalent formulation, on the current backend.

The 3-channel input starves the MXU's 128-lane contraction on conv0; the
classic TPU fix (MLPerf ResNet) reshapes the image HxWx3 -> (H/2)x(W/2)x12
and convolves with a 4x4/1 kernel that is an exact rearrangement of the
(zero-padded-to-8x8) 7x7/2 kernel, quadrupling the contraction depth and
quartering the spatial extent.  Run from the repo root:

    python tools/bench_stem.py            # real TPU
    JAX_PLATFORMS=cpu python tools/bench_stem.py

Uses the chained-dispatch protocol (see bench.py) because the relay dedupes
identical dispatches and only a value fetch is a trustworthy sync.

RESULT (v5e via relay, 2026-08-17): NEGATIVE — direct 1.152 ms, s2d
1.360 ms (0.85x), max|diff| 7e-7.  XLA's own stem handling on v5e already
covers the C=3 lane-starvation (and per-dispatch relay overhead bounds both
sides); the rearrangement is NOT integrated into models/resnet.py.  Kept as
a recorded experiment so the idea isn't re-tried blindly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


H, W = 608, 800


def conv0(x, k):
    # flax Conv SAME padding for kernel 7 stride 2: pad 2 before, 3 after
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), [(2, 3), (2, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_weights(k):
    """[7,7,3,64] -> [4,4,12,64] exact rearrangement.

    Pad the kernel to 8x8 by one TRAILING row/col of zeros so the 8-tap
    window stays aligned to the 2x2 phase grid: output position (i,j) of the
    stride-2 SAME conv reads fine rows 2i-2..2i+4; with the zero tap that is
    rows 2i-2..2i+5 = coarse rows i-1..i+2 at both phases, i.e. a 4x4 VALID
    conv on the (H/2,W/2,12) tensor padded by (1,2) on each spatial side.
    """
    k8 = jnp.pad(k, [(0, 1), (0, 1), (0, 0), (0, 0)])  # [8,8,3,64]
    # coarse tap (p, q) phase (a, b): fine tap (2p+a, 2q+b)
    k8 = k8.reshape(4, 2, 4, 2, 3, 64)            # [P,a,Q,b,I,O]
    return k8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)


def s2d_input(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def conv0_s2d(x, k12):
    xs = s2d_input(x)
    xs = jnp.pad(xs, [(0, 0), (1, 2), (1, 2), (0, 0)])
    return jax.lax.conv_general_dilated(
        xs, k12, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def time_fn(fn, *args, iters=50):
    @jax.jit
    def chained(c, *a):
        out = fn(a[0] + c * 1e-9, *a[1:])
        return c + out[0, 0, 0, 0] * 1e-9

    c = jnp.float32(0.0)
    for _ in range(5):
        c = chained(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = chained(c, *args)
    float(c)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.float32)
    k12 = s2d_weights(k)

    a = conv0(x, k)
    b = conv0_s2d(x, k12)
    assert a.shape == b.shape, (a.shape, b.shape)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"shape {a.shape}  max|direct - s2d| = {err:.2e}")

    t_ref = time_fn(conv0, x, k)
    t_s2d = time_fn(conv0_s2d, x, k12)
    print(f"conv0 direct : {t_ref * 1e3:.3f} ms")
    print(f"conv0 s2d    : {t_s2d * 1e3:.3f} ms  ({t_ref / t_s2d:.2f}x)")


if __name__ == "__main__":
    main()
