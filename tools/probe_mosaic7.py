"""Full-size phase isolation of the hybrid stem (probe_mosaic5 crashed the
compiler at NB=8, H=608 with no diagnostic; probe_mosaic6 proved the Pallas
tail itself lowers at small size).  Phases, each try/except:

  P1  conv1_1 with ((2,2),(2,2)) padding, jitted alone
  P2  window materialisation (76 overlapping slices -> stack), alone
  P3  Pallas tail on a device-put xc, alone
  P4  the full composed stem

Run on the TPU:  python tools/probe_mosaic7.py [bf16]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")
from probe_mosaic5 import (NB, H, W, Wr, WIN, NROW, conv1_1_pad, hybrid_tail,
                           run_tail, make_stem, stem_xla)  # noqa: E402


def timed(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    dt = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    print("backend:", jax.default_backend(), "stream dtype:", dt.__name__,
          f"NB={NB} H={H} W={W}")
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(NB, H, W, 3).astype(np.float32))
    w1 = jax.device_put((rng.randn(3, 3, 3, 64) * 0.1).astype(np.float32))
    b1 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w2 = jax.device_put((rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32))
    b2 = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w2m = jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 192, 64) \
             .astype(jnp.bfloat16)
    b2m = b2.reshape(1, 64).astype(np.float32)

    a1p = None
    try:
        c11 = jax.jit(lambda v: conv1_1_pad(v, w1, b1, dt))
        a1p = jax.block_until_ready(c11(x))
        t = timed(c11, x)
        print(f"P1 conv1_1+pad OK {t / NB * 1e3:.3f} ms/img")
    except Exception as e:
        print(f"P1 conv1_1+pad FAIL {str(e)[:200]}")

    xc = None
    if a1p is not None:
        try:
            mat = jax.jit(hybrid_tail)
            xc = jax.block_until_ready(mat(a1p))
            t = timed(mat, a1p)
            print(f"P2 window mat  OK {t / NB * 1e3:.3f} ms/img "
                  f"xc={xc.shape} {xc.dtype}")
        except Exception as e:
            print(f"P2 window mat  FAIL {str(e)[:200]}")

    if xc is None:  # build on host
        flat = np.zeros((NB, (H + 2) * Wr + 2, 64), np.float32)
        xc = jax.device_put(np.stack(
            [flat[:, c * 8 * Wr: c * 8 * Wr + WIN] for c in range(NROW)],
            axis=1).astype(dt))
        print("P2 skipped -> host-built zeros xc")

    try:
        tail = jax.jit(lambda a: run_tail(a, w2m, b2m))
        out = jax.block_until_ready(tail(xc))
        t = timed(tail, xc)
        print(f"P3 pallas tail OK {t / NB * 1e3:.3f} ms/img out={out.shape}")
    except Exception as e:
        print(f"P3 pallas tail FAIL {str(e)[:200]}")

    try:
        stem = make_stem(dt)
        got = jax.block_until_ready(stem(x, w1, b1, w2, b2))
        want = np.asarray(stem_xla(x, w1, b1, w2, b2))
        rms = float(np.sqrt(((np.asarray(got) - want) ** 2).mean())
                    / np.sqrt((want ** 2).mean()))
        t = timed(stem, x, w1, b1, w2, b2)
        tx = timed(stem_xla, x, w1, b1, w2, b2)
        print(f"P4 full hybrid OK {t / NB * 1e3:.3f} ms/img rms={rms:.2e} "
              f"(XLA stem {tx / NB * 1e3:.3f})")
    except Exception as e:
        print(f"P4 full hybrid FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
