"""Real-TPU spot check: Pallas ROI pool (both flavors) vs the numpy oracle,
and the backward vs the jit fallback. Run from the repo root."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_grouped
from tests.oracles import roi_pool_oracle

rng = np.random.RandomState(0)
feat = rng.randn(2, 38, 50, 512).astype(np.float32)
boxes = np.zeros((2, 64, 4), np.float32)
for b in range(2):
    x1 = rng.uniform(0, 700, 64); y1 = rng.uniform(0, 500, 64)
    w = rng.uniform(8, 300, 64); h = rng.uniform(8, 300, 64)
    boxes[b] = np.stack([x1, y1, np.minimum(x1 + w, 799),
                         np.minimum(y1 + h, 607)], 1)
rois5 = np.concatenate([
    np.concatenate([np.full((64, 1), b, np.float32), boxes[b]], 1)
    for b in range(2)], 0)

for flavor in ("gpu", "cpu"):
    out = np.asarray(roi_pool_grouped(jnp.asarray(feat), jnp.asarray(boxes),
                                      flavor=flavor))
    ref = roi_pool_oracle(feat, rois5, 7, 7, 1 / 16.0, flavor=flavor)
    np.testing.assert_array_equal(out.reshape(-1, 7, 7, 512), ref)
    print(f"fwd {flavor} OK")

def loss(f):
    return jnp.sum(roi_pool_grouped(f, jnp.asarray(boxes)) ** 2)

def loss_fb(f):
    return jnp.sum(roi_pool_grouped(f, jnp.asarray(boxes),
                                    force_fallback=True) ** 2)

g_pl = np.asarray(jax.grad(loss)(jnp.asarray(feat)))
g_fb = np.asarray(jax.grad(loss_fb)(jnp.asarray(feat)))
np.testing.assert_allclose(g_pl, g_fb, rtol=1e-5, atol=1e-5)
print("bwd OK (matches fallback)")
