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

# ---- fused pool+flatten ("fc") kernel: compiled Mosaic vs interpret ----
from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_fc, roi_pool_fc_image
from functools import partial

ref_flat = np.asarray(
    roi_pool_grouped(jnp.asarray(feat), jnp.asarray(boxes))).reshape(2, 64, -1)
out_f32 = np.asarray(roi_pool_fc(jnp.asarray(feat), jnp.asarray(boxes)))
np.testing.assert_array_equal(out_f32, ref_flat)
print("fc fwd f32 OK (== general kernel, flat)")

out_bf = np.asarray(roi_pool_fc(jnp.asarray(feat), jnp.asarray(boxes),
                                out_dtype=jnp.bfloat16), np.float32)
np.testing.assert_array_equal(
    out_bf, np.asarray(jnp.asarray(ref_flat).astype(jnp.bfloat16),
                       np.float32))
print("fc fwd bf16 OK (== rounded f32)")

# f32 backward: compiled Mosaic == interpret EXACTLY at the production
# shape (random f32 features are tie-free, so routing is forced)
fc_i = partial(roi_pool_fc_image, pooled_h=7, pooled_w=7,
               spatial_scale=1 / 16.0, interpret=True)

def loss_c(f):
    out = jax.vmap(lambda fi, bi: roi_pool_fc_image(fi, bi))(
        f, jnp.asarray(boxes))
    return jnp.sum(out ** 2)

def loss_i(f):
    out = jax.vmap(lambda fi, bi: fc_i(fi, bi))(f, jnp.asarray(boxes))
    return jnp.sum(out ** 2)

g_c = np.asarray(jax.grad(loss_c)(jnp.asarray(feat)))
g_i = np.asarray(jax.grad(loss_i)(jnp.asarray(feat)))
np.testing.assert_array_equal(g_c, g_i)
print("fc bwd f32 OK (compiled == interpret, production shape)")

# bf16 option backward: tie-free bf16-exact features force the routing
octaves = np.concatenate([(1.0 + np.arange(128) / 128.0) * 2.0 ** e
                          for e in range(-6, 10)])
sfeat = rng.choice(octaves, size=16 * 16 * 8, replace=False) \
    .reshape(1, 16, 16, 8).astype(np.float32)
sboxes = np.zeros((1, 8, 4), np.float32)
x1 = rng.uniform(0, 14 * 16, 8); y1 = rng.uniform(0, 14 * 16, 8)
sboxes[0] = np.stack([x1, y1, np.minimum(x1 + 120, 255),
                      np.minimum(y1 + 120, 255)], 1)
fc_bf = partial(roi_pool_fc_image, pooled_h=7, pooled_w=7,
                spatial_scale=1 / 16.0, out_dtype=jnp.bfloat16)

def sloss(interp):
    def f(x):
        out = jax.vmap(lambda fi, bi: fc_bf(fi, bi, interpret=interp))(
            x, jnp.asarray(sboxes))
        return jnp.sum(out.astype(jnp.float32) ** 2)
    return f

g_sc = np.asarray(jax.grad(sloss(False))(jnp.asarray(sfeat)))
g_si = np.asarray(jax.grad(sloss(True))(jnp.asarray(sfeat)))
np.testing.assert_array_equal(g_sc, g_si)
print("fc bwd bf16 OK (compiled == interpret, tie-free bf16-exact feat)")
