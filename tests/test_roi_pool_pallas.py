"""Pallas ROI-pool kernel (interpret mode on CPU) vs the numpy oracle and
the jit fallback, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracles import roi_pool_oracle
from wssdl_bus_tpu.ops.roi_pool import roi_pool
from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_grouped, roi_pool_image


def make_case(rng, h=24, w=30, c=8, p=13):
    feat = rng.randn(h, w, c).astype(np.float32)
    x1 = rng.uniform(0, (w - 2) * 16, p)
    y1 = rng.uniform(0, (h - 2) * 16, p)
    rois = np.stack([x1, y1,
                     np.minimum(x1 + rng.uniform(8, 300, p), w * 16 - 1),
                     np.minimum(y1 + rng.uniform(8, 300, p), h * 16 - 1)],
                    axis=1).astype(np.float32)
    # degenerate roi exercising the 1x1 forcing
    rois[0] = [40.0, 40.0, 40.0, 40.0]
    return feat, rois


def test_pallas_fwd_matches_oracle(rng):
    feat, rois = make_case(rng)
    out = roi_pool_image(jnp.asarray(feat), jnp.asarray(rois),
                         7, 7, 1.0 / 16.0, True)
    rois5 = np.concatenate([np.zeros((len(rois), 1), np.float32), rois], 1)
    ref = roi_pool_oracle(feat[None], rois5, 7, 7, 1.0 / 16.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_pallas_bwd_matches_fallback_where_unique(rng):
    """Gradients agree with the jit fallback at positions without ties (the
    fallback splits ties; the kernel routes to the first max like the
    reference's argmax scatter)."""
    feat, rois = make_case(rng, c=4, p=5)
    feat_j, rois_j = jnp.asarray(feat), jnp.asarray(rois)

    def loss_pallas(f):
        out = roi_pool_image(f, rois_j, 7, 7, 1.0 / 16.0, True)
        return jnp.sum(out * (1.0 + jnp.arange(out.size)
                              .reshape(out.shape) * 1e-3))

    rois5 = jnp.concatenate([jnp.zeros((len(rois), 1)), rois_j], 1)

    def loss_fallback(f):
        out = roi_pool(f[None], rois5, 7, 7, 1.0 / 16.0)
        return jnp.sum(out * (1.0 + jnp.arange(out.size)
                              .reshape(out.shape) * 1e-3))

    g_p = np.asarray(jax.grad(loss_pallas)(feat_j))
    g_f = np.asarray(jax.grad(loss_fallback)(feat_j))
    # random floats: ties have measure zero, so the two must agree
    np.testing.assert_allclose(g_p, g_f, rtol=1e-5, atol=1e-5)


def test_pallas_bwd_ties_go_to_first_max():
    """Constant-valued bin: ALL gradient lands on the first (row-major)
    window position — the reference kernel's behaviour."""
    h, w, c = 16, 16, 4
    feat = jnp.zeros((h, w, c), jnp.float32)
    rois = jnp.asarray([[0.0, 0.0, 16 * 7 - 1, 16 * 7 - 1]])  # 7x7 cells

    def loss(f):
        return jnp.sum(roi_pool_image(f, rois, 7, 7, 1.0 / 16.0, True))

    g = np.asarray(jax.grad(loss)(feat))
    assert g.sum() == pytest.approx(49 * c)
    # first-occurrence rule: each bin's whole gradient lands on ONE position
    # (the fallback's tie-splitting would leave fractional values)
    assert set(np.unique(g).tolist()) <= {0.0, 1.0}


def test_grouped_dispatch_fallback(rng):
    feat, rois = make_case(rng, c=4, p=6)
    feats = np.stack([feat, feat * 2.0])
    roisb = np.stack([rois, rois])
    out = roi_pool_grouped(jnp.asarray(feats), jnp.asarray(roisb))
    assert out.shape == (2, 6, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out[1]), 2 * np.asarray(out[0]),
                               rtol=1e-6)


def test_pallas_bwd_skips_zero_cotangent_rois(rng):
    """The backward kernel skips ROIs whose whole gradient block is zero
    (the MIL-sparsity fast path): gradients must still match the fallback
    exactly when only a few ROIs carry cotangents."""
    h, w, c, p = 24, 30, 8, 40
    feat = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    x1 = rng.uniform(0, (w - 2) * 16, p)
    y1 = rng.uniform(0, (h - 2) * 16, p)
    rois = jnp.asarray(np.stack(
        [x1, y1, np.minimum(x1 + 200, w * 16 - 1),
         np.minimum(y1 + 200, h * 16 - 1)], 1).astype(np.float32))
    sel = jnp.zeros((p, 1, 1, 1)).at[3].set(1.0).at[17].set(2.0)

    def loss_p(f):
        return jnp.sum(roi_pool_image(f, rois, 7, 7, 1 / 16.0, True) * sel)

    def loss_f(f):
        r5 = jnp.concatenate([jnp.zeros((p, 1)), rois], 1)
        return jnp.sum(roi_pool(f[None], r5, 7, 7, 1 / 16.0) * sel)

    gp = jax.grad(loss_p)(feat)
    gf = jax.grad(loss_f)(feat)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gf), atol=1e-5)
    assert int((np.asarray(gp) != 0).sum()) > 0
