"""Fused pool+flatten Pallas kernel (``roi_pool_fc``, interpret mode on
CPU): forward vs the numpy oracle (bit-exact; the bf16 option equals the
rounded oracle — rounding commutes with max), backward routing vs the jit
fallback, and the grouped wrapper's dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracles import roi_pool_oracle
from tests.test_roi_pool_pallas import make_case
from wssdl_bus_tpu.ops.roi_pool import roi_pool
from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_fc, roi_pool_fc_image


def unique_bf16_feat(rng, h, w, c):
    """Features whose values are distinct and exactly bf16-representable:
    no rounding on the cast, no rounding-induced ties — so the bf16 path's
    first-max routing is forced to match the f32 fallback's."""
    octaves = []
    for e in range(-6, 10):
        octaves.append((1.0 + np.arange(128) / 128.0) * 2.0 ** e)
    pool = np.concatenate(octaves)
    assert len(pool) >= h * w * c
    vals = rng.choice(pool, size=h * w * c, replace=False)
    feat = vals.reshape(h, w, c).astype(np.float32)
    assert np.array_equal(feat, feat.astype(jnp.bfloat16).astype(np.float32))
    return feat


def test_fc_fwd_matches_oracle_f32(rng):
    feat, rois = make_case(rng)
    out = roi_pool_fc_image(jnp.asarray(feat), jnp.asarray(rois),
                            7, 7, 1.0 / 16.0, True)
    assert out.dtype == jnp.float32
    rois5 = np.concatenate([np.zeros((len(rois), 1), np.float32), rois], 1)
    ref = roi_pool_oracle(feat[None], rois5, 7, 7, 1.0 / 16.0)
    assert out.shape == (len(rois), 7 * 7 * feat.shape[-1])
    np.testing.assert_allclose(np.asarray(out),
                               ref.reshape(len(rois), -1), rtol=1e-6)


@pytest.mark.slow  # bf16 variant; the f32 fwd+bwd oracles stay in
# the fast lane
def test_fc_fwd_bf16_equals_rounded_oracle(rng):
    """max(round(x)) == round(max(x)): the bf16 option's output must equal
    the f32 oracle rounded to bf16, element for element."""
    feat, rois = make_case(rng)
    out = roi_pool_fc_image(jnp.asarray(feat), jnp.asarray(rois),
                            7, 7, 1.0 / 16.0, True, "gpu", jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    rois5 = np.concatenate([np.zeros((len(rois), 1), np.float32), rois], 1)
    ref = roi_pool_oracle(feat[None], rois5, 7, 7, 1.0 / 16.0)
    ref_bf = jnp.asarray(ref.reshape(len(rois), -1)).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref_bf, np.float32))


def test_fc_bwd_matches_fallback_f32(rng):
    """Default (f32) backward == the jit fallback exactly on random floats
    (ties have measure zero) — the flat layout changes no values."""
    feat, rois = make_case(rng, c=4, p=5)
    feat_j, rois_j = jnp.asarray(feat), jnp.asarray(rois)
    p = len(rois)
    wts = (1.0 + (np.arange(p * 7 * 7 * 4) % 3)).astype(np.float32)

    def loss_fc(f):
        out = roi_pool_fc_image(f, rois_j, 7, 7, 1.0 / 16.0, True)
        return jnp.sum(out * wts.reshape(out.shape))

    rois5 = jnp.concatenate([jnp.zeros((p, 1)), rois_j], 1)

    def loss_fallback(f):
        out = roi_pool(f[None], rois5, 7, 7, 1.0 / 16.0)
        return jnp.sum(out * wts.reshape(out.shape))

    g_fc = np.asarray(jax.grad(loss_fc)(feat_j))
    g_f = np.asarray(jax.grad(loss_fallback)(feat_j))
    np.testing.assert_allclose(g_fc, g_f, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # bf16 bwd; the f32 fwd+bwd oracles stay in
# the fast lane
def test_fc_bwd_bf16_matches_fallback_on_bf16_exact_feat(rng):
    """On tie-free bf16-exact features with bf16-exact cotangent weights the
    bf16 option's f32 dfeat equals the jit fallback's exactly (no rounding
    anywhere, unique maxima => identical routing)."""
    h, w, c, p = 16, 16, 4, 5
    feat = unique_bf16_feat(rng, h, w, c)
    _, rois = make_case(rng, h=h, w=w, c=c, p=p)
    feat_j, rois_j = jnp.asarray(feat), jnp.asarray(rois)
    wts = (1.0 + (np.arange(p * 7 * 7 * c) % 3)).astype(np.float32)

    def loss_fc(f):
        out = roi_pool_fc_image(f, rois_j, 7, 7, 1.0 / 16.0, True, "gpu",
                                jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) * wts.reshape(out.shape))

    rois5 = jnp.concatenate([jnp.zeros((p, 1)), rois_j], 1)

    def loss_fallback(f):
        out = roi_pool(f[None], rois5, 7, 7, 1.0 / 16.0)
        return jnp.sum(out * wts.reshape(out.shape))

    g_fc = np.asarray(jax.grad(loss_fc)(feat_j))
    g_f = np.asarray(jax.grad(loss_fallback)(feat_j))
    assert g_fc.dtype == np.float32
    np.testing.assert_array_equal(g_fc, g_f)


@pytest.mark.slow  # tie-break oracle; the f32 fwd+bwd oracles stay in
# the fast lane
def test_fc_bwd_ties_go_to_first_max():
    h, w, c = 16, 16, 4
    feat = jnp.zeros((h, w, c), jnp.float32)
    rois = jnp.asarray([[0.0, 0.0, 16 * 7 - 1, 16 * 7 - 1]])

    def loss(f):
        return jnp.sum(roi_pool_fc_image(f, rois, 7, 7, 1.0 / 16.0, True))

    g = np.asarray(jax.grad(loss)(feat))
    assert g.sum() == pytest.approx(49 * c)
    assert set(np.unique(g).tolist()) <= {0.0, 1.0}


@pytest.mark.slow  # bwd sparsity variant; the f32 fwd+bwd oracles stay in
# the fast lane
def test_fc_bwd_skips_zero_cotangent_rois(rng):
    """The backward's precomputed active-flag guard must leave inactive
    rois' scatters out without changing any active roi's gradient."""
    h, w, c, p = 16, 16, 4, 24
    feat = jnp.asarray(unique_bf16_feat(rng, h, w, c))
    x1 = rng.uniform(0, (w - 2) * 16, p)
    y1 = rng.uniform(0, (h - 2) * 16, p)
    rois = jnp.asarray(np.stack(
        [x1, y1, np.minimum(x1 + 200, w * 16 - 1),
         np.minimum(y1 + 200, h * 16 - 1)], 1).astype(np.float32))
    sel = np.zeros((p, 7 * 7 * c), np.float32)
    sel[3] = 1.0
    sel[17] = 2.0
    sel_j = jnp.asarray(sel)

    def loss_fc(f):
        out = roi_pool_fc_image(f, rois, 7, 7, 1 / 16.0, True)
        return jnp.sum(out * sel_j)

    def loss_f(f):
        r5 = jnp.concatenate([jnp.zeros((p, 1)), rois], 1)
        out = roi_pool(f[None], r5, 7, 7, 1 / 16.0)
        return jnp.sum(out * sel_j.reshape(out.shape))

    gp = np.asarray(jax.grad(loss_fc)(feat))
    gf = np.asarray(jax.grad(loss_f)(feat))
    np.testing.assert_array_equal(gp, gf)
    assert int((gp != 0).sum()) > 0


@pytest.mark.slow  # bf16 guard; the f32 fwd+bwd oracles stay in
# the fast lane
def test_fc_bwd_bf16_flag_guard_skips_inactive_rois(rng):
    """The bf16 option is the path that uses _fc_bwd_kernel's precomputed
    active-flag column (f32 routes through the 4-D kernel's in-kernel
    guard): with a sparse cotangent, inactive rois must contribute nothing
    and active rois must match the fallback exactly on tie-free
    bf16-exact features."""
    h, w, c, p = 16, 16, 4, 24
    feat = jnp.asarray(unique_bf16_feat(rng, h, w, c))
    x1 = rng.uniform(0, (w - 2) * 16, p)
    y1 = rng.uniform(0, (h - 2) * 16, p)
    rois = jnp.asarray(np.stack(
        [x1, y1, np.minimum(x1 + 200, w * 16 - 1),
         np.minimum(y1 + 200, h * 16 - 1)], 1).astype(np.float32))
    sel = np.zeros((p, 7 * 7 * c), np.float32)
    sel[5] = 1.0
    sel[20] = 2.0
    sel_j = jnp.asarray(sel)

    def loss_fc(f):
        out = roi_pool_fc_image(f, rois, 7, 7, 1 / 16.0, True, "gpu",
                                jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) * sel_j)

    def loss_f(f):
        r5 = jnp.concatenate([jnp.zeros((p, 1)), rois], 1)
        out = roi_pool(f[None], r5, 7, 7, 1 / 16.0)
        return jnp.sum(out * sel_j.reshape(out.shape))

    gp = np.asarray(jax.grad(loss_fc)(feat))
    gf = np.asarray(jax.grad(loss_f)(feat))
    np.testing.assert_array_equal(gp, gf)
    assert int((gp != 0).sum()) > 0


@pytest.mark.slow  # bf16 cotangent; the f32 fwd+bwd oracles stay in
# the fast lane
def test_fc_bf16_primal_gets_bf16_cotangent(rng):
    """Differentiating through roi_pool_fc_image with a bfloat16 feature
    input must produce a bfloat16 dfeat (custom_vjp dtype contract)."""
    feat, rois = make_case(rng, h=16, w=16, c=4, p=3)
    feat_bf = jnp.asarray(feat).astype(jnp.bfloat16)

    def loss(f):
        out = roi_pool_fc_image(f, jnp.asarray(rois), 7, 7, 1 / 16.0, True,
                                "gpu", jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(loss)(feat_bf)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_fc_grouped_fallback_dispatch(rng):
    feat, rois = make_case(rng, c=4, p=6)
    feats = np.stack([feat, feat * 2.0])
    roisb = np.stack([rois, rois])
    from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_grouped
    ref = roi_pool_grouped(jnp.asarray(feats), jnp.asarray(roisb))
    out = roi_pool_fc(jnp.asarray(feats), jnp.asarray(roisb))
    assert out.shape == (2, 6, 7 * 7 * 4)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(ref.reshape(2, 6, -1)))
    out_bf = roi_pool_fc(jnp.asarray(feats), jnp.asarray(roisb),
                         out_dtype=jnp.bfloat16)
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out_bf, np.float32),
        np.asarray(ref.reshape(2, 6, -1).astype(jnp.bfloat16), np.float32))
