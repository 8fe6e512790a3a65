"""Fused stem-tail Pallas kernel (ops/conv2_pool_pallas.py) — CPU
correctness via ``interpret=True`` against the plain-XLA conv1_2+pool,
plus eligibility-gate edge cases and the pair-packed weight layout.
Real-TPU numerics/perf live in tools/check_stem_tail_tpu.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from wssdl_bus_tpu.ops.conv2_pool_pallas import (R, conv2_pool_ok,
                                                 conv2_pool_shape_ok,
                                                 pack_conv2_weights,
                                                 vgg_conv2_pool,
                                                 vgg_conv2_pool_reference)


def _weights(rng):
    w2 = (rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32)
    b2 = (rng.randn(64) * 0.1).astype(np.float32)
    return w2, b2


def _bf16_round(a):
    return np.asarray(jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32))


@pytest.mark.parametrize("shape", [
    (1, 16, 32, 64),   # minimum eligible H and W
    (3, 16, 48, 64),   # odd batch, minimal rows
    (2, 48, 64, 64),   # several row chunks per image
    (1, 32, 80, 64),   # W % 16 == 0 but not a power of two
])
def test_tail_matches_reference(shape, rng):
    """bf16-rounded inputs make the kernel's bf16 x bf16 -> f32 matmul
    EXACT, so the only remaining difference vs the f32 XLA conv is the f32
    accumulation order — agreement to f32-roundoff.  The border rows/cols
    exercise the halo and edge-mask logic (top/bottom chunks, the pair-0
    dp = -1 and pair-last dp = +1 masks)."""
    w2, b2 = _weights(rng)
    w2 = _bf16_round(w2)
    a1 = np.abs(_bf16_round(rng.randn(*shape).astype(np.float32)))
    assert conv2_pool_shape_ok(shape)
    ref = np.asarray(vgg_conv2_pool_reference(a1, w2, b2))
    out = np.asarray(vgg_conv2_pool(a1, w2, b2, interpret=True))
    assert out.shape == (shape[0], shape[1] // 2, shape[2] // 2, 64)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_tail_bf16_tolerance_random_f32(rng):
    """Raw f32 inputs: the kernel ships its input stream bf16 (matching
    XLA's excess-precision storage inside the real trunk), so agreement
    with the all-f32 reference is at bf16-rounding level."""
    w2, b2 = _weights(rng)
    a1 = np.abs(rng.randn(2, 32, 32, 64)).astype(np.float32)
    ref = np.asarray(vgg_conv2_pool_reference(a1, w2, b2))
    out = np.asarray(vgg_conv2_pool(a1, w2, b2, interpret=True))
    rms = float(np.sqrt(((out - ref) ** 2).mean())
                / np.sqrt((ref ** 2).mean()))
    assert rms < 0.01, rms


def test_tail_border_zeros_exact(rng):
    """An input whose only nonzero values sit on the image border pins the
    SAME-padding semantics: every out-of-image tap must contribute exactly
    zero (clamped-then-zeroed halo rows vertically, pair edge masks
    horizontally)."""
    w2, b2 = _weights(rng)
    w2 = _bf16_round(w2)
    a1 = np.zeros((1, 16, 32, 64), np.float32)
    border = np.abs(_bf16_round(rng.randn(16, 32, 64).astype(np.float32)))
    a1[0, 0, :], a1[0, -1, :] = border[0], border[-1]
    a1[0, :, 0], a1[0, :, -1] = border[:, 0], border[:, -1]
    ref = np.asarray(vgg_conv2_pool_reference(a1, w2, b2))
    out = np.asarray(vgg_conv2_pool(a1, w2, b2, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_weights_structure(rng):
    """The (384, 128) per-dy blocks carry the conv taps exactly where the
    pair-packing says (module docstring) and structural zeros elsewhere."""
    w2, _ = _weights(rng)
    p = np.asarray(pack_conv2_weights(jnp.asarray(w2)).astype(jnp.float32))
    w2r = _bf16_round(w2)
    assert p.shape == (3, 384, 128)
    for d in range(3):
        dpm, dp0, dpp = p[d, :128], p[d, 128:256], p[d, 256:]
        np.testing.assert_array_equal(dpm[64:, :64], w2r[d, 0])
        np.testing.assert_array_equal(dp0[:64, :64], w2r[d, 1])
        np.testing.assert_array_equal(dp0[64:, :64], w2r[d, 2])
        np.testing.assert_array_equal(dp0[:64, 64:], w2r[d, 0])
        np.testing.assert_array_equal(dp0[64:, 64:], w2r[d, 1])
        np.testing.assert_array_equal(dpp[:64, 64:], w2r[d, 2])
        # everything else is a structural zero
        assert np.count_nonzero(dpm) == np.count_nonzero(w2r[d, 0])
        assert np.count_nonzero(dpp) == np.count_nonzero(w2r[d, 2])
        # dp0 carries 4 tap blocks: kx=0 and kx=1 twice (both parities),
        # kx=+1 once (even out), kx=-1 once more would be dpm's
        total = (2 * np.count_nonzero(w2r[d, 1])
                 + np.count_nonzero(w2r[d, 2]) + np.count_nonzero(w2r[d, 0]))
        assert np.count_nonzero(dp0) == total


def test_tail_shape_gate():
    assert conv2_pool_shape_ok((4, 608, 800, 64))
    assert conv2_pool_shape_ok((1, 2 * R, 32, 64))
    assert not conv2_pool_shape_ok((1, 2 * R - 8, 32, 64))  # H too small
    assert not conv2_pool_shape_ok((1, 2 * R + 4, 32, 64))  # H % R != 0
    assert not conv2_pool_shape_ok((1, 32, 40, 64))         # W % 16 != 0
    assert not conv2_pool_shape_ok((1, 32, 16, 64))         # W too small
    assert not conv2_pool_shape_ok((32, 32, 64))            # not 4-D
    # conv2_pool_ok additionally requires a TPU backend (tests run on CPU)
    assert not conv2_pool_ok((4, 608, 800, 64))


def test_tail_rejects_bad_shape(rng):
    w2, b2 = _weights(rng)
    a1 = rng.randn(1, 24, 40, 64).astype(np.float32)
    with pytest.raises(ValueError, match="chunking preconditions"):
        vgg_conv2_pool(a1, w2, b2, interpret=True)


def test_tail_opt_in_env(monkeypatch):
    # the tail kernel measured slower than the XLA stem end-to-end, so it
    # is OPT-IN (conv2_pool_pallas.py STATUS note): default off everywhere,
    # and even opted in it still requires a TPU backend (tests are CPU)
    monkeypatch.delenv("WSSDL_STEM_TAIL", raising=False)
    assert not conv2_pool_ok((4, 608, 800, 64))
    monkeypatch.setenv("WSSDL_STEM_TAIL", "0")
    assert not conv2_pool_ok((4, 608, 800, 64))
    monkeypatch.setenv("WSSDL_STEM_TAIL", "1")
    assert not conv2_pool_ok((4, 608, 800, 64))  # CPU backend still gates
