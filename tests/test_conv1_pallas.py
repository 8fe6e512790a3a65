"""Fused VGG stem Pallas kernel (ops/conv1_pallas.py) — CPU correctness via
``interpret=True`` against the plain-XLA stem, plus eligibility-gate edge
cases.  Real-TPU numerics/perf live in tools/check_stem_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wssdl_bus_tpu.ops.conv1_pallas import (BH, fused_stem_ok, stem_shape_ok,
                                            vgg_stem_fused,
                                            vgg_stem_reference)


def _weights(rng):
    w1 = (rng.randn(3, 3, 3, 64) * 0.1).astype(np.float32)
    b1 = (rng.randn(64) * 0.1).astype(np.float32)
    w2 = (rng.randn(3, 3, 64, 64) * 0.05).astype(np.float32)
    b2 = (rng.randn(64) * 0.1).astype(np.float32)
    return w1, b1, w2, b2


def _bf16_round(a):
    return np.asarray(jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32))


@pytest.mark.parametrize("shape", [
    (1, 16, 16, 3),   # minimum eligible H and W
    (3, 16, 24, 3),   # odd batch, minimal rows
    (2, 48, 64, 3),   # several row chunks per image
    (1, 32, 20, 3),   # W % 4 == 0 but W/2 not a multiple of 8
])
def test_fused_stem_matches_reference(shape, rng):
    """The kernel's bf16-rounding contract (module docstring): inputs and
    the conv1_1 intermediate are quantized to bf16 (exactly how XLA lowers
    these f32 convs on the MXU at default precision), so agreement with the
    f32 XLA stem is at bf16 level — ~1e-2 rms-relative, elementwise within
    a few bf16 ulps."""
    w1, b1, w2, b2 = [_bf16_round(w) for w in _weights(rng)]
    x = _bf16_round(rng.randn(*shape).astype(np.float32))
    assert stem_shape_ok(shape)
    ref = np.asarray(vgg_stem_reference(x, w1, b1, w2, b2))
    out = np.asarray(vgg_stem_fused(x, w1, b1, w2, b2, interpret=True))
    assert out.shape == (shape[0], shape[1] // 2, shape[2] // 2, 64)
    rms = float(np.sqrt(((out - ref) ** 2).mean())
                / np.sqrt((ref ** 2).mean()))
    assert rms < 0.01, rms
    np.testing.assert_allclose(out, ref, rtol=0.03, atol=0.02)


def test_fused_stem_bf16_tolerance_random_f32(rng):
    """Raw f32 inputs: the kernel quantizes to bf16, so agreement is at
    bf16-rounding level (the kernel docstring's ~1e-2 rms-relative
    contract — the same rounding XLA applies on TPU at default
    precision)."""
    w1, b1, w2, b2 = _weights(rng)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    ref = np.asarray(vgg_stem_reference(x, w1, b1, w2, b2))
    out = np.asarray(vgg_stem_fused(x, w1, b1, w2, b2, interpret=True))
    rms = float(np.sqrt(((out - ref) ** 2).mean())
                / np.sqrt((ref ** 2).mean()))
    assert rms < 0.01, rms


def test_stem_shape_gate():
    assert stem_shape_ok((4, 608, 800, 3))
    assert stem_shape_ok((1, 2 * BH, 16, 3))
    assert not stem_shape_ok((1, 2 * BH - 2, 16, 3))   # H too small
    assert not stem_shape_ok((1, 24, 16, 3))           # H % 16 != 0
    assert not stem_shape_ok((1, 32, 18, 3))           # W % 4 != 0
    assert not stem_shape_ok((1, 32, 12, 3))           # W too small
    assert not stem_shape_ok((1, 32, 32, 1))           # not 3-channel
    assert not stem_shape_ok((32, 32, 3))              # not 4-D
    # fused_stem_ok additionally requires a TPU backend (tests run on CPU)
    assert not fused_stem_ok((4, 608, 800, 3))


def test_fused_stem_rejects_bad_shape(rng):
    """Ineligible shapes raise a clear ValueError instead of silently
    truncating into the chunk grid."""
    w1, b1, w2, b2 = _weights(rng)
    x = rng.randn(1, 24, 18, 3).astype(np.float32)
    with pytest.raises(ValueError, match="chunking preconditions"):
        vgg_stem_fused(x, w1, b1, w2, b2, interpret=True)


def test_fused_stem_opt_out_env(monkeypatch):
    monkeypatch.setenv("WSSDL_FUSED_STEM", "0")
    assert not fused_stem_ok((4, 608, 800, 3))


def test_trunk_stem_done_wiring(rng):
    """The trunk applied with ``stem_done=True`` on a precomputed stem
    output is EXACTLY the plain full apply (same XLA ops past the stem) —
    the equivalence FasterRCNN.apply_trunk's fused dispatch relies on.
    Also pins that param trees are identical either way and that the
    ResNet trunk rejects the flag."""
    from wssdl_bus_tpu.models.detector import TrunkRPN

    module = TrunkRPN(backbone="VGGnet", train=False)
    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    full = module.apply(variables, x)

    p = variables["params"]["backbone"]
    stem = vgg_stem_reference(
        x, p["conv1_1"]["conv"]["kernel"], p["conv1_1"]["conv"]["bias"],
        p["conv1_2"]["conv"]["kernel"], p["conv1_2"]["conv"]["bias"])
    part = module.apply(variables, stem, stem_done=True)
    for a, b in zip(full, part):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rn = TrunkRPN(backbone="Resnet", depth=18, norm="GN", train=False)
    rx = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    rv = rn.init(jax.random.PRNGKey(0), rx)
    with pytest.raises(ValueError, match="VGG-only"):
        rn.apply(rv, rx, stem_done=True)


def test_apply_trunk_cpu_falls_back(rng):
    """On a CPU backend fused_stem_ok is False, so apply_trunk must run the
    plain flax graph — identical to applying the module directly."""
    from wssdl_bus_tpu.models.detector import FasterRCNN, TrunkRPN

    model = FasterRCNN(backbone="VGGnet")
    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    module = TrunkRPN(backbone="VGGnet", train=False)
    variables = module.init(jax.random.PRNGKey(0), x)
    feat, score, bbox, bs = model.apply_trunk(
        {"trunk": dict(variables)}, x, train=False)
    ref = module.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(feat), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(score), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(bbox), np.asarray(ref[2]))
    assert bs is None
