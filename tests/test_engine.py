"""End-to-end smoke tests: full jitted train / eval / inference steps on a
tiny canvas with synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.train.engine import Engine

CANVAS = (96, 128)


def tiny_cfg():
    return Config().with_overrides([
        "TRAIN.RPN_PRE_NMS_TOP_N", "300",
        "TRAIN.RPN_POST_NMS_TOP_N", "64",
        "TRAIN.BATCH_SIZE", "32",
        "TRAIN.RPN_BATCHSIZE", "64",
        "TEST.RPN_PRE_NMS_TOP_N", "200",
        "TEST.RPN_POST_NMS_TOP_N", "32",
    ])


def synth_batch(rng, n_s=1, n_ws=2):
    n = n_s + n_ws
    data = rng.randn(n, *CANVAS, 3).astype(np.float32)
    gt = np.zeros((n, 20, 5), np.float32)
    num_gt = np.zeros((n,), np.int32)
    im_info = np.zeros((n, 4), np.float32)
    for i in range(n):
        im_info[i] = [CANVAS[0], CANVAS[1], 1.5, 2 if i % 2 else 1]
    for i in range(n_s):
        gt[i, 0] = [10, 10, 80, 60, 1]
        gt[i, 1] = [30, 40, 120, 90, 2]
        gt[i, 2] = [5, 64, 100, 92, 0]
        num_gt[i] = 3
    return {k: jnp.array(v) for k, v in
            {"data": data, "gt_boxes": gt, "num_gt_boxes": num_gt,
             "im_info": im_info}.items()}


@pytest.fixture(scope="module")
def engine_and_vars():
    cfg = tiny_cfg()
    model = FasterRCNN(backbone="VGGnet")
    eng = Engine(model, cfg, CANVAS)
    variables, opt_state = eng.init(jax.random.PRNGKey(0))
    return eng, variables, opt_state


def test_combined_train_step_updates_params(engine_and_vars, rng):
    eng, variables, opt_state = engine_and_vars
    batch = synth_batch(rng)
    v2, opt2, losses = eng.train_step(
        variables, opt_state, batch, jax.random.PRNGKey(1),
        jnp.float32(5e-4), jnp.int32(0))
    for l in losses:
        assert np.isfinite(np.asarray(l)), losses
    # trainable params moved, frozen conv1/conv2 untouched
    p_old = variables["trunk"]["params"]["backbone"]
    p_new = v2["trunk"]["params"]["backbone"]
    assert np.allclose(np.asarray(p_old["conv1_1"]["conv"]["kernel"]),
                       np.asarray(p_new["conv1_1"]["conv"]["kernel"]))
    assert not np.array_equal(np.asarray(p_old["conv5_3"]["conv"]["kernel"]),
                              np.asarray(p_new["conv5_3"]["conv"]["kernel"]))
    # head moved too
    assert not np.array_equal(
        np.asarray(variables["head"]["params"]["cls_score"]["dense"]["kernel"]),
        np.asarray(v2["head"]["params"]["cls_score"]["dense"]["kernel"]))


def test_mil_train_step(engine_and_vars, rng):
    eng, variables, opt_state = engine_and_vars
    batch = synth_batch(rng, n_s=0, n_ws=2)
    eng2 = Engine(eng.model, eng.cfg, CANVAS, num_supervised=0, num_ws=2,
                  selector_pair=("mass_max", "mal_max"))
    eng2.tx = eng.tx
    v2, opt2, mil = eng2.train_step_mil(
        variables, opt_state, batch, jax.random.PRNGKey(2),
        jnp.float32(5e-4), jnp.int32(100))
    assert np.isfinite(np.asarray(mil))
    assert np.asarray(mil) > 0
    # with random-init weights the MIL gradient magnitude is ~1e-10 (13
    # layers of std-0.01 convs shrink activations), so param deltas are below
    # float32 resolution; assert the optimizer consumed the step instead.
    inner = jax.tree_util.tree_leaves(opt2)
    assert any(np.asarray(l).dtype == np.int32 and np.asarray(l).item() == 1
               for l in inner if np.ndim(l) == 0)


def test_eval_and_inference_steps(engine_and_vars, rng):
    eng, variables, _ = engine_and_vars
    batch = synth_batch(rng, n_s=1, n_ws=0)
    ls, rois, cls_prob, bbox_pred, labels = eng.eval_step(
        variables, batch, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(ls.total))
    assert rois.shape[1] == 5

    rois, valid, cls_score, cls_prob, bbox_pred = eng.inference_step(
        variables, batch["data"], batch["im_info"])
    p = eng.cfg.TEST.RPN_POST_NMS_TOP_N
    assert rois.shape == (p, 5)
    assert cls_prob.shape == (p, 3)
    assert bbox_pred.shape == (p, 12)
    np.testing.assert_allclose(np.asarray(cls_prob).sum(-1), 1.0, rtol=1e-4)


@pytest.mark.parametrize("dataset", ["UDIAT", "SNUBH_FG"])
def test_train_step_other_dataset_modes(dataset, rng):
    """Full train step under the UDIAT / SNUBH_FG anchor-labeling modes
    (anchor_target_layer_tf_bus.py:159-199): classic Faster R-CNN negatives
    from IoU < 0.3 instead of the SNUBH bg-box path — losses must be finite
    and parameters update."""
    # smaller anchors: the default minimum anchor (~91x181) does not fit
    # the 96x128 canvas, which would mask every anchor to ignore and make
    # rpn_cls trivially 0 (see .claude/skills/verify gotchas)
    cfg = tiny_cfg().with_overrides(["ANCHOR_SCALES", "(2, 4, 8)"])
    model = FasterRCNN(backbone="VGGnet")
    eng = Engine(model, cfg, CANVAS, dataset=dataset)
    variables, opt_state = eng.init(jax.random.PRNGKey(0))
    batch = synth_batch(rng)
    if dataset != "SNUBH":
        # these datasets have no explicit background boxes
        gt = np.array(batch["gt_boxes"], copy=True)
        gt[:, 2] = 0
        batch["gt_boxes"] = jnp.asarray(gt)
        batch["num_gt_boxes"] = jnp.asarray(
            np.where(np.asarray(batch["num_gt_boxes"]) > 0, 2, 0))
    before = np.asarray(variables["head"]["params"]["cls_score"]["dense"]
                        ["kernel"]).copy()
    v2, opt2, ls = eng.train_step(variables, opt_state, batch,
                                  jax.random.PRNGKey(1), jnp.float32(1e-3),
                                  jnp.int32(0))
    vals = {k: float(x) for k, x in ls._asdict().items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    # classic-mode negatives exist without bg boxes, so rpn_cls is a real CE
    assert vals["rpn_cls"] > 0.1
    after = np.asarray(v2["head"]["params"]["cls_score"]["dense"]["kernel"])
    assert not np.array_equal(before, after)


def test_train_step_bit_reproducible(rng):
    """Two independently initialized+run training sequences under the same
    seed produce bitwise-identical losses and parameters (the determinism
    contract README claims; guards against accidental nondeterminism from
    unseeded randomness or unstable reductions)."""
    cfg = tiny_cfg()

    def run():
        model = FasterRCNN(backbone="VGGnet")
        eng = Engine(model, cfg, CANVAS)
        variables, opt_state = eng.init(jax.random.PRNGKey(7))
        batch = synth_batch(np.random.RandomState(11))
        out = []
        for i in range(3):
            variables, opt_state, ls = eng.train_step(
                variables, opt_state, batch, jax.random.PRNGKey(i),
                jnp.float32(1e-3), jnp.int32(i))
            out.append([float(x) for x in ls])
        leaf = np.asarray(
            variables["head"]["params"]["cls_score"]["dense"]["kernel"])
        return np.array(out), leaf

    losses1, leaf1 = run()
    losses2, leaf2 = run()
    np.testing.assert_array_equal(losses1, losses2)
    np.testing.assert_array_equal(leaf1, leaf2)


def test_engine_value_identity_shares_jit_cache(engine_and_vars, rng):
    """Engines compare by configuration value, so an equal-config engine
    reuses the already-compiled executables instead of recompiling (the jit
    cache is keyed on the engine via static_argnums=(0,))."""
    eng, variables, opt_state = engine_and_vars
    twin = Engine(FasterRCNN(backbone="VGGnet"), tiny_cfg(), CANVAS)
    assert twin == eng and hash(twin) == hash(eng)
    assert Engine(FasterRCNN(backbone="VGGnet"), tiny_cfg(),
                  (CANVAS[0] + 32, CANVAS[1])) != eng
    assert Engine(FasterRCNN(backbone="Resnet", depth=18, norm="BN"),
                  tiny_cfg(), CANVAS) != eng
    assert Engine(FasterRCNN(backbone="VGGnet"), tiny_cfg(), CANVAS,
                  opt_name="sgd") != eng

    # warm the cache through `eng`, then the twin's first call must be a
    # cache hit, not a second compile
    twin.init(jax.random.PRNGKey(3))
    batch = synth_batch(rng)
    eng.train_step(variables, opt_state, batch, jax.random.PRNGKey(1),
                   jnp.float32(5e-4), jnp.int32(0))
    before = Engine.train_step._cache_size()
    _, _, losses = twin.train_step(
        variables, opt_state, batch, jax.random.PRNGKey(1),
        jnp.float32(5e-4), jnp.int32(0))
    assert np.isfinite(np.asarray(losses.total))
    assert Engine.train_step._cache_size() == before


def test_stem_kernel_gated_on_frozen_mask(monkeypatch):
    """The no-VJP Pallas stem kernels may only dispatch in TRAINING while
    the optimizer provably freezes conv1/conv2 (VGGnet_train_bus.py:45-49);
    an unfrozen-stem configuration must fall through to the XLA stem so
    conv1 gradients are real instead of silently zero."""
    import wssdl_bus_tpu.ops.conv1_pallas as c1
    import wssdl_bus_tpu.ops.conv2_pool_pallas as c2
    from wssdl_bus_tpu.train.engine import stem_mask_is_frozen, \
        vgg_frozen_mask

    cfg = tiny_cfg()
    model = FasterRCNN(backbone="VGGnet")
    eng = Engine(model, cfg, CANVAS)
    variables, _ = eng.init(jax.random.PRNGKey(0))

    # the default masked optimizer freezes the stem; a hand-assigned tx
    # cannot be introspected, so it conservatively disables the kernels
    params = {"trunk": variables["trunk"]["params"],
              "head": variables["head"]["params"]}
    assert stem_mask_is_frozen(vgg_frozen_mask(params))
    assert not stem_mask_is_frozen(
        jax.tree_util.tree_map(lambda _: True, params))
    assert eng.stem_frozen
    saved_tx = eng.tx
    eng.tx = saved_tx
    assert not eng.stem_frozen
    eng.stem_frozen = True
    assert eng.stem_frozen

    # structural dispatch check: force shape/backend eligibility and record
    # kernel calls through shape-correct fakes
    calls = []

    def fake_conv1_1(data, w, b, out_dtype=jnp.float32):
        calls.append("conv1_1")
        return jnp.zeros(data.shape[:3] + (64,), out_dtype)

    def fake_tail(a1, w, b):
        calls.append("tail")
        return jnp.zeros((a1.shape[0], a1.shape[1] // 2, a1.shape[2] // 2,
                          64), jnp.float32)

    monkeypatch.setattr(c1, "fused_stem_ok", lambda shape: False)
    monkeypatch.setattr(c2, "conv2_pool_ok", lambda shape: True)
    monkeypatch.setattr(c2, "vgg_conv1_1", fake_conv1_1)
    monkeypatch.setattr(c2, "vgg_conv2_pool", fake_tail)

    data = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    model.apply_trunk(variables, data, train=True, stem_frozen=True)
    assert calls == ["conv1_1", "tail"]
    calls.clear()
    model.apply_trunk(variables, data, train=True, stem_frozen=False)
    assert calls == []                      # fell through to the XLA stem
    model.apply_trunk(variables, data, train=False, stem_frozen=False)
    assert calls == ["conv1_1", "tail"]     # inference never trains the stem


@pytest.mark.slow
def test_unfreeze_stem_trains_conv1():
    """freeze_stem=False (the --unfreeze_stem CLI flag, for FROM-SCRATCH
    runs) must actually update conv1/conv2 — the reference-parity default
    must leave them untouched (VGGnet_train_bus.py:45-49)."""
    cfg = tiny_cfg()
    model = FasterRCNN(backbone="VGGnet")
    rng = np.random.RandomState(3)
    batch = synth_batch(rng)

    def one_step(eng):
        variables, opt_state = eng.init(jax.random.PRNGKey(0))
        before = np.asarray(
            variables["trunk"]["params"]["backbone"]["conv1_1"]["conv"]
            ["kernel"]).copy()
        variables, _, _ = eng.train_step(
            variables, opt_state, batch, jax.random.PRNGKey(1),
            jnp.float32(5e-2), jnp.int32(0))
        after = np.asarray(
            variables["trunk"]["params"]["backbone"]["conv1_1"]["conv"]
            ["kernel"])
        return float(np.abs(after - before).max())

    eng_frozen = Engine(model, cfg, CANVAS)
    assert eng_frozen.freeze_stem and one_step(eng_frozen) == 0.0

    eng_free = Engine(model, cfg, CANVAS, freeze_stem=False)
    assert not eng_free.freeze_stem
    variables, _ = eng_free.init(jax.random.PRNGKey(0))
    assert eng_free.stem_frozen is False  # no-VJP stem kernels disabled
    assert one_step(eng_free) > 0.0
