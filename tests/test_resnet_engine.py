"""End-to-end engine smoke tests for the ResNet family: combined train step
with BN (running-stats updates) and GN, plus inference — the reference's
Resnet_train_bus/Resnet_test_bus graphs (Resnet_train_bus.py:13-102)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_engine import CANVAS, synth_batch, tiny_cfg
from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.train.engine import Engine

# full ResNet train-step compiles are multi-minute on CPU; fast-lane ResNet
# coverage is the trunk/head forward in test_models.py
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("norm", ["BN", "GN"])
def test_resnet18_train_and_inference(norm, rng):
    cfg = tiny_cfg()
    model = FasterRCNN(backbone="Resnet", depth=18, norm=norm)
    eng = Engine(model, cfg, CANVAS, opt_name="sgd")
    variables, opt_state = eng.init(jax.random.PRNGKey(0))
    batch = synth_batch(rng)

    v2, opt2, ls = eng.train_step(variables, opt_state, batch,
                                  jax.random.PRNGKey(1), jnp.float32(1e-3),
                                  jnp.int32(0))
    for l in ls:
        assert np.isfinite(np.asarray(l)), ls
    if norm == "BN":
        # batch-renorm running stats must move with the train step
        bs_old = jax.tree_util.tree_leaves(variables["trunk"]["batch_stats"])
        bs_new = jax.tree_util.tree_leaves(v2["trunk"]["batch_stats"])
        assert any(not np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(bs_old, bs_new))

    rois, valid, cls_score, cls_prob, bbox_pred = eng.inference_step(
        v2, batch["data"][:1], batch["im_info"][:1])
    p = cfg.TEST.RPN_POST_NMS_TOP_N
    assert cls_prob.shape == (p, 3)
    np.testing.assert_allclose(np.asarray(cls_prob).sum(-1), 1.0, rtol=1e-4)


def test_remat_variants_match(rng):
    """remat is purely a memory/schedule knob: False / True / 'head' /
    'trunk' must produce the same training trajectory (losses and updated
    params) on the same inputs."""
    cfg = tiny_cfg()
    batch = synth_batch(rng)

    def one_step(remat):
        model = FasterRCNN(backbone="Resnet", depth=18, norm="GN",
                           remat=remat)
        eng = Engine(model, cfg, CANVAS, opt_name="sgd")
        variables, opt_state = eng.init(jax.random.PRNGKey(0))
        v2, _, ls = eng.train_step(variables, opt_state, batch,
                                   jax.random.PRNGKey(1), jnp.float32(1e-3),
                                   jnp.int32(0))
        return np.array([np.asarray(l) for l in ls]), v2

    losses_ref, v_ref = one_step(False)
    for remat in (True, "head", "trunk"):
        losses, v = one_step(remat)
        np.testing.assert_allclose(losses, losses_ref, rtol=1e-5,
                                   err_msg=str(remat))
        a_ref = jax.tree_util.tree_leaves(v_ref["trunk"]["params"])
        a = jax.tree_util.tree_leaves(v["trunk"]["params"])
        for x, y in zip(a, a_ref):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-7,
                                       err_msg=str(remat))
