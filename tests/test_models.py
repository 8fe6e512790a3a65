"""Model shape/semantics tests: backbones, RPN heads, norms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wssdl_bus_tpu.models.detector import FasterRCNN, rpn_softmax
from wssdl_bus_tpu.models.layers import BatchRenorm, GroupNormRef


def test_vgg_trunk_shapes_and_stride():
    model = FasterRCNN(backbone="VGGnet")
    variables = model.init_variables(jax.random.PRNGKey(0), (64, 96))
    data = jnp.zeros((1, 64, 96, 3))
    feat, score, bbox, _ = model.apply_trunk(variables, data, train=False)
    assert feat.shape == (1, 4, 6, 512)        # stride 16
    assert score.shape == (1, 4, 6, 18)
    assert bbox.shape == (1, 4, 6, 36)


@pytest.mark.parametrize("depth,kind_ch", [(18, 256), (50, 1024)])
def test_resnet_trunk_shapes(depth, kind_ch):
    model = FasterRCNN(backbone="Resnet", depth=depth, norm="GN")
    variables = model.init_variables(jax.random.PRNGKey(0), (64, 64))
    data = jnp.zeros((2, 64, 64, 3))
    feat, score, bbox, _ = model.apply_trunk(variables, data, train=False)
    assert feat.shape == (2, 4, 4, kind_ch)
    assert score.shape == (2, 4, 4, 18)


def test_head_shapes_vgg_and_resnet():
    for backbone, depth, ch in [("VGGnet", 50, 512), ("Resnet", 18, 256)]:
        model = FasterRCNN(backbone=backbone, depth=depth, norm="GN")
        variables = model.init_variables(jax.random.PRNGKey(0), (64, 64))
        rois = jnp.ones((10, 7, 7, ch))
        cls, bbox, _ = model.apply_head(variables, rois, train=False)
        assert cls.shape == (10, 3)
        assert bbox.shape == (10, 12)


def test_rpn_softmax_pairs_channels(rng):
    a = 9
    logits = jnp.array(rng.randn(1, 2, 3, 2 * a).astype(np.float32))
    prob = np.asarray(rpn_softmax(logits, a))
    lg = np.asarray(logits)
    for i in range(a):
        pair = lg[0, 1, 2, [i, a + i]]
        want = np.exp(pair) / np.exp(pair).sum()
        np.testing.assert_allclose(prob[0, 1, 2, [i, a + i]], want, rtol=1e-5)
    # bg+fg sums to 1 per anchor
    np.testing.assert_allclose(prob[..., :a] + prob[..., a:], 1.0, rtol=1e-5)


def test_batch_renorm_train_vs_eval(rng):
    x = jnp.array(rng.randn(8, 4, 4, 3).astype(np.float32) * 2 + 1)
    mod_t = BatchRenorm(use_running_average=False)
    variables = mod_t.init(jax.random.PRNGKey(0), x)
    y, mutated = mod_t.apply(variables, x, mutable=["batch_stats"])
    # with fresh running stats (mean 0, var 1), renorm r/d corrections make
    # train output equal to gamma * (x - mu_m)/sigma_m + beta = x (eps aside)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=6e-3)
    # running stats moved toward batch stats
    bs = mutated["batch_stats"]
    assert np.asarray(bs["mean"]).mean() != 0.0
    # eval path normalises with running averages
    mod_e = BatchRenorm(use_running_average=True)
    y_eval = mod_e.apply({"params": variables["params"], "batch_stats": bs}, x)
    assert np.isfinite(np.asarray(y_eval)).all()


def test_group_norm_interleaved_grouping(rng):
    """Channel c belongs to group c % G (the reference's reshape grouping)."""
    c, g = 8, 4
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    mod = GroupNormRef(num_groups=g)
    variables = mod.init(jax.random.PRNGKey(0), jnp.array(x))
    y = np.asarray(mod.apply(variables, jnp.array(x)))
    # manual: group of channel c is c % g; moments over (H, W, channels in grp)
    for n in range(2):
        for grp in range(g):
            chans = [ch for ch in range(c) if ch % g == grp]
            vals = x[n][:, :, chans]
            mu, var = vals.mean(), vals.var()
            want = (vals - mu) / np.sqrt(var + 1e-5)
            np.testing.assert_allclose(y[n][:, :, chans], want, atol=1e-4)


def test_backbone_train_updates_bn_stats():
    model = FasterRCNN(backbone="Resnet", depth=18, norm="BN")
    variables = model.init_variables(jax.random.PRNGKey(0), (64, 64))
    data = jnp.ones((1, 64, 64, 3)) * 3.0
    _, _, _, updates = model.apply_trunk(variables, data, train=True)
    assert updates is not None
    leaves = jax.tree_util.tree_leaves(updates)
    assert any(np.asarray(l).std() > 0 or np.abs(np.asarray(l)).max() > 0
               for l in leaves)
