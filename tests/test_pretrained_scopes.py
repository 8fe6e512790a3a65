"""Pretrained-import validation against the reference's REAL scope space.

The reference's checkpoints are numpy dicts ``{scope: {var: value}}`` whose
keys are the TF variable-scope paths of the graphs in
``VGGnet_train_bus.py:43-101`` / ``Resnet_train_bus.py:55-101``.  The real
artifacts (OneDrive ``.npy``s, README.md:30-33) are not available in this
environment, so these fixtures ENUMERATE the exact scope/variable space those
graphs define — flat VGG scopes, nested ResNet ``group{g}/block{i}/conv{j}``
with ``convshortcut`` / ``preact_prev`` / ``group{2,3}/norm``, the
``rpn_conv/3x3`` scope, and TF's ``batch_normalization`` subscope
(network.py:122) in both scope/subkey split layouts the reference loader
accepts (network.py:52-66) — and assert ``load_pretrained_npy`` matches every
array (no silent-zero-load)."""

import numpy as np
import pytest

import jax

from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.models.pretrained import load_pretrained_npy


# --------------------------------------------------------------------- #
# fixture generators: reference TF scope enumeration
# --------------------------------------------------------------------- #
VGG_CONVS = [  # (scope, c_in, c_out) — VGGnet_train_bus.py:44-61
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
]


def vgg_imagenet_npy(fill=0.5):
    """The Faster-RCNN_TF ``VGG_imagenet.npy`` layout: 13 conv scopes with
    weights+biases, plus the 4096-wide ImageNet fc6/fc7/fc8 that the BUS
    graph must SKIP (its fc6/fc7 are 512-wide, trained from scratch)."""
    d = {}
    for scope, ci, co in VGG_CONVS:
        d[scope] = {"weights": np.full((3, 3, ci, co), fill, np.float32),
                    "biases": np.full((co,), fill, np.float32)}
    d["fc6"] = {"weights": np.zeros((25088, 4096), np.float32),
                "biases": np.zeros((4096,), np.float32)}
    d["fc7"] = {"weights": np.zeros((4096, 4096), np.float32),
                "biases": np.zeros((4096,), np.float32)}
    d["fc8"] = {"weights": np.zeros((4096, 1000), np.float32),
                "biases": np.zeros((1000,), np.float32)}
    n_loadable = 2 * len(VGG_CONVS)
    return d, n_loadable


RESNET_DEFS = {18: ([2, 2, 2, 2], "basic"), 34: ([3, 4, 6, 3], "basic"),
               50: ([3, 4, 6, 3], "bottleneck"),
               101: ([3, 4, 23, 3], "bottleneck")}


def _norm_vars(c, norm, nested):
    """Norm variables under one scope.  BN: TF's batch_normalization
    subscope (gamma/beta/moving stats), either nested in the var name
    (``nested=True``) or meant to be appended to the scope by the caller.
    GN: reference group_norm's [1,1,1,C] gamma/beta (network.py:540-541)."""
    if norm == "BN":
        prefix = "batch_normalization/" if nested else ""
        return {prefix + "gamma": np.ones((c,), np.float32),
                prefix + "beta": np.zeros((c,), np.float32),
                prefix + "moving_mean": np.zeros((c,), np.float32),
                prefix + "moving_variance": np.ones((c,), np.float32)}
    return {"gamma": np.ones((1, 1, 1, c), np.float32),
            "beta": np.zeros((1, 1, 1, c), np.float32)}


def resnet_npy(depth, norm, fill=0.25, bn_layout="subkey"):
    """Full-graph checkpoint for ``Resnet_train_bus.py:55-101``.

    ``bn_layout``: how BN vars are split between scope key and subkey —
    ``"subkey"`` = scope ``…/conv1`` + var ``batch_normalization/gamma``;
    ``"scope"`` = scope ``…/conv1/batch_normalization`` + var ``gamma``.
    The reference loader accepts both (network.py:52-66)."""
    defs, kind = RESNET_DEFS[depth]
    d = {}

    def add_conv(scope, kh, kw, ci, co, with_norm=True, biases=False):
        d[scope] = {"weights": np.full((kh, kw, ci, co), fill, np.float32)}
        if biases:
            d[scope]["biases"] = np.zeros((co,), np.float32)
        if with_norm:
            if norm == "BN" and bn_layout == "scope":
                d[scope + "/batch_normalization"] = _norm_vars(
                    co, norm, nested=False)
            else:
                d[scope].update(_norm_vars(co, norm, nested=True))

    def add_norm(scope, c):
        if norm == "BN" and bn_layout == "scope":
            d[scope + "/batch_normalization"] = _norm_vars(
                c, norm, nested=False)
        else:
            d[scope] = _norm_vars(c, norm, nested=True)

    add_conv("conv0", 7, 7, 3, 64)
    c_in = 64
    for g, count in enumerate(defs):
        c_o = 64 * (2 ** g)
        c_out = c_o * (4 if kind == "bottleneck" else 1)
        for i in range(count):
            b = f"group{g}/block{i}"
            ci = c_in if i == 0 else c_out
            # block0 of group0 is first=True -> 'no_preact'
            # (network.py:506-508); every other block has a preact_prev norm
            if not (g == 0 and i == 0):
                add_norm(f"{b}/preact_prev", ci)
            if kind == "basic":
                add_conv(f"{b}/conv1", 3, 3, ci, c_o)
                add_conv(f"{b}/conv2", 3, 3, c_o, c_o)
            else:
                add_conv(f"{b}/conv1", 1, 1, ci, c_o)
                add_conv(f"{b}/conv2", 3, 3, c_o, c_o)
                add_conv(f"{b}/conv3", 1, 1, c_o, c_out)
            if i == 0 and ci != c_out:  # shortcut only on channel change
                add_conv(f"{b}/convshortcut", 1, 1, ci, c_out)
        c_in = c_out
        if g == 2:
            feat_ch = c_out  # RPN reads group2/relu
            add_norm("group2/norm", c_out)
        if g == 3:
            add_norm("group3/norm", c_out)
            gap_ch = c_out

    rpn_ch = 256 * (4 if kind == "bottleneck" else 1)
    add_conv("rpn_conv/3x3", 3, 3, feat_ch, rpn_ch)
    add_conv("rpn_cls_score", 1, 1, rpn_ch, 18, with_norm=False, biases=True)
    add_conv("rpn_bbox_pred", 1, 1, rpn_ch, 36, with_norm=False, biases=True)
    d["cls_score"] = {"weights": np.full((gap_ch, 3), fill, np.float32),
                      "biases": np.zeros((3,), np.float32)}
    d["bbox_pred"] = {"weights": np.full((gap_ch, 12), fill, np.float32),
                      "biases": np.zeros((12,), np.float32)}
    n_total = sum(len(v) for v in d.values())
    return d, n_total


def _save(tmp_path, d, name):
    p = str(tmp_path / name)
    np.save(p, np.asarray(d, dtype=object))
    return p + ".npy"


def _init_vars(backbone, **kw):
    model = FasterRCNN(backbone=backbone, **kw)
    return model.init_variables(jax.random.PRNGKey(0), (96, 128))


# --------------------------------------------------------------------- #
def test_vgg_imagenet_scope_space(tmp_path):
    d, n_loadable = vgg_imagenet_npy(fill=0.5)
    path = _save(tmp_path, d, "vgg")
    variables = _init_vars("VGGnet")
    # min_loaded == the full loadable count: raises on ANY silent skip
    out = load_pretrained_npy(path, variables, "VGGnet",
                              min_loaded=n_loadable)
    bk = out["trunk"]["params"]["backbone"]
    assert (np.asarray(bk["conv1_1"]["conv"]["kernel"]) == 0.5).all()
    assert (np.asarray(bk["conv5_3"]["conv"]["bias"]) == 0.5).all()
    # the 4096-wide ImageNet fc6/fc7 must be skipped (BUS fc6/fc7 are 512)
    assert not (np.asarray(out["head"]["params"]["fc6"]["dense"]["kernel"])
                == 0.0).all()

    # a checkpoint that matches nothing must fail loudly with min_loaded
    bogus = {"nope/scope": {"weights": np.zeros((1,), np.float32)}}
    bpath = _save(tmp_path, bogus, "bogus")
    with pytest.raises(ValueError, match="matched only 0"):
        load_pretrained_npy(bpath, variables, "VGGnet", min_loaded=1)


@pytest.mark.parametrize("depth,norm,bn_layout", [
    (18, "BN", "subkey"), (18, "BN", "scope"), (18, "GN", "subkey"),
    (50, "BN", "subkey"), (50, "GN", "subkey"),
])
def test_resnet_full_scope_space(tmp_path, depth, norm, bn_layout):
    d, n_total = resnet_npy(depth, norm, bn_layout=bn_layout)
    path = _save(tmp_path, d, f"r{depth}{norm}{bn_layout}")
    variables = _init_vars("Resnet", depth=depth, norm=norm)
    out = load_pretrained_npy(path, variables, "Resnet", min_loaded=n_total)
    bk = out["trunk"]["params"]["backbone"]
    assert (np.asarray(bk["conv0"]["conv"]["kernel"]) == 0.25).all()
    # the fixture enumerates every graph scope; nothing may be left over
    # in the checkpoint that did not land (checked via min_loaded=n_total)


def test_resnet_scope_counts_match_variable_tree():
    """The generated scope enumeration covers the ENTIRE backbone variable
    tree for ResNet-18 BN: every trunk param/batch_stat leaf gets written."""
    d, n_total = resnet_npy(18, "BN")
    variables = _init_vars("Resnet", depth=18, norm="BN")
    leaves_trunk = len(jax.tree_util.tree_leaves(variables["trunk"]))
    leaves_head = len(jax.tree_util.tree_leaves(variables["head"]))
    assert n_total == leaves_trunk + leaves_head
