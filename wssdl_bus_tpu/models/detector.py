"""Detector assembly: trunk + RPN head + RCNN head.

The reference wires these through its layer DSL
(``VGGnet_train_bus.py:62-101``, ``Resnet_train_bus.py:65-101``); here the
differentiable graph is two flax modules (``TrunkRPN`` applied to images,
``RCNNHead`` applied to ROI-pooled features) and all detection geometry
(anchor targets, proposals, ROI sampling, ROI pooling) lives in
``wssdl_bus_tpu.ops`` as pure jit functions between them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wssdl_bus_tpu.models.layers import (ConvBlock, compute_dtype_scope,
                                         gn_config_scope)
from wssdl_bus_tpu.models.resnet import (RESNET_DEFS, ResNetBackbone,
                                         ResNetRCNNHead)
from wssdl_bus_tpu.models.vgg import VGG16Backbone, VGGRCNNHead


class TrunkRPN(nn.Module):
    """Backbone features + RPN conv heads.

    RPN layout matches the reference: a 3x3 conv (512 for VGG, 256/1024 for
    ResNet, normalised for ResNet), then 1x1 convs to 2A class logits and 4A
    box deltas (VGGnet_train_bus.py:63-73, Resnet_train_bus.py:66-74).
    """

    backbone: str = "VGGnet"       # 'VGGnet' | 'Resnet'
    depth: int = 50
    norm: Optional[str] = None     # backbone/RPN norm for ResNet
    num_anchors: int = 9
    train: bool = True

    @nn.compact
    def __call__(self, data, stem_done: bool = False):
        if self.backbone == "VGGnet":
            feat = VGG16Backbone(train=self.train, name="backbone")(
                data, stem_done=stem_done)
            rpn = ConvBlock(512, 3, 1, train=self.train,
                            name="rpn_conv")(feat)
        else:
            if stem_done:
                raise ValueError("stem_done is a VGG-only fast path")
            feat = ResNetBackbone(depth=self.depth, norm=self.norm,
                                  train=self.train, name="backbone")(data)
            defs, kind = RESNET_DEFS[self.depth]
            rpn_ch = 256 if kind == "basic" else 1024
            rpn = ConvBlock(rpn_ch, 3, 1, norm=self.norm, train=self.train,
                            name="rpn_conv")(feat)
        a = self.num_anchors
        rpn_cls_score = ConvBlock(2 * a, 1, 1, relu=False, padding="VALID",
                                  train=self.train, name="rpn_cls_score")(rpn)
        rpn_bbox_pred = ConvBlock(4 * a, 1, 1, relu=False, padding="VALID",
                                  train=self.train, name="rpn_bbox_pred")(rpn)
        return feat, rpn_cls_score, rpn_bbox_pred


def rpn_softmax(rpn_cls_score: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """Per-anchor bg/fg softmax over paired channels (a, A+a).

    Reproduces the reference's reshape_layer(2) -> softmax -> reshape_layer(2A)
    round-trip (network.py:283-291,398-404): channel ``a`` is the background
    logit and ``A+a`` the foreground logit of anchor ``a``.

    Written as two channel slices + elementwise ops (the textbook stable
    softmax over the pair) rather than a reshape to [..., 2, A] +
    ``jax.nn.softmax``: the 5-D reshape splits the minor dim across the
    sublane/lane boundary, and on TPU that relayout alone cost ~0.23 ms/img
    at the serving canvas (tools/profile_resnet_residual.py) — ~60x the
    arithmetic.  Matches the reshape form to f32 rounding.
    """
    bg = rpn_cls_score[..., :num_anchors]
    fg = rpn_cls_score[..., num_anchors:]
    m = jnp.maximum(bg, fg)
    eb = jnp.exp(bg - m)
    ef = jnp.exp(fg - m)
    s = eb + ef
    return jnp.concatenate([eb / s, ef / s], axis=-1)


@dataclass
class FasterRCNN:
    """Bundles train/eval module instances and their apply helpers.

    The network factory analog of ``networks/factory_bus.py:28-44``.
    """

    backbone: str = "VGGnet"
    depth: int = 50
    norm: Optional[str] = None
    num_classes: int = 3
    num_anchors: int = 9
    # None = float32 everywhere; 'bfloat16' = conv/dense matmuls on the MXU
    # in bf16 with f32 params, everything else f32 (models/layers.py scope)
    compute_dtype: Optional[str] = None
    # rematerialize activations in the backward pass (trades ~1 extra
    # forward for O(depth) activation memory).  False | True (both parts) |
    # 'trunk' | 'head'.  The ROI HEAD is the ResNet memory hog (group3
    # runs on every one of ~4.1k ROIs: without head remat the train step
    # needs 16.4 GB HBM on a 16 GB chip); trunk remat additionally drops
    # the full-canvas backbone activations at the cost of recomputing the
    # trunk forward once in the backward pass.
    remat: object = False
    # GN group heuristic (cfg.TRAIN.GN_MIN_NUM_G / GN_MIN_CHS_PER_G,
    # network.py:126); applied via gn_config_scope at trace time
    gn_params: tuple = (8, 4)

    def _remat(self, part: str) -> bool:
        return self.remat is True or self.remat == part

    def _trunk(self, train: bool) -> TrunkRPN:
        return TrunkRPN(backbone=self.backbone, depth=self.depth,
                        norm=self.norm, num_anchors=self.num_anchors,
                        train=train)

    def _head(self, train: bool):
        if self.backbone == "VGGnet":
            return VGGRCNNHead(num_classes=self.num_classes, train=train)
        return ResNetRCNNHead(depth=self.depth, norm=self.norm,
                              num_classes=self.num_classes, train=train)

    # ------------------------------------------------------------------ #
    def init_variables(self, rng, image_hw, roi_hw=(7, 7)) -> dict:
        """Initialise {'trunk': vars, 'head': vars} for a given canvas."""
        k1, k2 = jax.random.split(rng)
        dummy = jnp.zeros((1, image_hw[0], image_hw[1], 3), jnp.float32)
        with gn_config_scope(*self.gn_params):
            trunk_vars = self._trunk(train=False).init(k1, dummy)
        feat_ch = (512 if self.backbone == "VGGnet"
                   else (256 if RESNET_DEFS[self.depth][1] == "basic"
                         else 1024))
        dummy_roi = jnp.zeros((1, roi_hw[0], roi_hw[1], feat_ch), jnp.float32)
        with gn_config_scope(*self.gn_params):
            head_vars = self._head(train=False).init(k2, dummy_roi)
        return {"trunk": dict(trunk_vars), "head": dict(head_vars)}

    def apply_trunk(self, variables, data, train: bool,
                    stem_frozen: bool = True):
        """-> (feat, rpn_cls_score, rpn_bbox_pred, batch_stats_updates).

        VGG stem dispatch on TPU at eligible shapes — the DEFAULT is the
        plain XLA stem, which measured fastest at the pipeline level
        (278.9 vs 253.5 img/s @ b32 serving; r04 bench matrix):

          * with ``WSSDL_STEM_TAIL=1``: the stem TAIL runs as the fused
            Pallas kernel ``ops/conv2_pool_pallas.py`` (XLA conv1_1, then
            conv1_2+relu+pool fused; bf16-rounding numerics — the same
            rounding XLA's own conv lowering applies; f32 compute path
            only).  Opt-in: measured 9% SLOWER end-to-end, see its
            STATUS note.
          * with ``WSSDL_FUSED_STEM=1``: the FULL fused stem kernel
            (``ops/conv1_pallas.py``; bit-exact against the XLA stem on
            device, opt-in while it trails the XLA stem on wall clock —
            see its STATUS note).

        Valid in TRAINING too because VGG conv1/conv2 are frozen —
        reference ``VGGnet_train_bus.py:45-49`` ``trainable=False``, here
        the optimizer mask (train/engine.py:vgg_frozen_mask) — so no
        gradient ever flows through the stem and the ``stop_gradient``
        around the kernels (which have no VJP) changes nothing.  That
        coupling is ENFORCED, not just documented: with ``train=True`` the
        kernels dispatch only when ``stem_frozen`` is True (the Engine
        passes ``stem_mask_is_frozen`` of its actual optimizer mask,
        train/engine.py); an unfrozen-conv1 configuration falls through to
        the plain XLA stem, which carries real gradients.  Grad-norm
        caveat: with the kernels on, conv1_1/conv1_2 grads are exactly
        zero (stop_gradient) instead of nonzero-but-masked, so grad-norm
        style diagnostics differ even though parameter updates don't.
        """
        module = self._trunk(train)
        f32 = lambda t: jax.tree.map(  # noqa: E731
            lambda a: a.astype(jnp.float32), t)

        stem_done = False
        if self.backbone == "VGGnet" and (stem_frozen or not train):
            from wssdl_bus_tpu.ops.conv1_pallas import (fused_stem_ok,
                                                        vgg_stem_fused)
            from wssdl_bus_tpu.ops.conv2_pool_pallas import (conv2_pool_ok,
                                                             vgg_conv1_1,
                                                             vgg_conv2_pool)
            if fused_stem_ok(data.shape):
                p = variables["trunk"]["params"]["backbone"]
                data = jax.lax.stop_gradient(vgg_stem_fused(
                    data,
                    p["conv1_1"]["conv"]["kernel"],
                    p["conv1_1"]["conv"]["bias"],
                    p["conv1_2"]["conv"]["kernel"],
                    p["conv1_2"]["conv"]["bias"]))
                stem_done = True
            elif conv2_pool_ok(data.shape) and self.compute_dtype is None:
                # stem TAIL kernel (ops/conv2_pool_pallas.py), OPT-IN via
                # WSSDL_STEM_TAIL=1 (measured slower end-to-end than the
                # XLA stem — its STATUS note): conv1_1 stays in XLA,
                # conv1_2+pool run fused in Pallas.  Restricted to the
                # f32 compute path — under a bf16 compute_dtype the
                # ConvBlock graph casts differently and bf16 was measured
                # throughput-neutral for VGG anyway (bench.py docstring).
                p = variables["trunk"]["params"]["backbone"]
                # bf16 conv1_1 output: the cast fuses into the conv
                # epilogue (measured free) and makes the kernel's pair-
                # packed view a zero-cost reshape
                a1 = vgg_conv1_1(data, p["conv1_1"]["conv"]["kernel"],
                                 p["conv1_1"]["conv"]["bias"],
                                 out_dtype=jnp.bfloat16)
                data = jax.lax.stop_gradient(vgg_conv2_pool(
                    a1, p["conv1_2"]["conv"]["kernel"],
                    p["conv1_2"]["conv"]["bias"]))
                stem_done = True

        def fwd(v, d):
            with compute_dtype_scope(self.compute_dtype), \
                    gn_config_scope(*self.gn_params):
                if train:
                    out, mutated = module.apply(v, d, stem_done=stem_done,
                                                mutable=["batch_stats"])
                    return f32(out), mutated.get("batch_stats")
                return f32(module.apply(v, d, stem_done=stem_done)), None

        if self._remat("trunk") and train:
            fwd = jax.checkpoint(fwd)
        (feat, score, bbox), bs = fwd(variables["trunk"], data)
        return feat, score, bbox, bs

    def apply_head(self, variables, roi_feats, train: bool,
                   dropout_rng=None):
        """-> (cls_score, bbox_pred, batch_stats_updates)."""
        module = self._head(train)
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) \
            else None
        f32 = lambda t: jax.tree.map(  # noqa: E731
            lambda a: a.astype(jnp.float32), t)

        def fwd(v, x):
            with compute_dtype_scope(self.compute_dtype), \
                    gn_config_scope(*self.gn_params):
                if train:
                    out, mutated = module.apply(v, x,
                                                mutable=["batch_stats"],
                                                rngs=rngs)
                    return f32(out), mutated.get("batch_stats")
                return f32(module.apply(v, x)), None

        if self._remat("head") and train:
            fwd = jax.checkpoint(fwd)
        (cls, bbox), bs = fwd(variables["head"], roi_feats)
        return cls, bbox, bs


def build_detector(name: str, depth: int = 50, norm: Optional[str] = None,
                   num_classes: int = 3,
                   compute_dtype: Optional[str] = None,
                   gn_params: tuple = (8, 4),
                   remat: object = None) -> FasterRCNN:
    """Factory mirroring ``get_network`` names (factory_bus.py:28-44):
    'VGGnet_train' / 'VGGnet_test' / 'Resnet_train' / 'Resnet_test' and the
    '_alter' variants all map onto the same module pair here (the train/test
    distinction is an apply-time flag, not a separate graph).

    ``remat=None`` picks the backbone default: off for VGG, full remat for
    ResNet (bottleneck training at full canvas exceeds one chip's HBM
    without it, FasterRCNN.remat); 'head'/'trunk' select one part."""
    if name.startswith("VGGnet"):
        return FasterRCNN(backbone="VGGnet", num_classes=num_classes,
                          compute_dtype=compute_dtype, gn_params=gn_params,
                          remat=False if remat is None else remat)
    if name.startswith("Resnet"):
        if depth not in RESNET_DEFS:
            raise KeyError(f"unsupported ResNet depth {depth}")
        return FasterRCNN(backbone="Resnet", depth=depth, norm=norm,
                          num_classes=num_classes,
                          compute_dtype=compute_dtype,
                          remat=True if remat is None else remat,
                          gn_params=gn_params)
    raise KeyError(f"unknown network name {name}")
