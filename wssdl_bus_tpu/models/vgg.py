"""VGG16 trunk and RCNN head.

Mirrors the reference graphs
(``/root/reference/code/lib/networks/VGGnet_train_bus.py:43-101``,
``VGGnet_test_bus.py:23-69``): conv1–conv5 backbone with conv1/conv2 frozen
(freezing is enforced by the optimizer mask, see train/solver.py), 2x2 VALID
max-pools, biased convs without normalisation, and the fc6(512) → dropout →
fc7(512) → dropout → cls_score/bbox_pred head.  Module names match the
reference variable scopes so ImageNet ``.npy`` checkpoints map one-to-one.
"""

from __future__ import annotations

from flax import linen as nn

from wssdl_bus_tpu.models.layers import ConvBlock, Fc, max_pool


class VGG16Backbone(nn.Module):
    """``stem_done=True`` means ``x`` is already the pooled conv1 output
    (computed by the fused Pallas stem, ``ops/conv1_pallas.py``) and the
    conv1_1/conv1_2/pool1 stage is skipped.  Param declaration is
    unconditional at init (init always runs ``stem_done=False``), so the
    variable tree is identical either way.

    Precision note (measured, tools/check_bf16_store_tpu.py): explicit
    bf16 activation-storage casts between these convs are a NO-OP on TPU —
    XLA's excess-precision elimination already stores the whole
    conv/pool chain (weights AND activations) in bf16 in the optimized
    HLO, because every consumer is a conv that truncates its operands to
    bf16 anyway.  Standalone stem microbenchmarks that show a bf16-storage
    win (tools/probe_stem_xla.py) are an artifact of their jit OUTPUT
    boundary, which pins the last activation to f32 and blocks the
    auto-demotion; inside the full trunk there is nothing left to save.
    """

    train: bool = True

    @nn.compact
    def __call__(self, x, stem_done: bool = False):
        def conv(name, feats, inp):
            return ConvBlock(feats, kernel=3, stride=1, name=name,
                             train=self.train)(inp)

        if not stem_done:
            x = conv("conv1_1", 64, x)
            x = conv("conv1_2", 64, x)
            x = max_pool(x, 2, 2, "VALID")
        x = conv("conv2_1", 128, x)
        x = conv("conv2_2", 128, x)
        x = max_pool(x, 2, 2, "VALID")
        x = conv("conv3_1", 256, x)
        x = conv("conv3_2", 256, x)
        x = conv("conv3_3", 256, x)
        x = max_pool(x, 2, 2, "VALID")
        x = conv("conv4_1", 512, x)
        x = conv("conv4_2", 512, x)
        x = conv("conv4_3", 512, x)
        x = max_pool(x, 2, 2, "VALID")
        x = conv("conv5_1", 512, x)
        x = conv("conv5_2", 512, x)
        x = conv("conv5_3", 512, x)
        return x  # stride 16, 512 channels


class VGGRCNNHead(nn.Module):
    """fc6 -> drop -> fc7 -> drop -> (cls_score, bbox_pred)
    (VGGnet_train_bus.py:91-101).  Dropout keep_prob 0.5 at train, 1.0 at
    test (train_bus.py:750,803)."""

    num_classes: int = 3
    train: bool = True

    @nn.compact
    def __call__(self, roi_feats):
        x = Fc(512, name="fc6", train=self.train)(roi_feats)
        x = nn.Dropout(rate=0.5, deterministic=not self.train)(x)
        x = Fc(512, name="fc7", train=self.train)(x)
        x = nn.Dropout(rate=0.5, deterministic=not self.train)(x)
        cls_score = Fc(self.num_classes, relu=False, name="cls_score",
                       train=self.train)(x)
        bbox_pred = Fc(self.num_classes * 4, relu=False, name="bbox_pred",
                       train=self.train, init_std=0.001)(x)
        return cls_score, bbox_pred
