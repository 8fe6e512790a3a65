"""Pre-activation ResNet backbones and per-ROI head.

Mirrors the reference graphs
(``/root/reference/code/lib/networks/Resnet_train_bus.py:55-101``) and block
functions (``network.py:418-468``):

  * depth table {18:[2,2,2,2] basic, 34:[3,4,6,3] basic, 50:[3,4,6,3]
    bottleneck, 101:[3,4,23,3] bottleneck} (Resnet_train_bus.py:30-35);
  * conv0 7x7/2 (+norm+relu) -> 3x3/2 VALID max-pool -> groups 0–2 as the
    shared stride-16 features, with a final norm+relu;
  * group3 runs on the 7x7 ROI-pooled features as the per-ROI head, followed
    by norm+relu and global average pooling (Resnet_train_bus.py:91-101);
  * pre-activation placement quirk reproduced exactly: in 'default' blocks the
    shortcut input is taken BEFORE the preact norm, in 'both_preact' blocks
    after it, and the first block of group0 has no preact (network.py:424-457).

Norm type is 'BN' (batch renorm) or 'GN' per the --norm_type CLI flag.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from wssdl_bus_tpu.models.layers import (BatchRenorm, ConvBlock, Fc,
                                         GroupNormRef, gn_groups, max_pool)

RESNET_DEFS = {
    18: ([2, 2, 2, 2], "basic"),
    34: ([3, 4, 6, 3], "basic"),
    50: ([3, 4, 6, 3], "bottleneck"),
    101: ([3, 4, 23, 3], "bottleneck"),
}


def _norm(norm: Optional[str], channels: int, train: bool, name: str):
    if norm == "BN":
        return BatchRenorm(use_running_average=not train, name=name)
    if norm == "GN":
        return GroupNormRef(gn_groups(channels), name=name)
    return lambda x: x


class _Block(nn.Module):
    """One preact residual block (basic or bottleneck), network.py:424-457."""

    features: int
    stride: int
    preact: str          # 'no_preact' | 'both_preact' | 'default'
    kind: str            # 'basic' | 'bottleneck'
    norm: Optional[str]
    train: bool

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        if self.preact == "both_preact":
            x = _norm(self.norm, c_in, self.train, "preact_prev")(x)
            x = nn.relu(x)
            x_ori = x
        elif self.preact != "no_preact":
            x_ori = x
            x = _norm(self.norm, c_in, self.train, "preact_prev")(x)
            x = nn.relu(x)
        else:
            x_ori = x

        if self.kind == "basic":
            y = ConvBlock(self.features, 3, self.stride, norm=self.norm,
                          train=self.train, name="conv1")(x)
            y = ConvBlock(self.features, 3, 1, norm=self.norm, relu=False,
                          train=self.train, name="conv2")(y)
            c_out = self.features
        else:
            y = ConvBlock(self.features, 1, 1, norm=self.norm,
                          train=self.train, name="conv1")(x)
            y = ConvBlock(self.features, 3, self.stride, norm=self.norm,
                          train=self.train, name="conv2")(y)
            y = ConvBlock(self.features * 4, 1, 1, norm=self.norm, relu=False,
                          train=self.train, name="conv3")(y)
            c_out = self.features * 4

        if c_in != c_out:
            sc = ConvBlock(c_out, 1, self.stride, norm=self.norm, relu=False,
                           train=self.train, name="convshortcut")(x_ori)
        else:
            sc = x_ori
        return y + sc


class _Group(nn.Module):
    """A stack of blocks (network.py:459-468)."""

    features: int
    count: int
    stride: int
    first: bool
    kind: str
    norm: Optional[str]
    train: bool

    @nn.compact
    def __call__(self, x):
        x = _Block(self.features, self.stride,
                   "no_preact" if self.first else "both_preact",
                   self.kind, self.norm, self.train, name="block0")(x)
        for i in range(1, self.count):
            x = _Block(self.features, 1, "default", self.kind, self.norm,
                       self.train, name=f"block{i}")(x)
        return x


class ResNetBackbone(nn.Module):
    depth: int = 50
    norm: Optional[str] = "BN"
    train: bool = True

    @nn.compact
    def __call__(self, x):
        defs, kind = RESNET_DEFS[self.depth]
        x = ConvBlock(64, 7, 2, norm=self.norm, train=self.train,
                      name="conv0")(x)
        x = max_pool(x, 3, 2, "VALID")
        x = _Group(64, defs[0], 1, True, kind, self.norm, self.train,
                   name="group0")(x)
        x = _Group(128, defs[1], 2, False, kind, self.norm, self.train,
                   name="group1")(x)
        x = _Group(256, defs[2], 2, False, kind, self.norm, self.train,
                   name="group2")(x)
        c = x.shape[-1]
        x = _norm(self.norm, c, self.train, "group2_norm")(x)
        return nn.relu(x)  # stride 16; 256 (basic) or 1024 (bottleneck) chans


class ResNetRCNNHead(nn.Module):
    """group3 on ROI features + norm/relu + GAP -> cls/bbox heads
    (Resnet_train_bus.py:91-101)."""

    depth: int = 50
    norm: Optional[str] = "BN"
    num_classes: int = 3
    train: bool = True

    @nn.compact
    def __call__(self, roi_feats):
        defs, kind = RESNET_DEFS[self.depth]
        x = _Group(512, defs[3], 2, False, kind, self.norm, self.train,
                   name="group3")(roi_feats)
        c = x.shape[-1]
        x = _norm(self.norm, c, self.train, "group3_norm")(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))  # GlobalAvgPooling (network.py:487-501)
        cls_score = Fc(self.num_classes, relu=False, name="cls_score",
                       train=self.train)(x)
        bbox_pred = Fc(self.num_classes * 4, relu=False, name="bbox_pred",
                       train=self.train, init_std=0.001)(x)
        return cls_score, bbox_pred
