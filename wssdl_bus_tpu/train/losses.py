"""Loss functions, matching the reference loss graph term for term.

Sources (``/root/reference/code/lib/fast_rcnn/train_bus.py``):
  * RPN cross entropy over non-ignored anchors (:605-610),
  * RPN "smooth L1" with sigma 3, x10 scale, HW-summed / (B,4A)-meaned
    (:613-620) — including the reference's quirk that the linear branch uses
    the RAW delta (not the inside-weighted one), so negative anchors with
    |delta| >= 1 DO contribute; we reproduce this faithfully,
  * RCNN cross entropy over the supervised ROI rows (:624-630),
  * RCNN l1 box loss (:643-648),
  * MIL bag cross entropy with class weights [0, WS_MAL_PCT, 1-WS_MAL_PCT]
    and the adaptive scale 1 - 0.99 * 0.9^floor(step/2000) (:652-671),
  * L2 weight decay over conv/fc kernels only (:676-678).

Shapes follow the fixed-block layout: padded rows are masked, never gathered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_ce(logits, labels):
    """Per-row sparse softmax cross entropy (labels may be out of range for
    masked rows — caller masks).

    Select-and-reduce instead of ``take_along_axis``: XLA lowers the
    per-row gather to a ~0.5 ms serial fused loop on TPU at anchor counts
    (profiled), while a one-hot select reduces on the VPU; ``where`` (not
    multiply-by-one-hot) so a -inf in an unselected lane cannot poison the
    row with NaN.  Bit-exact: the sum is one selected value plus zeros."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    onehot = safe[..., None] == jnp.arange(logits.shape[-1])
    return -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)


def rpn_class_loss(rpn_cls_score, labels, num_anchors):
    """Mean CE over anchors with label != -1 (train_bus.py:605-610).

    rpn_cls_score: [B, H, W, 2A]; labels: [B, K] with K = H*W*A in (h, w, a)
    order.  Channel a is the bg logit, A+a the fg logit of anchor a.
    """
    b, h, w, _ = rpn_cls_score.shape
    pair = rpn_cls_score.reshape(b, h, w, 2, num_anchors)
    logits = jnp.moveaxis(pair, 3, 4).reshape(b, -1, 2)  # [B, K, 2]
    ce = softmax_ce(logits, jnp.maximum(labels, 0))
    mask = (labels != -1).astype(ce.dtype)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def rpn_box_loss(rpn_bbox_pred, targets, inside_w, outside_w,
                 num_supervised, num_anchors, sigma=3.0, scale=10.0):
    """Reference smooth-L1 (train_bus.py:613-620), sliced to the supervised
    images.

    rpn_bbox_pred: [B, H, W, 4A]; targets/weights: [B, K, 4] in (h, w, a)
    order.  Loss = scale * sum(elementwise) / (B_s * 4A): the reference sums
    over (H, W) then means over the [B_s, 4A] matrix.
    """
    b, h, w, four_a = rpn_bbox_pred.shape
    a = num_anchors
    pred = rpn_bbox_pred.reshape(b, h * w, a, 4).reshape(b, -1, 4)
    pred = pred[:num_supervised]
    tgt = targets[:num_supervised]
    in_w = inside_w[:num_supervised]
    out_w = outside_w[:num_supervised]

    diff = pred - tgt
    sign = (jnp.abs(diff) < 1.0).astype(diff.dtype)
    quad = 0.5 * jnp.square(in_w * diff * sigma) * sign
    # NOTE: the linear branch uses the raw |diff| (reference quirk).
    lin = (jnp.abs(diff) - 0.5 / (sigma * sigma)) * (1.0 - sign)
    elem = out_w * (quad + lin)
    return scale * jnp.sum(elem) / (num_supervised * 4 * a)


def rcnn_class_loss(cls_score, labels):
    """Mean CE over filled ROI slots (labels >= 0) (train_bus.py:624-630).

    cls_score: [N, C]; labels: [N] with -1 for padded slots.
    """
    ce = softmax_ce(cls_score, labels)
    mask = (labels >= 0).astype(ce.dtype)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def rcnn_box_loss(bbox_pred, targets, inside_w, outside_w, labels):
    """l1 box loss: sum over the 4K columns, mean over filled ROI rows
    (train_bus.py:643-648)."""
    elem = outside_w * inside_w * jnp.abs(bbox_pred - targets)
    per_roi = jnp.sum(elem, axis=-1)
    mask = (labels >= 0).astype(per_roi.dtype)
    return jnp.sum(per_roi * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def mil_adaptive_scale(step, decay_base=0.99, decay_steps=2000,
                       decay_rate=0.9):
    """1 - 0.99 * 0.9^floor(step/2000) (train_bus.py:659, staircase)."""
    e = jnp.floor(step.astype(jnp.float32) / decay_steps)
    return 1.0 - decay_base * jnp.power(decay_rate, e)


def mil_class_loss(bag_logits, bag_labels, ws_mal_pct, scale):
    """Weighted bag CE (train_bus.py:661-671).

    Class weights [0, WS_MAL_PCT, 1-WS_MAL_PCT] indexed by the bag label
    (1 = benign gets WS_MAL_PCT — the minority-upweighting trick), times the
    shared scale factor, meaned over bags.
    """
    weights = jnp.array([0.0, ws_mal_pct, 1.0 - ws_mal_pct], bag_logits.dtype)
    w = weights[bag_labels]
    ce = softmax_ce(bag_logits, bag_labels)
    return jnp.mean(scale * w * ce)


def weight_decay_loss(params, decay):
    """0.5 * decay * sum ||W||^2 over conv/fc kernels only — the reference
    filters trainable vars named '*weights:0' (train_bus.py:676-678), which
    excludes biases and all norm parameters."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel":
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return decay * total
