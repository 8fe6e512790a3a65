"""RPN anchor labeling and regression targets, jit-native.

Replaces the reference's ``anchor_target_layer`` family of numpy py_funcs
(``/root/reference/code/lib/rpn_msr/anchor_target_layer_tf_bus.py``):

  * ``anchor_target_layer``  (:19-303)  — per-image labeling with the three
    dataset modes:
      - SNUBH: positives from IoU against *foreground* GT boxes; negatives
        from the unidirectional overlap against annotated *background*
        (normal-tissue) boxes >= RPN_POSITIVE_OVERLAP (:120-158);
      - SNUBH_FG: classic labeling using only the fg GT boxes (:160-167);
      - UDIAT: classic Faster R-CNN labeling (:169-199).
  * ``anchor_target_layer_ws`` (:306-325) — weak images: everything ignored.
  * ``anchor_target_layer_joint`` (:328-628) — supervised images labeled,
    weak images appended as all-ignore blocks.

Design differences from the reference (all shape-static, fully on-device):
  * labels/targets are laid out [K = H*W*A] in (h, w, a) order matching how we
    reshape the RPN heads ([H, W, A, ...]) — the reference's NCHW round-trip
    reshapes (:276-301) exist only to feed TF's loss slicing and are not
    semantics;
  * "only keep anchors inside the image" (:100-112) is a mask, not a gather;
  * random fg/bg subsampling (npr.choice, :201-217) becomes masked
    rank-by-uniform selection under a threaded jax.random key — identical in
    distribution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from wssdl_bus_tpu.ops.boxes import bbox_transform, iou_matrix, iou_ui_matrix


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray           # [B, K] int32 in {-1, 0, 1}
    bbox_targets: jnp.ndarray     # [B, K, 4]
    inside_weights: jnp.ndarray   # [B, K, 4]
    outside_weights: jnp.ndarray  # [B, K, 4]


def _masked_keep_topk(key, cand_mask, limit, static_cap=None):
    """Keep at most ``limit`` of the candidates, chosen uniformly at random.

    ``limit`` may be a traced scalar.  Equivalent in distribution to the
    reference's ``npr.choice(cand, size=n-limit, replace=False)`` disabling
    step (anchor_target_layer_tf_bus.py:204-217).

    ``static_cap``: a static upper bound on ``limit``.  When given, the
    selection runs as ``lax.top_k`` over the random scores (O(n log cap))
    instead of a full argsort of all n anchors (n ~ 34k per image in the
    default config) — set-identical, since both argsort and XLA TopK break
    ties toward the lower index.
    """
    n = cand_mask.shape[0]
    r = jnp.where(cand_mask, jax.random.uniform(key, (n,)), -jnp.inf)
    if static_cap is not None and static_cap < n:
        vals, idx = jax.lax.top_k(r, static_cap)
        pos = jnp.arange(static_cap)
        sel = (pos < limit) & jnp.isfinite(vals)
        keep = jnp.zeros(n, bool).at[idx].max(sel)
        return cand_mask & keep
    order = jnp.argsort(-r)
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return cand_mask & (rank < limit)


def anchor_target_single(key,
                         gt_boxes: jnp.ndarray,     # [G, 5]
                         num_gt: jnp.ndarray,       # scalar int
                         im_info: jnp.ndarray,      # [>=3]
                         anchors: jnp.ndarray,      # [K, 4]
                         dataset: str = "SNUBH",
                         rpn_batchsize: int = 256,
                         rpn_fg_fraction: float = 0.5,
                         pos_overlap: float = 0.7,
                         neg_overlap: float = 0.3,
                         clobber_positives: bool = False,
                         allowed_border: float = 0.0,
                         bbox_inside_weights=(1.0, 1.0, 1.0, 1.0),
                         positive_weight: float = -1.0):
    """Anchor targets for ONE supervised image.  Returns (labels, targets,
    inside_w, outside_w) with leading dim K."""
    k = anchors.shape[0]
    g = gt_boxes.shape[0]
    gt_valid = jnp.arange(g) < num_gt
    is_fg_gt = gt_valid & (gt_boxes[:, 4] != 0)
    is_bg_gt = gt_valid & (gt_boxes[:, 4] == 0)

    inside = ((anchors[:, 0] >= -allowed_border)
              & (anchors[:, 1] >= -allowed_border)
              & (anchors[:, 2] < im_info[1] + allowed_border)
              & (anchors[:, 3] < im_info[0] + allowed_border))

    labels = jnp.full((k,), -1, jnp.int32)

    if dataset == "SNUBH":
        # IoU against fg GTs only; masked columns contribute nothing.
        ov_pos = iou_matrix(anchors, gt_boxes[:, :4])
        ov_pos = jnp.where(is_fg_gt[None, :], ov_pos, -1.0)
        ov_pos = jnp.where(inside[:, None], ov_pos, -1.0)
        argmax_pos = jnp.argmax(ov_pos, axis=1)
        max_pos = jnp.max(ov_pos, axis=1)

        # Negatives: anchors mostly covered by annotated bg (normal-tissue)
        # boxes, via the unidirectional overlap (:141-151).
        ov_neg = iou_ui_matrix(anchors, gt_boxes[:, :4])
        ov_neg = jnp.where(is_bg_gt[None, :], ov_neg, -1.0)
        max_neg = jnp.max(ov_neg, axis=1)
        if not clobber_positives:
            labels = jnp.where(inside & (max_neg >= pos_overlap), 0, labels)

        # fg: for each gt, the anchor(s) with the highest overlap (:153-154) …
        gt_col_max = jnp.max(jnp.where(inside[:, None], ov_pos, -1.0), axis=0)
        is_col_best = (ov_pos == gt_col_max[None, :]) & is_fg_gt[None, :]
        labels = jnp.where(inside & jnp.any(is_col_best, axis=1), 1, labels)
        # … and anchors above the IoU threshold (:156-157).
        labels = jnp.where(inside & (max_pos >= pos_overlap), 1, labels)
        argmax_for_targets = argmax_pos
    else:
        if dataset == "SNUBH_FG":
            col_ok = is_fg_gt
        else:  # UDIAT: every valid gt box is foreground
            col_ok = gt_valid
        ov = iou_matrix(anchors, gt_boxes[:, :4])
        ov = jnp.where(col_ok[None, :], ov, -1.0)
        ov = jnp.where(inside[:, None], ov, -1.0)
        argmax = jnp.argmax(ov, axis=1)
        max_ov = jnp.max(ov, axis=1)
        if not clobber_positives:
            labels = jnp.where(inside & (max_ov < neg_overlap), 0, labels)
        gt_col_max = jnp.max(ov, axis=0)
        is_col_best = (ov == gt_col_max[None, :]) & col_ok[None, :]
        labels = jnp.where(inside & jnp.any(is_col_best, axis=1), 1, labels)
        labels = jnp.where(inside & (max_ov >= pos_overlap), 1, labels)
        if clobber_positives:
            labels = jnp.where(inside & (max_ov < neg_overlap), 0, labels)
        argmax_for_targets = argmax

    # Subsample positives to RPN_FG_FRACTION * RPN_BATCHSIZE (:201-207) …
    key_fg, key_bg = jax.random.split(key)
    num_fg_cap = int(rpn_fg_fraction * rpn_batchsize)
    fg = labels == 1
    fg_kept = _masked_keep_topk(key_fg, fg, num_fg_cap,
                                static_cap=num_fg_cap)
    labels = jnp.where(fg & ~fg_kept, -1, labels)
    # … and negatives to RPN_BATCHSIZE - num_fg (:209-217).
    num_bg_cap = rpn_batchsize - jnp.sum(labels == 1)
    bg = labels == 0
    bg_kept = _masked_keep_topk(key_bg, bg, num_bg_cap,
                                static_cap=rpn_batchsize)
    labels = jnp.where(bg & ~bg_kept, -1, labels)

    # Regression targets toward each anchor's best fg gt, for every inside
    # anchor (:221-225); outside anchors are 0-filled like _unmap (:259).
    # One-hot matmul instead of a row gather: XLA lowers the [K] gather
    # into a ~0.6 ms serial fused loop PER COLUMN on TPU (profiled), while
    # onehot[K, G] @ gt[G, 4] is a trivial MXU pass — bit-exact
    # (1.0 * v + 0.0-terms == v) ONLY at HIGHEST precision: the default
    # single-pass bf16 MXU lowering would round the gt coordinates
    # themselves (e.g. 601.3 -> 600.0 in [512, 1024)) before the sum.
    onehot = (argmax_for_targets[:, None]
              == jnp.arange(g)[None, :]).astype(gt_boxes.dtype)
    matched_gt = jnp.matmul(onehot, gt_boxes[:, :4],
                            precision=jax.lax.Precision.HIGHEST)
    targets = bbox_transform(anchors, matched_gt)
    targets = jnp.where(inside[:, None], targets, 0.0)

    # inside weights: RPN_BBOX_INSIDE_WEIGHTS on positives
    # (anchor_target_layer_tf_bus.py:228-230)
    iw = jnp.asarray(bbox_inside_weights, targets.dtype)
    inside_w = jnp.where((labels == 1)[:, None],
                         jnp.broadcast_to(iw, (k, 4)), 0.0)
    # outside weights (:232-244): uniform 1/num_examples when
    # RPN_POSITIVE_WEIGHT < 0 (the default), otherwise p/num_pos on
    # positives and (1-p)/num_neg on negatives
    if positive_weight < 0:
        num_examples = jnp.maximum(jnp.sum(labels >= 0), 1)
        uniform_w = 1.0 / num_examples.astype(targets.dtype)
        outside_w = jnp.where((labels >= 0)[:, None], uniform_w, 0.0)
    else:
        assert 0.0 < positive_weight < 1.0, positive_weight
        num_pos = jnp.maximum(jnp.sum(labels == 1), 1).astype(targets.dtype)
        num_neg = jnp.maximum(jnp.sum(labels == 0), 1).astype(targets.dtype)
        outside_w = jnp.where(
            (labels == 1)[:, None], positive_weight / num_pos,
            jnp.where((labels == 0)[:, None],
                      (1.0 - positive_weight) / num_neg, 0.0))

    return labels, targets.astype(jnp.float32), inside_w, outside_w


@partial(jax.jit, static_argnames=("dataset", "num_supervised",
                                   "rpn_batchsize", "rpn_fg_fraction",
                                   "clobber_positives",
                                   "bbox_inside_weights", "positive_weight"))
def anchor_target_layer_joint(key,
                              gt_boxes: jnp.ndarray,   # [B, G, 5]
                              num_gt: jnp.ndarray,     # [B]
                              im_info: jnp.ndarray,    # [B, >=3]
                              anchors: jnp.ndarray,    # [K, 4]
                              num_supervised: int,
                              dataset: str = "SNUBH",
                              rpn_batchsize: int = 256,
                              rpn_fg_fraction: float = 0.5,
                              pos_overlap: float = 0.7,
                              neg_overlap: float = 0.3,
                              clobber_positives: bool = False,
                              bbox_inside_weights=(1.0, 1.0, 1.0, 1.0),
                              positive_weight: float = -1.0
                              ) -> AnchorTargets:
    """Joint batch: first ``num_supervised`` images labeled, the rest (weak
    images) all-ignore (anchor_target_layer_tf_bus.py:390,613-626)."""
    b = gt_boxes.shape[0]
    k = anchors.shape[0]
    keys = jax.random.split(key, b)
    fn = partial(anchor_target_single, anchors=anchors, dataset=dataset,
                 rpn_batchsize=rpn_batchsize, rpn_fg_fraction=rpn_fg_fraction,
                 pos_overlap=pos_overlap, neg_overlap=neg_overlap,
                 clobber_positives=clobber_positives,
                 bbox_inside_weights=tuple(bbox_inside_weights),
                 positive_weight=positive_weight)
    labels, targets, in_w, out_w = jax.vmap(fn)(keys, gt_boxes, num_gt, im_info)

    supervised = (jnp.arange(b) < num_supervised)
    labels = jnp.where(supervised[:, None], labels, -1)
    zero = jnp.zeros((b, k, 4), targets.dtype)
    sup3 = supervised[:, None, None]
    return AnchorTargets(labels,
                         jnp.where(sup3, targets, zero),
                         jnp.where(sup3, in_w, zero),
                         jnp.where(sup3, out_w, zero))
