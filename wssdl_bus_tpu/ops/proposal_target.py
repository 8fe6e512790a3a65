"""Proposal-to-GT assignment and ROI sampling for the RCNN head, jit-native.

Replaces ``proposal_target_layer`` / ``proposal_target_layer_joint``
(``/root/reference/code/lib/rpn_msr/proposal_target_layer_tf_bus.py``):

  * supervised images: append the fg GT boxes to the proposals (:45-50 /
    :127-132), then sample BATCH_SIZE(128) ROIs per image with at most
    FG_FRACTION*128 = 32 foregrounds (IoU >= FG_THRESH) and backgrounds from
    [BG_THRESH_LO, BG_THRESH_HI) (:228-280);
  * weak images: every proposal passes through untouched, no labels/targets
    (:160-183) — in our fixed-shape layout the weak blocks simply keep the
    proposal-layer output and its validity mask.

Static-shape redesign: per supervised image the output is exactly
``rois_per_image`` slots ordered fg-first (matching the reference's
``keep_inds = append(fg_inds, bg_inds)`` order, :264), with label -1 marking
unfilled slots (the reference can emit fewer than 128 rois when candidates are
scarce; our losses mask label<0 instead of changing shape).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from wssdl_bus_tpu.ops.boxes import bbox_transform, iou_matrix


class RoiSamples(NamedTuple):
    rois: jnp.ndarray            # [B, R, 4] sampled boxes (image coords)
    labels: jnp.ndarray          # [B, R] int32; -1 = unfilled slot
    bbox_targets: jnp.ndarray    # [B, R, 4*num_classes]
    inside_weights: jnp.ndarray  # [B, R, 4*num_classes]
    outside_weights: jnp.ndarray # [B, R, 4*num_classes]


def sample_rois_single(key,
                       prop_boxes: jnp.ndarray,   # [P, 4]
                       prop_valid: jnp.ndarray,   # [P] bool
                       gt_boxes: jnp.ndarray,     # [G, 5]
                       num_gt: jnp.ndarray,       # scalar
                       num_classes: int,
                       rois_per_image: int = 128,
                       fg_fraction: float = 0.25,
                       fg_thresh: float = 0.5,
                       bg_thresh_hi: float = 0.5,
                       bg_thresh_lo: float = 0.0,
                       include_gt: bool = True,
                       bbox_inside_weights=(1.0, 1.0, 1.0, 1.0),
                       normalize_targets: bool = False,
                       normalize_means=(0.0, 0.0, 0.0, 0.0),
                       normalize_stds=(0.1, 0.1, 0.2, 0.2)):
    """Sample ROIs for ONE supervised image."""
    p = prop_boxes.shape[0]
    g = gt_boxes.shape[0]
    gt_valid = jnp.arange(g) < num_gt
    is_fg_gt = gt_valid & (gt_boxes[:, 4] != 0)

    if include_gt:
        # Append fg GT boxes to the candidate set (:45-50).
        all_boxes = jnp.concatenate([prop_boxes, gt_boxes[:, :4]], axis=0)
        all_valid = jnp.concatenate([prop_valid, is_fg_gt], axis=0)
    else:
        all_boxes, all_valid = prop_boxes, prop_valid
    # Ensure at least rois_per_image candidate rows so the fixed-size output
    # gather below is always well-formed (pad rows are invalid).
    if all_boxes.shape[0] < rois_per_image:
        short = rois_per_image - all_boxes.shape[0]
        all_boxes = jnp.concatenate(
            [all_boxes, jnp.zeros((short, 4), all_boxes.dtype)], axis=0)
        all_valid = jnp.concatenate([all_valid, jnp.zeros((short,), bool)])
    n = all_boxes.shape[0]

    ov = iou_matrix(all_boxes, gt_boxes[:, :4])
    ov = jnp.where(is_fg_gt[None, :], ov, -1.0)  # only fg gts assign labels
    gt_assignment = jnp.argmax(ov, axis=1)
    max_ov = jnp.max(ov, axis=1)
    roi_labels = gt_boxes[gt_assignment, 4].astype(jnp.int32)

    fg_cand = all_valid & (max_ov >= fg_thresh)
    bg_cand = all_valid & (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo)

    fg_per_image = int(round(fg_fraction * rois_per_image))
    key_fg, key_bg = jax.random.split(key)

    rf = jnp.where(fg_cand, jax.random.uniform(key_fg, (n,)), -jnp.inf)
    fg_order = jnp.argsort(-rf)
    fg_rank = jnp.zeros(n, jnp.int32).at[fg_order].set(
        jnp.arange(n, dtype=jnp.int32))
    fg_sel = fg_cand & (fg_rank < fg_per_image)
    n_fg = jnp.sum(fg_sel)

    rb = jnp.where(bg_cand, jax.random.uniform(key_bg, (n,)), -jnp.inf)
    bg_order = jnp.argsort(-rb)
    bg_rank = jnp.zeros(n, jnp.int32).at[bg_order].set(
        jnp.arange(n, dtype=jnp.int32))
    bg_sel = bg_cand & (bg_rank < (rois_per_image - n_fg))
    n_bg = jnp.sum(bg_sel)

    # Pack: fg slots first, then bg, then padding — one stable sort.
    big = jnp.int32(1 << 20)
    sort_key = jnp.where(fg_sel, fg_rank,
                         jnp.where(bg_sel, big + bg_rank,
                                   2 * big + jnp.arange(n, dtype=jnp.int32)))
    order = jnp.argsort(sort_key)[:rois_per_image]

    slot = jnp.arange(rois_per_image)
    filled = slot < (n_fg + n_bg)
    is_fg_slot = slot < n_fg

    rois = all_boxes[order]
    labels = roi_labels[order]
    labels = jnp.where(is_fg_slot, labels, 0)        # clamp bg labels (:268)
    labels = jnp.where(filled, labels, -1)           # pad marker

    # Per-class expanded regression targets (:187-210).
    matched = gt_boxes[gt_assignment[order], :4]
    tgt = bbox_transform(rois, matched)
    if normalize_targets:
        # TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED (:221-224): whiten by
        # the configured means/stds.  The decode side un-whitens bbox_pred
        # before bbox_transform_inv (evaluate/detect.py) — equivalent to
        # the reference's snapshot-time weight re-scaling dance
        # (train_bus.py:133-173) without mutating checkpoints.
        tgt = (tgt - jnp.asarray(normalize_means, jnp.float32)) \
            / jnp.asarray(normalize_stds, jnp.float32)
    bbox_targets = jnp.zeros((rois_per_image, 4 * num_classes), jnp.float32)
    inside_w = jnp.zeros_like(bbox_targets)
    cls = jnp.clip(labels, 0, num_classes - 1)
    cols = cls[:, None] * 4 + jnp.arange(4)[None, :]
    has_reg = (labels > 0)
    row = jnp.arange(rois_per_image)[:, None]
    bbox_targets = bbox_targets.at[row, cols].set(
        jnp.where(has_reg[:, None], tgt, 0.0))
    iw = jnp.broadcast_to(jnp.asarray(bbox_inside_weights, jnp.float32),
                          tgt.shape)
    inside_w = inside_w.at[row, cols].set(
        jnp.where(has_reg[:, None], iw, 0.0))
    outside_w = (inside_w > 0).astype(jnp.float32)

    return rois, labels, bbox_targets, inside_w, outside_w


@partial(jax.jit, static_argnames=("num_classes", "rois_per_image",
                                   "fg_fraction", "include_gt",
                                   "bbox_inside_weights", "normalize_targets",
                                   "normalize_means", "normalize_stds"))
def proposal_target_layer(key,
                          prop_boxes: jnp.ndarray,  # [B, P, 4]
                          prop_valid: jnp.ndarray,  # [B, P]
                          gt_boxes: jnp.ndarray,    # [B, G, 5]
                          num_gt: jnp.ndarray,      # [B]
                          num_classes: int,
                          rois_per_image: int = 128,
                          fg_fraction: float = 0.25,
                          fg_thresh: float = 0.5,
                          bg_thresh_hi: float = 0.5,
                          bg_thresh_lo: float = 0.0,
                          include_gt: bool = True,
                          bbox_inside_weights=(1.0, 1.0, 1.0, 1.0),
                          normalize_targets: bool = False,
                          normalize_means=(0.0, 0.0, 0.0, 0.0),
                          normalize_stds=(0.1, 0.1, 0.2, 0.2)) -> RoiSamples:
    """Batched supervised ROI sampling (weak images are handled outside by
    passing their proposal blocks straight to the head)."""
    b = prop_boxes.shape[0]
    keys = jax.random.split(key, b)
    fn = partial(sample_rois_single, num_classes=num_classes,
                 rois_per_image=rois_per_image, fg_fraction=fg_fraction,
                 fg_thresh=fg_thresh, bg_thresh_hi=bg_thresh_hi,
                 bg_thresh_lo=bg_thresh_lo, include_gt=include_gt,
                 bbox_inside_weights=tuple(bbox_inside_weights),
                 normalize_targets=normalize_targets,
                 normalize_means=tuple(normalize_means),
                 normalize_stds=tuple(normalize_stds))
    out = jax.vmap(fn)(keys, prop_boxes, prop_valid, gt_boxes, num_gt)
    return RoiSamples(*out)
