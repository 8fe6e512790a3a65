"""Box geometry: encode/decode, clipping, IoU matrices.

jit-traceable jnp re-implementations of:
  * ``bbox_transform`` / ``bbox_transform_inv`` / ``clip_boxes``
    (``/root/reference/code/lib/fast_rcnn/bbox_transform.py:10-77``),
  * the dense IoU matrix (``code/lib/utils/bbox.pyx:15-55``),
  * the SNUBH-specific *unidirectional* overlap, intersection / area(box_n)
    (``code/lib/utils/bbox_ui.pyx:12-47``).

All follow the legacy +1 pixel-extent convention (w = x2 - x1 + 1).  The IoU
matrices are dense [N, K] computations — on TPU these vectorize onto the VPU
as a broadcast instead of the reference's Cython double loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes w.r.t. example boxes as (dx, dy, dw, dh) deltas.

    ex_rois: [N, 4], gt_rois: [N, 4] -> [N, 4].
    """
    ex_w = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
    ex_h = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
    ex_cx = ex_rois[:, 0] + 0.5 * ex_w
    ex_cy = ex_rois[:, 1] + 0.5 * ex_h

    gt_w = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
    gt_h = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
    gt_cx = gt_rois[:, 0] + 0.5 * gt_w
    gt_cy = gt_rois[:, 1] + 0.5 * gt_h

    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode [N, 4K] deltas against [N, 4] boxes -> [N, 4K] boxes."""
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights

    dx = deltas[:, 0::4]
    dy = deltas[:, 1::4]
    dw = deltas[:, 2::4]
    dh = deltas[:, 3::4]

    pred_cx = dx * widths[:, None] + ctr_x[:, None]
    pred_cy = dy * heights[:, None] + ctr_y[:, None]
    pred_w = jnp.exp(dw) * widths[:, None]
    pred_h = jnp.exp(dh) * heights[:, None]

    out = jnp.zeros_like(deltas)
    out = out.at[:, 0::4].set(pred_cx - 0.5 * pred_w)
    out = out.at[:, 1::4].set(pred_cy - 0.5 * pred_h)
    out = out.at[:, 2::4].set(pred_cx + 0.5 * pred_w)
    out = out.at[:, 3::4].set(pred_cy + 0.5 * pred_h)
    return out


def clip_boxes(boxes: jnp.ndarray, im_h, im_w) -> jnp.ndarray:
    """Clip [N, 4K] boxes to [0, im_w-1] x [0, im_h-1]."""
    out = jnp.zeros_like(boxes)
    out = out.at[:, 0::4].set(jnp.clip(boxes[:, 0::4], 0.0, im_w - 1.0))
    out = out.at[:, 1::4].set(jnp.clip(boxes[:, 1::4], 0.0, im_h - 1.0))
    out = out.at[:, 2::4].set(jnp.clip(boxes[:, 2::4], 0.0, im_w - 1.0))
    out = out.at[:, 3::4].set(jnp.clip(boxes[:, 3::4], 0.0, im_h - 1.0))
    return out


def _pairwise_intersection(boxes: jnp.ndarray, query_boxes: jnp.ndarray):
    """[N, K] intersection areas under the +1 convention (0 if no overlap)."""
    iw = (jnp.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
          - jnp.maximum(boxes[:, None, 0], query_boxes[None, :, 0]) + 1.0)
    ih = (jnp.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
          - jnp.maximum(boxes[:, None, 1], query_boxes[None, :, 1]) + 1.0)
    return jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)


def iou_matrix(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """Dense [N, K] IoU between boxes [N, 4] and query_boxes [K, 4].

    Semantics of ``bbox_overlaps`` (bbox.pyx:15-55): the Cython kernel writes
    0 when either the intersection width or height is <= 0, which this masked
    formulation reproduces exactly.
    """
    inter = _pairwise_intersection(boxes, query_boxes)
    area_n = ((boxes[:, 2] - boxes[:, 0] + 1.0)
              * (boxes[:, 3] - boxes[:, 1] + 1.0))
    area_k = ((query_boxes[:, 2] - query_boxes[:, 0] + 1.0)
              * (query_boxes[:, 3] - query_boxes[:, 1] + 1.0))
    union = area_n[:, None] + area_k[None, :] - inter
    return jnp.where(inter > 0.0, inter / union, 0.0)


def iou_ui_matrix(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """Unidirectional overlap: intersection / area(boxes[n]) — "how much of
    each box is covered by each query box" (bbox_ui.pyx:12-47).

    Used by the SNUBH anchor-labeling path to mark anchors covered by
    annotated normal-tissue (background) boxes as negatives.
    """
    inter = _pairwise_intersection(boxes, query_boxes)
    area_n = ((boxes[:, 2] - boxes[:, 0] + 1.0)
              * (boxes[:, 3] - boxes[:, 1] + 1.0))
    return jnp.where(inter > 0.0, inter / area_n[:, None], 0.0)
