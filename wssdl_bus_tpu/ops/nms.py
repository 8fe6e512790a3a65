"""Greedy non-maximum suppression on TPU with static shapes.

Replaces the reference's three NMS implementations — Cython CPU NMS
(``/root/reference/code/lib/nms/cpu_nms.pyx``, ``code/lib/utils/nms.pyx``) and
the CUDA bitmask kernel (``code/lib/nms/nms_kernel.cu``) — with a single
jit-traceable masked computation.  Semantics match the Cython kernels exactly:
boxes are processed in descending score order and a candidate suppresses every
later box whose IoU (under the +1 pixel-extent convention) is **>= thresh**
(cpu_nms.pyx:65).

Greedy NMS is inherently sequential, so the TPU formulation is *blocked*, the
same decomposition as the reference CUDA kernel but mapped onto the VPU:

  * the box list (already score-sorted, padded, with a validity mask) is
    processed in blocks of ``block_size``;
  * within a block, suppression is resolved with a short sequential
    ``fori_loop`` over the block's [B, B] IoU matrix (B steps of B-wide
    vector ops);
  * each resolved block then suppresses the entire remaining tail in one
    vectorized [B, N] IoU broadcast.

This keeps the sequential trip count at N while making every step either a
tiny in-VMEM vector op or one large fused broadcast — no O(N^2) matrix is ever
materialized (N can be 12000 at train time).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _iou_one_to_many(box, boxes):
    """IoU of one [4] box against [M, 4] boxes (+1 convention)."""
    iw = jnp.minimum(box[2], boxes[:, 2]) - jnp.maximum(box[0], boxes[:, 0]) + 1.0
    ih = jnp.minimum(box[3], boxes[:, 3]) - jnp.maximum(box[1], boxes[:, 1]) + 1.0
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    areas = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    return inter / (area + areas - inter)


def _iou_block_to_many(block, boxes):
    """IoU of [B, 4] boxes against [M, 4] boxes -> [B, M]."""
    iw = (jnp.minimum(block[:, None, 2], boxes[None, :, 2])
          - jnp.maximum(block[:, None, 0], boxes[None, :, 0]) + 1.0)
    ih = (jnp.minimum(block[:, None, 3], boxes[None, :, 3])
          - jnp.maximum(block[:, None, 1], boxes[None, :, 1]) + 1.0)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_b = (block[:, 2] - block[:, 0] + 1.0) * (block[:, 3] - block[:, 1] + 1.0)
    area_m = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    return inter / (area_b[:, None] + area_m[None, :] - inter)


@partial(jax.jit, static_argnames=("block_size",))
def nms_mask(sorted_boxes: jnp.ndarray, valid: jnp.ndarray, thresh: float,
             block_size: int = 128) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-desc-sorted boxes.

    Args:
      sorted_boxes: [N, 4] boxes already sorted by descending score.  N is
        padded to a multiple of ``block_size`` internally.
      valid: [N] bool; padded / invalid rows are never kept and never
        suppress anything.
      thresh: IoU threshold; overlap >= thresh suppresses.
    Returns:
      keep: [N] bool mask in the sorted order.
    """
    n = sorted_boxes.shape[0]
    pad = (-n) % block_size
    if pad:
        sorted_boxes = jnp.concatenate(
            [sorted_boxes, jnp.zeros((pad, 4), sorted_boxes.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    n_pad = n + pad
    num_blocks = n_pad // block_size

    suppressed = ~valid  # invalid rows start suppressed

    def block_body(k, suppressed):
        start = k * block_size
        blk_boxes = jax.lax.dynamic_slice(
            sorted_boxes, (start, 0), (block_size, 4))
        blk_sup = jax.lax.dynamic_slice(suppressed, (start,), (block_size,))

        # Intra-block greedy sweep over the [B, B] IoU matrix.
        iou_bb = _iou_block_to_many(blk_boxes, blk_boxes)
        col = jnp.arange(block_size)

        def row_body(i, bs):
            kept_i = ~bs[i]
            sup_row = kept_i & (iou_bb[i] >= thresh) & (col > i)
            return bs | sup_row

        blk_sup = jax.lax.fori_loop(0, block_size, row_body, blk_sup)

        # Kept rows of this block suppress the whole tail in one broadcast.
        iou_bn = _iou_block_to_many(blk_boxes, sorted_boxes)
        tail = jnp.arange(n_pad) >= (start + block_size)
        sup_tail = jnp.any(
            (~blk_sup)[:, None] & (iou_bn >= thresh), axis=0) & tail
        suppressed = jax.lax.dynamic_update_slice(suppressed, blk_sup, (start,))
        return suppressed | sup_tail

    suppressed = jax.lax.fori_loop(0, num_blocks, block_body, suppressed)
    keep = (~suppressed) & valid
    return keep[:n]


def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                thresh: float, max_out: int, block_size: int = 128):
    """Full NMS convenience: sort by score, suppress, return top indices.

    Returns ``(idx, keep_valid)`` where ``idx`` is [max_out] indices into the
    *original* box array, ordered by descending score among kept boxes, and
    ``keep_valid`` is the [max_out] bool mask of real (non-pad) outputs.
    Mirrors ``keep = nms(dets, thresh); keep = keep[:post_nms_topN]``
    (proposal_layer_tf_bus.py:138-140).
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]
    keep = nms_mask(sorted_boxes, sorted_valid, thresh, block_size=block_size)
    # Stable kept-first ordering (score order preserved within kept).
    n = boxes.shape[0]
    rank = jnp.where(keep, jnp.arange(n), n + jnp.arange(n))
    kept_order = jnp.argsort(rank)[:max_out]
    idx = order[kept_order]
    keep_valid = keep[kept_order]
    return idx, keep_valid
