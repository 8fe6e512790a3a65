"""Greedy non-maximum suppression on TPU with static shapes.

Replaces the reference's three NMS implementations — Cython CPU NMS
(``/root/reference/code/lib/nms/cpu_nms.pyx``, ``code/lib/utils/nms.pyx``) and
the CUDA bitmask kernel (``code/lib/nms/nms_kernel.cu``) — with a single
jit-traceable masked computation.  Semantics match the Cython kernels exactly:
boxes are processed in descending score order and a candidate suppresses every
later box whose IoU (under the +1 pixel-extent convention) is **>= thresh**
(cpu_nms.pyx:65).

Greedy NMS is inherently sequential IN THE WORST CASE, but its solution is
the unique minimal fixpoint of

    kept[i]  =  not any(j < i : kept[j] and iou(i, j) >= thresh)

so the TPU formulation is a *Jacobi fixpoint iteration* over a packed
suppression bitmask:

  * one blocked pass builds the strictly-lower-triangular boolean matrix
    ``iou >= thresh`` bit-packed into uint32 lanes ([N, N/32], 4.5 MB at the
    6000-box test budget, 18 MB at the 12000-box train budget) — never
    materializing the f32 IoU matrix;
  * a ``lax.while_loop`` then iterates ``kept <- ~(mask & kept_packed)``
    until unchanged.  Iteration k settles every box whose suppression-chain
    depth is <= k, so the trip count is the chain depth of the box graph
    (single digits in practice), each trip one dense [N, N/32] AND+reduce.

This replaced an earlier 128-wide blocked-greedy sweep (N sequential steps):
8.5 ms -> ~1 ms for the 6000-box test budget on a v5e chip, with bit-exact
greedy semantics (oracle-tested against the pure-numpy reference kernel).

On TPU the proposal layer now uses the VMEM-resident Pallas kernel in
``ops/nms_pallas.py`` instead (~0.09 ms at the same budget); this XLA
formulation remains the portable path (CPU tests, non-TPU backends) and the
semantics oracle both implementations are tested against.
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


_LANE = 32


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., K*32] bool -> [..., K] uint32 (bit b of word k = column k*32+b)."""
    shape = bits.shape[:-1] + (bits.shape[-1] // _LANE, _LANE)
    weights = (jnp.uint32(1) << jnp.arange(_LANE, dtype=jnp.uint32))
    return jnp.sum(bits.reshape(shape).astype(jnp.uint32) * weights, axis=-1,
                   dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("block_size",))
def nms_mask(sorted_boxes: jnp.ndarray, valid: jnp.ndarray, thresh: float,
             block_size: int = 256) -> jnp.ndarray:
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
    pad = (-n) % max(block_size, _LANE)
    if pad:
        sorted_boxes = jnp.concatenate(
            [sorted_boxes, jnp.zeros((pad, 4), sorted_boxes.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    n_pad = n + pad
    num_blocks = n_pad // block_size
    n_words = n_pad // _LANE

    # Stage 1: packed strictly-lower-triangular suppression bitmask,
    # mask[i, w] bit b set  <=>  j = w*32+b < i  and  iou(i, j) >= thresh.
    row_ids = jnp.arange(n_pad)

    if n_pad <= 16384:
        # one fused pass: the f32 IoU matrix never materializes (XLA fuses
        # compare+pack into the lane reduction, leaving only [N, N/32])
        iou = _iou_block_to_many(sorted_boxes, sorted_boxes)
        bits = ((iou >= thresh)
                & (row_ids[None, :] < row_ids[:, None]) & valid[None, :])
        mask = _pack_bits(bits)
    else:
        def build_block(k):
            start = k * block_size
            blk = jax.lax.dynamic_slice(sorted_boxes, (start, 0),
                                        (block_size, 4))
            iou = _iou_block_to_many(blk, sorted_boxes)      # [B, N]
            lower = (row_ids[None, :]
                     < (start + jnp.arange(block_size))[:, None])
            bits = (iou >= thresh) & lower & valid[None, :]
            return _pack_bits(bits)                          # [B, N/32]

        mask = jax.lax.map(build_block, jnp.arange(num_blocks))
        mask = mask.reshape(n_pad, n_words)

    # Stage 2: Jacobi fixpoint  kept <- ~any(mask & kept) , until stable.
    kept0 = valid

    def cond(state):
        kept, prev_changed = state
        return prev_changed

    def body(state):
        kept, _ = state
        kept_packed = _pack_bits(kept)                       # [N/32]
        sup = jnp.any((mask & kept_packed[None, :]) != 0, axis=1)
        new_kept = valid & ~sup
        return new_kept, jnp.any(new_kept != kept)

    kept, _ = jax.lax.while_loop(cond, body, (kept0, jnp.bool_(True)))
    return kept[:n]


def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                thresh: float, max_out: int, block_size: int = 128,
                presorted: bool = False):
    """Full NMS convenience: sort by score, suppress, return top indices.

    Returns ``(idx, keep_valid)`` where ``idx`` is [max_out] indices into the
    *original* box array, ordered by descending score among kept boxes, and
    ``keep_valid`` is the [max_out] bool mask of real (non-pad) outputs.
    Mirrors ``keep = nms(dets, thresh); keep = keep[:post_nms_topN]``
    (proposal_layer_tf_bus.py:138-140).

    ``presorted=True`` skips the score sort — correct whenever the caller's
    boxes already arrive score-descending (e.g. straight out of
    ``jax.lax.top_k``, whose values are sorted).
    """
    n = boxes.shape[0]
    if presorted:
        order = jnp.arange(n)
        sorted_boxes, sorted_valid = boxes, valid
    else:
        neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
        order = jnp.argsort(jnp.where(valid, scores, neg_inf),
                            descending=True)
        sorted_boxes = boxes[order]
        sorted_valid = valid[order]
    keep = nms_mask(sorted_boxes, sorted_valid, thresh, block_size=block_size)
    # Stable kept-first selection (score order preserved within kept):
    # top_k over a rank key instead of a full argsort.
    rank = jnp.where(keep, jnp.arange(n), n + jnp.arange(n))
    _, kept_order = jax.lax.top_k(-rank, max_out)
    idx = order[kept_order]
    keep_valid = keep[kept_order]
    return idx, keep_valid
