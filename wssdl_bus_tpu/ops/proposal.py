"""RPN proposal generation, jit-native with static padded shapes.

Replaces the reference's ``proposal_layer`` numpy ``tf.py_func``
(``/root/reference/code/lib/rpn_msr/proposal_layer_tf_bus.py:19-156``) with a
single traced computation per image:

  1. decode RPN box deltas against the shifted anchor grid,
  2. clip to the (per-image, dynamic) image extent from ``im_info``,
  3. drop boxes with a side < RPN_MIN_SIZE * im_scale (as a validity mask,
     not a gather — static shapes),
  4. take the top ``pre_nms_top_n`` by score,
  5. greedy NMS at ``nms_thresh``,
  6. keep the top ``post_nms_top_n`` survivors, padded with a validity mask.

The reference emits a ragged [sum_i K_i, 5] blob with a python loop over the
batch (proposal_layer_tf_bus.py:75); here every image yields exactly
``post_nms_top_n`` rows plus a mask, and the batch dimension is vmapped.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from wssdl_bus_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from wssdl_bus_tpu.ops.nms import nms_mask
from wssdl_bus_tpu.ops.nms_pallas import nms_keep_pallas


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # [B, P, 4] in input-image coordinates
    scores: jnp.ndarray  # [B, P]
    valid: jnp.ndarray   # [B, P] bool


def proposal_layer_single(rpn_cls_prob: jnp.ndarray,
                          rpn_bbox_pred: jnp.ndarray,
                          im_info: jnp.ndarray,
                          anchors: jnp.ndarray,
                          num_anchors: int,
                          pre_nms_top_n: int,
                          post_nms_top_n: int,
                          nms_thresh: float,
                          min_size: float) -> Proposals:
    """Proposals for ONE image.

    Args:
      rpn_cls_prob: [H, W, 2A] softmax probs laid out like the reference's
        ``rpn_cls_prob_reshape`` (first A channels bg, last A fg after the
        NCHW transpose — see below).
      rpn_bbox_pred: [H, W, 4A] box deltas.
      im_info: [>=3] (height, width, scale, ...) of this image.
      anchors: [H*W*A, 4] shifted anchors (host constant).
    """
    h, w, twice_a = rpn_cls_prob.shape
    a = num_anchors
    assert twice_a == 2 * a

    # Reference slices fg scores as channels [A:2A] after transposing to NCHW
    # (proposal_layer_tf_bus.py:34,86), then flattens back to (h, w, a) order
    # (proposal_layer_tf_bus.py:113).  In NHWC that is simply the last A
    # channels, flattened row-major.
    scores = rpn_cls_prob[:, :, a:].reshape(-1)
    deltas = rpn_bbox_pred.reshape(-1, 4)

    proposals = bbox_transform_inv(anchors, deltas)
    proposals = clip_boxes(proposals, im_info[0], im_info[1])

    ws = proposals[:, 2] - proposals[:, 0] + 1.0
    hs = proposals[:, 3] - proposals[:, 1] + 1.0
    min_px = min_size * im_info[2]
    valid = (ws >= min_px) & (hs >= min_px)

    # Top pre_nms_top_n by score among valid boxes.  A single stable payload
    # sort carries the box coordinates along with the (negated) scores —
    # replacing top_k + a [pre_n, 4] row gather, which costs ~0.8 ms on TPU
    # vs ~0.02 ms for the fused sort (rows of 4 floats waste the 128-wide
    # lanes; the sort network moves whole lane vectors).
    k = min(pre_nms_top_n, scores.shape[0])
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    sneg, sx1, sy1, sx2, sy2 = jax.lax.sort(
        (-masked_scores, proposals[:, 0], proposals[:, 1], proposals[:, 2],
         proposals[:, 3]), num_keys=1)
    top_scores = -sneg[:k]
    top_valid = jnp.isfinite(top_scores)
    boxes_t = jnp.stack([sx1[:k], sy1[:k], sx2[:k], sy2[:k]])   # [4, k]

    if jax.default_backend() == "tpu":
        keep = nms_keep_pallas(boxes_t, top_valid, nms_thresh)
    else:
        keep = nms_mask(jnp.transpose(boxes_t), top_valid, nms_thresh)

    # Stable kept-first selection of the top post_nms_top_n survivors
    # (score order is preserved within the kept set).
    rank = jnp.where(keep, jnp.arange(k), k + jnp.arange(k))
    _, kept_order = jax.lax.top_k(-rank, post_nms_top_n)
    out_boxes = jnp.transpose(boxes_t[:, kept_order])
    out_scores = top_scores[kept_order]
    return Proposals(out_boxes, out_scores, keep[kept_order])


@partial(jax.jit, static_argnames=(
    "num_anchors", "pre_nms_top_n", "post_nms_top_n", "nms_thresh",
    "min_size"))
def proposal_layer(rpn_cls_prob: jnp.ndarray,
                   rpn_bbox_pred: jnp.ndarray,
                   im_info: jnp.ndarray,
                   anchors: jnp.ndarray,
                   num_anchors: int = 9,
                   pre_nms_top_n: int = 6000,
                   post_nms_top_n: int = 300,
                   nms_thresh: float = 0.7,
                   min_size: float = 16.0) -> Proposals:
    """Batched proposal layer: [B, H, W, *] inputs -> Proposals with [B, P]."""
    fn = partial(proposal_layer_single,
                 anchors=anchors, num_anchors=num_anchors,
                 pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n,
                 nms_thresh=nms_thresh, min_size=min_size)
    return jax.vmap(fn)(rpn_cls_prob, rpn_bbox_pred, im_info)


def proposals_to_rois(props: Proposals) -> jnp.ndarray:
    """Flatten batched proposals into the reference's [N, 5] roi blob format
    ``(batch_idx, x1, y1, x2, y2)`` (proposal_layer_tf_bus.py:144-146).

    Rows where ``props.valid`` is False carry the coordinates of SUPPRESSED
    proposals, not zeros — consumers must respect the validity mask.
    (Engine._rois5 is the engine-internal equivalent with a first_index
    offset for joint batches.)"""
    b, p, _ = props.boxes.shape
    batch_idx = jnp.broadcast_to(jnp.arange(b, dtype=props.boxes.dtype)[:, None],
                                 (b, p))
    rois = jnp.concatenate([batch_idx[..., None], props.boxes], axis=-1)
    return rois.reshape(b * p, 5)
