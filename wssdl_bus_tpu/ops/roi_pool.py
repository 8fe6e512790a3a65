"""ROI max pooling with the reference TF op's exact semantics, jit-native.

Replaces the ~880-line C++/CUDA custom op
(``/root/reference/code/lib/roi_pooling_layer/roi_pooling_op.cc:141-196``,
``roi_pooling_op_gpu.cu.cc:20-85``) and its hand-written argmax-scatter
backward (``roi_pooling_op.cc`` backward kernels, ``_gpu.cu.cc:113-190``)
with a differentiable gather-max: the VJP through ``max`` reproduces the
scatter-to-argmax backward for free.

Semantics reproduced bit-for-bit (see tests/oracles.py::roi_pool_oracle):
  * ROI corners quantized with round-half-away-from-zero
    (C ``round()``, coords are non-negative so ``floor(x + 0.5)``);
  * malformed ROIs forced to 1x1 (``max(end - start + 1, 1)``);
  * bin edges: the reference casts the float edge to int BEFORE floor/ceil
    (``floor(static_cast<int>(ph * bin_h))``), so BOTH edges truncate and the
    documented ceil is a no-op — bins can be empty even inside the ROI;
  * empty bins (after clipping to the feature extent) output 0 and
    backprop nothing.

TPU formulation: the max over each bin's rectangular window is separable
(rows then columns), and every bin spans at most ``H // pooled_h + 2`` rows
(resp. columns) — a static bound — so the pool becomes two short accumulation
loops over gathered rows/columns instead of a data-dependent window.  ROIs
are processed in chunks via ``lax.map`` to bound the [chunk, Ph, W, C]
intermediate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_half_up(x):
    """C round() for non-negative inputs (round half away from zero)."""
    return jnp.floor(x + 0.5)


def _bin_edges(start_q, size_q, pooled, span, limit):
    """Per-bin [pooled] start indices and counts along one axis.

    start_q/size_q: quantized roi start and (>=1) size, scalars.
    Returns (starts [pooled] int32 clipped to [0, limit],
             counts [pooled] int32, window row count per bin, <= span).
    """
    bin_size = size_q.astype(jnp.float32) / pooled
    p = jnp.arange(pooled, dtype=jnp.float32)
    lo = (p * bin_size).astype(jnp.int32)          # trunc, matches int cast
    hi = ((p + 1.0) * bin_size).astype(jnp.int32)  # trunc — ceil is a no-op
    lo = jnp.clip(lo + start_q, 0, limit)
    hi = jnp.clip(hi + start_q, 0, limit)
    cnt = jnp.maximum(hi - lo, 0)
    return lo, cnt


def _roi_pool_one(feat, roi, pooled_h, pooled_w, spatial_scale,
                  span_h, span_w):
    """Pool ONE roi against the full [B, H, W, C] feature stack."""
    b_idx = roi[0].astype(jnp.int32)
    q = _round_half_up(roi[1:5] * spatial_scale).astype(jnp.int32)
    rsw, rsh, rew, reh = q[0], q[1], q[2], q[3]
    roi_w = jnp.maximum(rew - rsw + 1, 1)
    roi_h = jnp.maximum(reh - rsh + 1, 1)

    _, h, w, c = feat.shape
    feat_b = jax.lax.dynamic_index_in_dim(feat, b_idx, axis=0, keepdims=False)

    h_lo, h_cnt = _bin_edges(rsh, roi_h, pooled_h, span_h, h)
    w_lo, w_cnt = _bin_edges(rsw, roi_w, pooled_w, span_w, w)

    neg_inf = jnp.asarray(-jnp.inf, feat.dtype)

    # Row stage: [pooled_h, W, C] max over each bin's row window.
    def row_step(m, acc):
        idx = jnp.clip(h_lo + m, 0, h - 1)            # [pooled_h]
        rows = jnp.take(feat_b, idx, axis=0)          # [pooled_h, W, C]
        ok = (m < h_cnt)[:, None, None]
        return jnp.maximum(acc, jnp.where(ok, rows, neg_inf))

    rows0 = jnp.full((pooled_h, w, c), neg_inf, feat.dtype)
    rows = jax.lax.fori_loop(0, span_h, row_step, rows0)

    # Column stage: [pooled_h, pooled_w, C].
    def col_step(m, acc):
        idx = jnp.clip(w_lo + m, 0, w - 1)            # [pooled_w]
        cols = jnp.take(rows, idx, axis=1)            # [pooled_h, pooled_w, C]
        ok = (m < w_cnt)[None, :, None]
        return jnp.maximum(acc, jnp.where(ok, cols, neg_inf))

    out0 = jnp.full((pooled_h, pooled_w, c), neg_inf, feat.dtype)
    out = jax.lax.fori_loop(0, span_w, col_step, out0)

    # Empty bins (either axis) -> 0, like the reference's is_empty path.
    empty = (h_cnt == 0)[:, None] | (w_cnt == 0)[None, :]
    return jnp.where(empty[:, :, None] | jnp.isneginf(out), 0.0, out)


@partial(jax.jit, static_argnames=("pooled_h", "pooled_w", "spatial_scale",
                                   "chunk"))
def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray,
             pooled_h: int = 7, pooled_w: int = 7,
             spatial_scale: float = 1.0 / 16.0,
             chunk: int = 256) -> jnp.ndarray:
    """ROI max pooling.

    Args:
      feat: [B, H, W, C] feature maps (NHWC).
      rois: [R, 5] rows of (batch_idx, x1, y1, x2, y2) in input-image coords.
      chunk: ROIs processed per ``lax.map`` step to bound peak memory.
    Returns:
      [R, pooled_h, pooled_w, C].
    """
    _, h, w, _ = feat.shape
    span_h = h // pooled_h + 2
    span_w = w // pooled_w + 2
    r = rois.shape[0]
    pad = (-r) % chunk
    if pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((pad, 5), rois.dtype)], axis=0)

    fn = partial(_roi_pool_one, feat, pooled_h=pooled_h, pooled_w=pooled_w,
                 spatial_scale=spatial_scale, span_h=span_h, span_w=span_w)
    chunked = rois.reshape(-1, chunk, 5)
    out = jax.lax.map(lambda rs: jax.vmap(fn)(rs), chunked)
    out = out.reshape(-1, pooled_h, pooled_w, feat.shape[-1])
    return out[:r]
