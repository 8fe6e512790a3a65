"""Pallas TPU kernel for ROI max pooling (forward + backward).

The hot op of the detector: training pools ~4.1k ROIs/step (128 sampled ROIs
per supervised image + 2000 proposals per weak image), inference 300/image.
Semantics are the reference TF op's exactly (see ops/roi_pool.py docstring and
``/root/reference/code/lib/roi_pooling_layer/roi_pooling_op.cc:141-196``):
round-half-away ROI quantization, >=1x1 forcing, truncated bin edges, empty
bins -> 0.  The backward routes each bin's WHOLE gradient to a single argmax
cell like the reference's scatter (roi_pooling_op_gpu.cu.cc:113-190), where
the pure-jit fallback's ``jnp.max`` VJP splits exact ties (see the tie-order
note inside ``_bwd_kernel``).

Kernel shape: per image, grid over (channel blocks x blocks of ROI_BLOCK
rois); each channel block of the [H, W, C] feature map lives in VMEM (a
stride-16 map slice is <= 4 MB); the pool is SEPARABLE — per roi, stage 1
dynamic-slices each row-bin's [SPAN_H, W, C] H-window (Mosaic only allows
unaligned dynamic slices on non-tiled axes) and max-reduces it into a
[Ph, W, C] scratch, stage 2 reduces the scratch under each column-bin's
full-W mask.  The backward mirrors the two stages with first-occurrence
argmax routing and accumulates into a VMEM-resident dfeat across the
sequential grid, one [SPAN_H, W, C] update per (roi, row-bin).

Measured on one v5e chip at training shapes (2 images x 2000 rois, C=512,
38x50 features): forward 6.3 ms vs 145 ms for the jit fallback (15.5 ms
before the additive-mask + windowed-stage-2 rework, see _fwd_kernel);
fwd+bwd 32 ms with dense cotangents vs 458 ms — the real train step's MIL
sparsity skips ~99.8% of the weak-roi scatters.  Full train step
644 -> 50 ms/iter over the kernel's history.

Use ``roi_pool_grouped`` below: it dispatches to this kernel on TPU and to
the jit fallback elsewhere (tests compare both against the numpy oracle).
``roi_pool_fc`` is the fused pool+flatten variant the VGG fc head consumes
(see its section comment below).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROI_BLOCK = 8


def _bin_window(coord_lo, size, pooled, k, limit, span, flavor):
    """Scalar bin-k window along one axis: (start, lo, hi) ints with lo/hi
    the bin edges clipped to [0, limit] and start the slice origin such that
    [start, start+span) covers [lo, hi).  Edges per ``flavor``: 'gpu' =
    floor/ceil (reference CUDA kernel, roi_pooling_op_gpu.cu.cc:51-58),
    'cpu' = both truncated (roi_pooling_op.cc:167-170).  Either way
    hi - lo <= floor(limit/pooled) + 2 == the span (see _spans)."""
    # exact integer edges — see ops/roi_pool.py::_bin_masks for why the C
    # kernels' f32 formulation is not reproducible bit-for-bit
    lo = (k * size) // pooled + coord_lo
    if flavor == "gpu":
        # ceildiv via non-negative operands only (C-trunc == floor there)
        hi = ((k + 1) * size + (pooled - 1)) // pooled + coord_lo
    else:
        hi = ((k + 1) * size) // pooled + coord_lo       # floordiv (trunc)
    lo = jnp.clip(lo, 0, limit)
    hi = jnp.clip(hi, 0, limit)
    start = jnp.clip(lo, 0, limit - span)
    return start, lo, hi


def _quantize(rois_ref, r, spatial_scale):
    """ROI row r -> quantized (rsw, rsh, roi_w, roi_h) scalars."""
    def q(v):
        return jnp.floor(v * spatial_scale + 0.5).astype(jnp.int32)

    rsw = q(rois_ref[r, 0])
    rsh = q(rois_ref[r, 1])
    rew = q(rois_ref[r, 2])
    reh = q(rois_ref[r, 3])
    roi_w = jnp.maximum(rew - rsw + 1, 1)
    roi_h = jnp.maximum(reh - rsh + 1, 1)
    return rsw, rsh, roi_w, roi_h


def _fwd_kernel(rois_ref, feat_ref, out_ref, rows_ref, *, pooled_h, pooled_w,
                spatial_scale, span_h, span_w, wspan, flavor):
    """Separable pool: per roi, stage 1 reduces each row-bin's [span_h, W, C]
    H-slice into rows_ref [Ph, W_pad, C] (dynamic slicing only along H —
    Mosaic allows unaligned dynamic slices only on non-tiled axes), stage 2
    reduces an 8-ALIGNED [Ph, wspan, C] column window per column bin (aligned
    sublane slices are fine), instead of masking the full width: at W=50,
    Ph=Pw=7 that is 3x less stage-2 work.  Masking is ADDITIVE — a
    [span, 1, 1] f32 offset of 0 / -1e30 broadcast-added before the max —
    one add+max pass where the old mult/mult/sub/max formulation paid four
    (Mosaic cannot broadcast 8-bit bools across an inserted minor dim, so a
    jnp.where on a bool mask is not available).  Combined: 13.0 -> 6.3 ms at
    the 2x2000-roi train shapes, 1.03 -> 0.41 ms at 300 test rois."""
    h, w, c = feat_ref.shape
    w_pad = rows_ref.shape[1]
    iota_sh = jax.lax.broadcasted_iota(jnp.int32, (span_h, 1, 1), 0)
    iota_ws = jax.lax.broadcasted_iota(jnp.int32, (pooled_h, wspan, 1), 1)
    big = jnp.float32(1e30)

    # the [w, w_pad) tail of the rows scratch is never written by stage 1 but
    # can be read by a clipped stage-2 window: keep it at a finite constant
    # (garbage would poison the max; masked lanes only need to stay <= -big
    # after the additive offset)
    @pl.when(pl.program_id(1) == 0)
    def _():
        if w_pad > w:
            rows_ref[:, w:, :] = jnp.full((pooled_h, w_pad - w, c), -big,
                                          rows_ref.dtype)

    def roi_body(r, _):
        rsw, rsh, roi_w, roi_h = _quantize(rois_ref, r, spatial_scale)
        for i in range(pooled_h):
            sh, lo_h, hi_h = _bin_window(rsh, roi_h, pooled_h,
                                         jnp.int32(i), h, span_h, flavor)
            win = feat_ref[pl.ds(sh, span_h), :, :]
            off_h = (((iota_sh + sh >= lo_h) & (iota_sh + sh < hi_h))
                     .astype(jnp.float32) - 1.0) * big    # 0 in-bin, -big out
            ne_h = (hi_h > lo_h).astype(jnp.float32)      # scalar 0/1
            # empty h-bin -> whole row zeroed (-1e30 * 0), matching the
            # reference's empty-bin-outputs-0 path
            rows_ref[i, :w, :] = jnp.max(win + off_h, axis=0) * ne_h
        for j in range(pooled_w):
            _, lo_w, hi_w = _bin_window(rsw, roi_w, pooled_w,
                                        jnp.int32(j), w, span_w, flavor)
            base = pl.multiple_of((lo_w // 8) * 8, 8)
            rows_win = rows_ref[:, pl.ds(base, wspan), :]
            off_w = (((iota_ws + base >= lo_w) & (iota_ws + base < hi_w))
                     .astype(jnp.float32) - 1.0) * big
            ne_w = (hi_w > lo_w).astype(jnp.float32)
            m = jnp.max(rows_win + off_w, axis=1)          # [Ph, C]
            out_ref[pl.ds(r, 1), :, j, :] = (m * ne_w)[None]
        return 0

    jax.lax.fori_loop(0, ROI_BLOCK, roi_body, 0)


def _bwd_kernel(rois_ref, feat_ref, g_ref, dfeat_ref, *, pooled_h, pooled_w,
                spatial_scale, span_h, span_w, flavor):
    h, w, c = feat_ref.shape

    # zero this channel-block's dfeat at the first ROI block (grid is
    # (channel_blocks, roi_blocks), roi dim iterates fastest)
    @pl.when(pl.program_id(1) == 0)
    def _():
        dfeat_ref[:] = jnp.zeros_like(dfeat_ref)

    iota_sh = jax.lax.broadcasted_iota(jnp.int32, (span_h, 1, 1), 0)
    iota_w2 = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    big = jnp.float32(1e30)

    def roi_body(r, _):
        g_all = g_ref[r]                                     # [Ph, Pw, C]
        # MIL sparsity: for weak images only the per-bag argmax instance
        # carries gradient (mil/__init__.py selectors), so ~1996 of 2000
        # weak-proposal cotangent blocks are EXACTLY zero — skip their whole
        # scatter (the reference backward iterates all of them,
        # roi_pooling_op_gpu.cu.cc:113-190)
        @pl.when(jnp.sum(jnp.abs(g_all)) > 0.0)
        def _():
            rsw, rsh, roi_w, roi_h = _quantize(rois_ref, r, spatial_scale)
            for i in range(pooled_h):
                sh, lo_h, hi_h = _bin_window(rsh, roi_h, pooled_h,
                                             jnp.int32(i), h, span_h,
                                             flavor)
                # one [span_h, W, C] H-slice per row-bin (dynamic slicing
                # only along H); f32 masks — see the forward kernel note on
                # 8-bit broadcasts.  The scatter is SEPARABLE, mirroring the
                # forward: stage-2 routes each bin's grad to the first w
                # whose column max equals the bin max, stage-1 routes each
                # column's grad to the first h attaining the column max.
                # This places every bin's gradient on exactly ONE max cell
                # like the reference's argmax scatter; only on exact f32
                # ties does the chosen cell differ (w-major vs the
                # reference's h-major scan) — and tied maxima are post-ReLU
                # zeros in practice, where the gradient dies in the ReLU
                # backward regardless of placement.
                win = feat_ref[pl.ds(sh, span_h), :, :]
                # additive masking (0 in-bin, -1e30 out), one add instead of
                # mult/mult/sub — see the forward kernel note
                off_h = (((iota_sh + sh >= lo_h) & (iota_sh + sh < hi_h))
                         .astype(jnp.float32) - 1.0) * big
                masked_win = win + off_h
                rows_i = jnp.max(masked_win, axis=0)         # [W, C]
                g_rows = jnp.zeros((w, c), jnp.float32)
                for j in range(pooled_w):
                    _, lo_w, hi_w = _bin_window(rsw, roi_w, pooled_w,
                                                jnp.int32(j), w, span_w,
                                                flavor)
                    off_w = (((iota_w2 >= lo_w) & (iota_w2 < hi_w))
                             .astype(jnp.float32) - 1.0) * big  # [W, 1]
                    masked_rows = rows_i + off_w
                    # jnp.argmax returns the FIRST maximum — one pass
                    # instead of max + equality + argmax-of-equality
                    am_w = jnp.argmax(masked_rows, axis=0)   # [C]
                    ne = ((hi_h > lo_h) & (hi_w > lo_w)) \
                        .astype(jnp.float32)
                    g = g_all[i, j, :] * ne                  # [C]
                    onehot_w = (iota_w2 == am_w[None, :]) \
                        .astype(jnp.float32)
                    g_rows = g_rows + onehot_w * g[None, :]
                am_h = jnp.argmax(masked_win, axis=0)        # [W, C]
                onehot_h = (iota_sh == am_h[None]).astype(jnp.float32)
                dfeat_ref[pl.ds(sh, span_h), :, :] += \
                    onehot_h * g_rows[None]
        return 0

    jax.lax.fori_loop(0, ROI_BLOCK, roi_body, 0)


def _spans(h, w, pooled_h, pooled_w):
    return h // pooled_h + 2, w // pooled_w + 2


def _wspan(w, span_w, align=8):
    """Aligned stage-2 window: must cover any [lo_w, hi_w) bin (width <=
    span_w) whose start is rounded down to a multiple of ``align``
    (<= align-1 slack).  align is 8 for 4-byte dtypes, 16 for 2-byte
    packed tiles (see _fc_align)."""
    return align * ((span_w + 2 * (align - 1)) // align)


def _w_pad(w, wspan, align=8):
    """Rows-scratch width: the window base can be as high as
    (w // align) * align (an empty edge bin has lo_w == w)."""
    return (w // align) * align + wspan


def _pad_rois(rois):
    p = rois.shape[0]
    pad = (-p) % ROI_BLOCK
    if pad:
        rois = jnp.concatenate([rois, jnp.zeros((pad, 4), rois.dtype)], 0)
    return rois, p


def _c_block(c: int, backward: bool = False) -> int:
    """Channel blocking keeps feat (+ dfeat and the argmax temporaries in the
    backward) within VMEM: the backward holds feat + dfeat + ~5 [span_h,W,CB]
    temporaries and compiles at the 16 MB edge with CB=512, so it runs at
    CB=256."""
    return min(c, 256 if backward else 512)


def _fwd_call(feat, rois, pooled_h, pooled_w, spatial_scale, interpret,
              flavor):
    h, w, c = feat.shape
    span_h, span_w = _spans(h, w, pooled_h, pooled_w)
    cb = _c_block(c)
    rois_p, p = _pad_rois(rois)
    grid = (c // cb, rois_p.shape[0] // ROI_BLOCK)
    wspan = _wspan(w, span_w)
    out = pl.pallas_call(
        partial(_fwd_kernel, pooled_h=pooled_h, pooled_w=pooled_w,
                spatial_scale=spatial_scale, span_h=span_h, span_w=span_w,
                wspan=wspan, flavor=flavor),
        out_shape=jax.ShapeDtypeStruct((rois_p.shape[0], pooled_h, pooled_w,
                                        c), feat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROI_BLOCK, 4), lambda ci, k: (k, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((h, w, cb), lambda ci, k: (0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROI_BLOCK, pooled_h, pooled_w, cb),
                               lambda ci, k: (k, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((pooled_h, _w_pad(w, wspan), cb),
                                   feat.dtype)],
        interpret=interpret,
    )(rois_p, feat)
    return out[:p]


def _bwd_call(feat, rois, g, pooled_h, pooled_w, spatial_scale, interpret,
              flavor):
    h, w, c = feat.shape
    span_h, span_w = _spans(h, w, pooled_h, pooled_w)
    cb = _c_block(c, backward=True)
    rois_p, p = _pad_rois(rois)
    pad = rois_p.shape[0] - p
    if pad:
        g = jnp.concatenate(
            [g, jnp.zeros((pad,) + g.shape[1:], g.dtype)], 0)
    grid = (c // cb, rois_p.shape[0] // ROI_BLOCK)
    dfeat = pl.pallas_call(
        partial(_bwd_kernel, pooled_h=pooled_h, pooled_w=pooled_w,
                spatial_scale=spatial_scale, span_h=span_h, span_w=span_w,
                flavor=flavor),
        out_shape=jax.ShapeDtypeStruct((h, w, c), feat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROI_BLOCK, 4), lambda ci, k: (k, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((h, w, cb), lambda ci, k: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROI_BLOCK, pooled_h, pooled_w, cb),
                         lambda ci, k: (k, 0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, w, cb), lambda ci, k: (0, 0, ci),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rois_p, feat, g)
    return dfeat


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_pool_image(feat, rois, pooled_h=7, pooled_w=7,
                   spatial_scale=1.0 / 16.0, interpret=False, flavor="gpu"):
    """ROI max pooling for ONE image: [H, W, C] x [P, 4] -> [P, Ph, Pw, C]."""
    return _fwd_call(feat, rois, pooled_h, pooled_w, spatial_scale, interpret,
                     flavor)


def _vjp_fwd(feat, rois, pooled_h, pooled_w, spatial_scale, interpret,
             flavor):
    out = _fwd_call(feat, rois, pooled_h, pooled_w, spatial_scale, interpret,
                    flavor)
    return out, (feat, rois)


def _vjp_bwd(pooled_h, pooled_w, spatial_scale, interpret, flavor, res, g):
    feat, rois = res
    dfeat = _bwd_call(feat, rois, g, pooled_h, pooled_w, spatial_scale,
                      interpret, flavor)
    return dfeat, None


roi_pool_image.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------- #
# Fused pool+flatten ("fc") variant
#
# The VGG head consumes pooled features as fc6's [N, Ph*Pw*C] matmul
# operand (flattened in natural NHWC order, models/layers.py Fc).  The
# general kernel's [N, Ph, Pw, C] output cannot be bitcast to that shape on
# TPU — Ph=Pw=7 is not tile-aligned, so XLA pays a relayout copy on the
# 400 MB weak-group tensor in BOTH directions (forward flatten + backward
# unflatten of the fc6 cotangent; ~3.7 ms/step profiled).  This variant
# writes the flat f32 layout directly from the kernel — the same values,
# max operations, store pattern and store count as the general kernel
# (per (roi, column-bin), 7 single-sublane [1, C] stores land in either
# layout), so forward AND backward are value-identical to pooling then
# reshaping; only the relayout copies disappear.
#
# ``out_dtype=bfloat16`` additionally halves the kernel's HBM write and
# the cotangent traffic with fc6-identical forward values (rounding
# commutes with max; XLA's default-precision matmul rounds its operand to
# bf16 anyway) — but on current Mosaic a single logical row of a PACKED
# (8,128)(2,1) bf16 tile is read-modify-write, which measured ~2x SLOWER
# end-to-end than the f32 relayout copies it saves (fwd 5.6 -> 10.9 ms,
# bwd guard reads 1.4 -> 14.8 ms).  The option is kept (and tested) for
# when Mosaic grows cheap packed row access; production uses f32.
#
# The backward takes the MIL-sparsity guard as a precomputed [P] flag
# vector in SMEM (XLA reduces the cotangent once, bandwidth-bound) so a
# skipped weak roi — ~99.8% of them — never touches its flat cotangent
# row at all.
# --------------------------------------------------------------------- #


def _fc_align(dtype) -> int:
    """Sublane alignment for dynamic second-minor slices: 8 rows for 4-byte
    types, 16 for 2-byte (the (8,128)(2,1) packed tile)."""
    return 8 * (4 // jnp.dtype(dtype).itemsize)


def _fc_fwd_kernel(rois_ref, feat_ref, out_ref, rows_ref, *, pooled_h,
                   pooled_w, spatial_scale, span_h, span_w, wspan, flavor,
                   align):
    """Same separable pool as ``_fwd_kernel``, but out_ref is the flat
    [ROI_BLOCK, Ph*Pw*C] block in ``rows_ref.dtype`` (bf16 in production):
    stage 2's per-column-bin [Ph, C] maxima are stored row-bin by row-bin at
    lane offset (i*Pw + j)*C.  feat_ref arrives already cast to the output
    dtype (rounding before the max equals rounding after — monotone)."""
    h, w, c = feat_ref.shape
    dt = rows_ref.dtype
    w_pad = rows_ref.shape[1]
    iota_sh = jax.lax.broadcasted_iota(jnp.int32, (span_h, 1, 1), 0)
    iota_ws = jax.lax.broadcasted_iota(jnp.int32, (pooled_h, wspan, 1), 1)
    big = jnp.asarray(1e30, dt)

    @pl.when(pl.program_id(1) == 0)
    def _():
        if w_pad > w:
            rows_ref[:, w:, :] = jnp.full((pooled_h, w_pad - w, c), -big, dt)

    def roi_body(r):
        rsw, rsh, roi_w, roi_h = _quantize(rois_ref, r, spatial_scale)
        for i in range(pooled_h):
            sh, lo_h, hi_h = _bin_window(rsh, roi_h, pooled_h,
                                         jnp.int32(i), h, span_h, flavor)
            win = feat_ref[pl.ds(sh, span_h), :, :]
            off_h = (((iota_sh + sh >= lo_h) & (iota_sh + sh < hi_h))
                     .astype(dt) - 1) * big
            ne_h = (hi_h > lo_h).astype(dt)
            rows_ref[i, :w, :] = jnp.max(win + off_h, axis=0) * ne_h
        for j in range(pooled_w):
            _, lo_w, hi_w = _bin_window(rsw, roi_w, pooled_w,
                                        jnp.int32(j), w, span_w, flavor)
            base = pl.multiple_of((lo_w // align) * align, align)
            rows_win = rows_ref[:, pl.ds(base, wspan), :]
            off_w = (((iota_ws + base >= lo_w) & (iota_ws + base < hi_w))
                     .astype(dt) - 1) * big
            ne_w = (hi_w > lo_w).astype(dt)
            m = jnp.max(rows_win + off_w, axis=1) * ne_w      # [Ph, C]
            for i in range(pooled_h):
                # 2-D row slice (m[i][None] would make a 1-D value, which
                # Mosaic may scalarize — see the backward's g read note)
                out_ref[r:r + 1,
                        (i * pooled_w + j) * c:(i * pooled_w + j + 1) * c] \
                    = m[i:i + 1]

    # python-unrolled over the ROI block: the flat out_ref's roi dim is its
    # SUBLANE dim, and Mosaic requires statically aligned sublane store
    # offsets — a fori_loop's traced index cannot be proven aligned
    for r in range(ROI_BLOCK):
        roi_body(r)


def _fc_bwd_kernel(rois_ref, feat_ref, g_ref, dfeat_ref, *,
                   pooled_h, pooled_w, spatial_scale, span_h, span_w,
                   flavor):
    """Mirror of ``_bwd_kernel`` for the flat cotangent: g_ref is
    [ROI_BLOCK, Ph*Pw*C] in the forward's output dtype, feat_ref arrives in
    that same dtype (the argmax routing must see the values the forward
    maxed over) and is upcast to f32 in-register — exact on bf16-rounded
    values, and Mosaic's argmax lowering only supports f32 anyway.  dfeat
    accumulates in float32.  rois_ref carries a 5th column: the
    precomputed has-nonzero-cotangent flag (folded into the one SMEM
    block — a second SMEM input measurably slowed every grid step) — the
    MIL-sparsity skip without reading g rows in-kernel."""
    h, w, c = feat_ref.shape
    iota_sh = jax.lax.broadcasted_iota(jnp.int32, (span_h, 1, 1), 0)
    iota_w2 = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    big = jnp.float32(1e30)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfeat_ref[:] = jnp.zeros_like(dfeat_ref)

    def roi_body(r):
        @pl.when(rois_ref[r, 4] != 0)
        def _():
            rsw, rsh, roi_w, roi_h = _quantize(rois_ref, r, spatial_scale)
            for i in range(pooled_h):
                sh, lo_h, hi_h = _bin_window(rsh, roi_h, pooled_h,
                                             jnp.int32(i), h, span_h,
                                             flavor)
                win = feat_ref[pl.ds(sh, span_h), :, :] \
                    .astype(jnp.float32)
                off_h = (((iota_sh + sh >= lo_h) & (iota_sh + sh < hi_h))
                         .astype(jnp.float32) - 1.0) * big
                masked_win = win + off_h
                rows_i = jnp.max(masked_win, axis=0)         # [W, C]
                g_rows = jnp.zeros((w, c), jnp.float32)
                for j in range(pooled_w):
                    _, lo_w, hi_w = _bin_window(rsw, roi_w, pooled_w,
                                                jnp.int32(j), w, span_w,
                                                flavor)
                    off_w = (((iota_w2 >= lo_w) & (iota_w2 < hi_w))
                             .astype(jnp.float32) - 1.0) * big  # [W, 1]
                    masked_rows = rows_i + off_w
                    am_w = jnp.argmax(masked_rows, axis=0)   # [C]
                    ne = ((hi_h > lo_h) & (hi_w > lo_w)) \
                        .astype(jnp.float32)
                    # read the bin's cotangent as the FULL [ROI_BLOCK, C]
                    # tiled slice and select the roi's row in-register:
                    # masked single-sublane reads and 1-D lane slices both
                    # made Mosaic scalarize (32 ms .. 3.7 s per active roi
                    # measured); full-sublane 2-D reads stay vectorized
                    g = g_ref[:, (i * pooled_w + j) * c:
                              (i * pooled_w + j + 1) * c][r:r + 1] \
                        .astype(jnp.float32) * ne            # [1, C]
                    onehot_w = (iota_w2 == am_w[None, :]) \
                        .astype(jnp.float32)
                    g_rows = g_rows + onehot_w * g
                am_h = jnp.argmax(masked_win, axis=0)        # [W, C]
                onehot_h = (iota_sh == am_h[None]).astype(jnp.float32)
                dfeat_ref[pl.ds(sh, span_h), :, :] += \
                    onehot_h * g_rows[None]

    # unrolled like the forward: g_ref's roi dim is its sublane dim, whose
    # read offset must be statically known
    for r in range(ROI_BLOCK):
        roi_body(r)


def _fc_fwd_call(feat, rois, pooled_h, pooled_w, spatial_scale, interpret,
                 flavor, out_dtype):
    h, w, c = feat.shape
    span_h, span_w = _spans(h, w, pooled_h, pooled_w)
    rois_p, p = _pad_rois(rois)
    align = _fc_align(out_dtype)
    # 16-aligned stage-2 windows for 2-byte dtypes (packed sublanes)
    wspan = _wspan(w, span_w, align)
    w_pad = _w_pad(w, wspan, align)
    d = pooled_h * pooled_w * c
    out = pl.pallas_call(
        partial(_fc_fwd_kernel, pooled_h=pooled_h, pooled_w=pooled_w,
                spatial_scale=spatial_scale, span_h=span_h, span_w=span_w,
                wspan=wspan, flavor=flavor, align=align),
        out_shape=jax.ShapeDtypeStruct((rois_p.shape[0], d), out_dtype),
        grid=(1, rois_p.shape[0] // ROI_BLOCK),
        in_specs=[
            pl.BlockSpec((ROI_BLOCK, 4), lambda ci, k: (k, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((h, w, c), lambda ci, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROI_BLOCK, d), lambda ci, k: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((pooled_h, w_pad, c), out_dtype)],
        interpret=interpret,
    )(rois_p, feat.astype(out_dtype))
    return out[:p]


def _fc_bwd_call(feat_cast, rois, g, pooled_h, pooled_w, spatial_scale,
                 interpret, flavor):
    h, w, c = feat_cast.shape
    span_h, span_w = _spans(h, w, pooled_h, pooled_w)
    rois_p, p = _pad_rois(rois)
    pad = rois_p.shape[0] - p
    if pad:
        g = jnp.concatenate(
            [g, jnp.zeros((pad,) + g.shape[1:], g.dtype)], 0)
    d = pooled_h * pooled_w * c
    active = jnp.any(g != 0, axis=-1).astype(rois_p.dtype)[:, None]
    rois_a = jnp.concatenate([rois_p, active], axis=1)       # [R, 5]
    dfeat = pl.pallas_call(
        partial(_fc_bwd_kernel, pooled_h=pooled_h, pooled_w=pooled_w,
                spatial_scale=spatial_scale, span_h=span_h, span_w=span_w,
                flavor=flavor),
        out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.float32),
        grid=(1, rois_p.shape[0] // ROI_BLOCK),
        in_specs=[
            pl.BlockSpec((ROI_BLOCK, 5), lambda ci, k: (k, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((h, w, c), lambda ci, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROI_BLOCK, d), lambda ci, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, w, c), lambda ci, k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rois_a, feat_cast, g)
    return dfeat


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def roi_pool_fc_image(feat, rois, pooled_h=7, pooled_w=7,
                      spatial_scale=1.0 / 16.0, interpret=False,
                      flavor="gpu", out_dtype=jnp.float32):
    """Fused pool+flatten for ONE image: [H, W, C] x [P, 4] ->
    [P, Ph*Pw*C] in ``out_dtype`` (NHWC flatten order, fc6-ready).  Values
    equal ``roi_pool_image(...).astype(out_dtype).reshape(P, -1)``."""
    return _fc_fwd_call(feat, rois, pooled_h, pooled_w, spatial_scale,
                        interpret, flavor, out_dtype)


def _fc_vjp_fwd(feat, rois, pooled_h, pooled_w, spatial_scale, interpret,
                flavor, out_dtype):
    out = _fc_fwd_call(feat, rois, pooled_h, pooled_w, spatial_scale,
                       interpret, flavor, out_dtype)
    # residual keeps the PRIMAL feat: the backward casts to out_dtype for
    # routing (it must rank the values the forward maxed over) and casts
    # dfeat back, so a non-f32 primal gets a dtype-correct cotangent
    return out, (feat, rois)


def _fc_vjp_bwd(pooled_h, pooled_w, spatial_scale, interpret, flavor,
                out_dtype, res, g):
    feat, rois = res
    feat_cast = feat.astype(out_dtype)
    if jnp.dtype(out_dtype) == jnp.float32:
        # f32 production path: XLA unflattens the cotangent (a relayout
        # copy) and the channel-blocked 4-D kernel scatters it.  The flat
        # _fc_bwd_kernel avoids that copy but cannot channel-block (a
        # channel sub-range is lane-strided across the 49 bins), so its
        # full-C VMEM footprint (~13 MB) costs Mosaic the g-block double
        # buffering — measured 27 us per SKIPPED roi block vs 2.8 us in
        # the blocked kernel: the copy is the cheaper evil.
        g4 = g.reshape(g.shape[0], pooled_h, pooled_w, -1)
        dfeat = _bwd_call(feat_cast, rois, g4, pooled_h, pooled_w,
                          spatial_scale, interpret, flavor)
    else:
        # bf16 option: routing must rank the bf16-rounded values the
        # forward maxed over; the flat kernel does (and upcasts in
        # register), the f32 4-D kernel cannot
        dfeat = _fc_bwd_call(feat_cast, rois, g, pooled_h, pooled_w,
                             spatial_scale, interpret, flavor)
    return dfeat.astype(feat.dtype), None


roi_pool_fc_image.defvjp(_fc_vjp_fwd, _fc_vjp_bwd)


def roi_pool_fc(feat: jnp.ndarray, rois: jnp.ndarray,
                pooled_h: int = 7, pooled_w: int = 7,
                spatial_scale: float = 1.0 / 16.0,
                force_fallback: bool = False,
                flavor: str = "gpu",
                out_dtype=jnp.float32) -> jnp.ndarray:
    """Batched fused pool+flatten: [B, H, W, C] x [B, P, 4] ->
    [B, P, Ph*Pw*C] in ``out_dtype``.  TPU: the flat Pallas kernel above;
    elsewhere: the jit fallback + reshape + cast (value-identical forward;
    the fallback backward splits exact ties like ``roi_pool_grouped``)."""
    b, p, _ = rois.shape
    d = pooled_h * pooled_w * feat.shape[-1]
    if b == 0 or p == 0:
        return jnp.zeros((b, p, d), out_dtype)
    if force_fallback or jax.default_backend() != "tpu":
        out = roi_pool_grouped(feat, rois, pooled_h, pooled_w,
                               spatial_scale, force_fallback=True,
                               flavor=flavor)
        return out.reshape(b, p, d).astype(out_dtype)
    fn = partial(roi_pool_fc_image, pooled_h=pooled_h, pooled_w=pooled_w,
                 spatial_scale=spatial_scale, flavor=flavor,
                 out_dtype=out_dtype)
    return jax.vmap(fn)(feat, rois)


def roi_pool_grouped(feat: jnp.ndarray, rois: jnp.ndarray,
                     pooled_h: int = 7, pooled_w: int = 7,
                     spatial_scale: float = 1.0 / 16.0,
                     force_fallback: bool = False,
                     flavor: str = "gpu") -> jnp.ndarray:
    """Batched ROI pooling with per-image roi groups.

    Args:
      feat: [B, H, W, C]; rois: [B, P, 4] boxes in input-image coordinates
        (each roi pools against its own image's features).
    Returns [B, P, Ph, Pw, C].

    Dispatches to the Pallas kernel on TPU; elsewhere (CPU tests, debugging)
    falls back to the jit formulation in ops/roi_pool.py via batch-indexed
    5-col rois.
    """
    b, p, _ = rois.shape
    if b == 0 or p == 0:
        return jnp.zeros((b, p, pooled_h, pooled_w, feat.shape[-1]),
                         feat.dtype)
    if force_fallback or jax.default_backend() != "tpu":
        from wssdl_bus_tpu.ops.roi_pool import roi_pool

        idx = jnp.broadcast_to(
            jnp.arange(b, dtype=rois.dtype)[:, None], (b, p))
        rois5 = jnp.concatenate([idx[..., None], rois], -1).reshape(b * p, 5)
        out = roi_pool(feat, rois5, pooled_h, pooled_w, spatial_scale,
                       flavor=flavor)
        return out.reshape(b, p, pooled_h, pooled_w, feat.shape[-1])
    fn = partial(roi_pool_image, pooled_h=pooled_h, pooled_w=pooled_w,
                 spatial_scale=spatial_scale, flavor=flavor)
    return jax.vmap(fn)(feat, rois)
