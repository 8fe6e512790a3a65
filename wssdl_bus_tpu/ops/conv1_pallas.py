"""Fused VGG stem (conv1_1 -> relu -> conv1_2 -> relu -> 2x2 maxpool) as a
single Pallas TPU kernel.

Why this exists (measured on v5e, batch 8, 608x800, tools/profile_conv1.py):

    conv1_1 (XLA conv)      0.806 ms/img   (2.1 TF/s — K=3 channels)
    conv1_2 (XLA conv)      1.379 ms/img   (26 TF/s)
    pool1  (reduce_window)  0.858 ms/img
    whole stem, XLA-fused   1.656 ms/img

which is ~57% of the VGG trunk and ~46% of the whole batched serving step
(tools/profile_vgg_blocks.py: every other conv block already runs at the
~195 TF/s MXU roofline).  The structural problem XLA cannot fix at these
shapes: conv1_1's contraction depth is 3·3·3=27 — the MXU's K dimension
is 128, so a direct conv runs at ~2% utilisation — and the conv1_2/pool
schedule only reaches ~26 TF/s at N=64.  (CORRECTION, r03 measured: HBM
traffic is NOT the f32 story originally assumed here — XLA's
excess-precision elimination already stores the whole conv chain,
weights and activations, in bf16 in the optimized HLO; explicit bf16
storage casts are a bit-identical NO-OP, tools/check_bf16_store_tpu.py.
The intermediates round-trip ~62 MB/image in bf16, a ~0.3 ms/img
bandwidth floor; the remaining ~1.7 ms/img gap is conv scheduling, which
is exactly what this kernel attacks.)

The kernel strategy (all shapes static; reference semantics are the
plain biased convs + VALID 2x2/2 maxpool of
``/root/reference/code/lib/networks/VGGnet_train_bus.py:45-49``):

  * the image is pre-padded and cut into overlapping row/column chunks in
    XLA (halo 2 rows/cols for the two 3x3 convs), one grid step per chunk
    — the only HBM traffic is the 3-channel input chunks in and the
    pooled 64-channel output out (~37 MB/image vs ~0.5 GB);
  * conv1_1 is an im2col matmul: 9 flat shifted views of the (rows, 3)
    chunk are lane-concatenated into patches (rows, 27) and hit the MXU
    as ONE K=27 matmul (21% utilisation instead of 2%, and only 1.7 GF);
  * conv1_2 packs, per dx-tap, the 3 dy-shifted views of conv1_1's output
    channel-wise into (rows, 192) and accumulates 3 K=192 matmuls — the
    same 4.5 MXU K-passes as a single K=576 matmul, without materialising
    the 576-lane operand;
  * every "shifted view" is a FLAT sublane offset over the (row-major)
    flattened chunk, realised as a direct REF LOAD at the offset
    (``ref[pl.ds(off, m), :]``) — the one shifted-view idiom this Mosaic
    lowers correctly (tools/probe_mosaic.py + tools/PROBES.md: value-slices at offsets and
    constant rolls fold into lazy layout offsets that ``tpu.concatenate``
    rejects; dynamic rotates reject unaligned shapes; and offset loads
    feeding a matmul DIRECTLY compile but produce wrong values — loads
    must flow through a concatenate).  conv1_1's output is staged through
    a VMEM scratch ref so conv1_2's views can be loads too.  The 2
    garbage columns each flat shift wraps into a row are dropped at the
    pool stage;
  * the 2x2 maxpool runs on the VMEM-resident conv1_2 output.

Numerics: matmuls run bf16 x bf16 -> f32 on the MXU, which is exactly how
XLA lowers these f32 convs at default precision (single-pass bf16; see
COMPONENT_MAP.md perf notes), so the fused stem matches the XLA stem to
bf16 rounding (tests assert ~1e-2 relative; exact on pow2 grids).  Biases,
ReLUs, tap accumulation and the pool are f32.

Wired into inference AND the training forward
(``models/detector.py:FasterRCNN.apply_trunk``): VGG conv1/conv2 are frozen
— reference VGGnet_train_bus.py:45-49 ``trainable=False``, enforced here
by the optimizer mask — so no gradient ever flows through the stem and the
``stop_gradient`` wrapper (the kernel has no VJP) changes nothing.

STATUS (measured on v5e, tools/check_stem_tpu.py): this kernel is
BIT-EXACT against the XLA stem on device but currently ~2x SLOWER
(4.14 vs 2.07 ms/img at batch 8) — tools/probe_stem_phases.py shows the
XLA-side overlapping-chunk materialisation alone costs 2.9 ms/img (the
narrow 3-lane blocks are physically padded to 128 lanes on the VMEM side
of the pipeline DMA), dwarfing the in-kernel compute (~1.2 ms).  It is
therefore gated OPT-IN: ``fused_stem_ok`` returns True only with
``WSSDL_FUSED_STEM=1``.  The fix is a width-in-lanes data layout (channels
in sublanes), which is the follow-up design.

RE-EVALUATION TRIGGER: re-run ``tools/check_stem_tpu.py`` (and the r04
on/off bench matrix, tools/PROBES.md "Stem-dispatch status") when a Mosaic
upgrade lowers EITHER (a) sub-32-bit shifted ref-loads or (b) lane-offset
``tpu.concatenate`` (the two failures in PROBES.md "Mosaic lowering support
matrix" that force the expensive XLA-side input staging).  Until one of
those lowers, this kernel stays a measured-negative evidence artifact.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 8          # conv1_2 output rows per grid step (even: pool pairs rows)
_HALO = 4       # 2 rows of conv1_1 halo + 2 of padding margin

__all__ = ["vgg_stem_fused", "vgg_stem_reference", "fused_stem_ok",
           "stem_shape_ok"]


def vgg_stem_reference(x, w1, b1, w2, b2):
    """The stem as plain XLA ops (the exact graph ConvBlock+max_pool build):
    conv(3->64, SAME) + bias + relu, conv(64->64, SAME) + bias + relu,
    2x2/2 VALID maxpool.  Float32 in/out."""
    def conv(v, w):
        dn = jax.lax.conv_dimension_numbers(
            v.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    a = jnp.maximum(conv(x, w1) + b1, 0.0)
    a = jnp.maximum(conv(a, w2) + b2, 0.0)
    return jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def stem_shape_ok(shape) -> bool:
    """Pure shape eligibility for the fused stem: [B, H, W, 3] with the
    row/column chunking dividing evenly.  Backend/opt-out gating lives in
    ``fused_stem_ok``; ``vgg_stem_fused`` enforces THIS predicate itself."""
    if len(shape) != 4 or shape[3] != 3:
        return False
    h, w = shape[1], shape[2]
    # rows: BH per step; cols: two halves, each even (pool) and >= 8
    return h % (2 * BH) == 0 and w % 4 == 0 and h >= 2 * BH and w >= 16


def fused_stem_ok(shape) -> bool:
    """Fused-stem eligibility for an [B, H, W, 3] input: TPU backend, the
    row/column chunking divides evenly, and OPTED IN via
    ``WSSDL_FUSED_STEM=1`` (opt-in while the kernel trails the XLA stem —
    see the STATUS note in the module docstring)."""
    if os.environ.get("WSSDL_FUSED_STEM", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    return stem_shape_ok(shape)


def _stem_kernel(xc_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, a1_ref,
                 *, wloc: int, wout: int):
    """One (batch, row-chunk, col-half) grid step.

    xc_ref:  (1, 1, 1, (BH+_HALO+1) * wloc, 3) f32 — flattened padded
             input rows for this chunk (row-major (row, col)).  f32 (not
             bf16): the flat shifted views are ref loads feeding a
             concatenate, and sub-32-bit relayouts are the weak spot of
             this Mosaic; the bf16 cast happens on the concatenated
             patches, which is bit-identical to casting first (the
             shuffles are permutations).
    w1_ref:  (27, 64)  bf16 — conv1_1 kernel, (dy, dx, c) flat.
    b1_ref:  (1, 64)   f32
    w2_ref:  (3, 192, 64) bf16 — conv1_2 kernel regrouped per dx-tap,
             lane order (dy, c).
    b2_ref:  (1, 64)   f32
    out_ref: (1, BH // 2, wout, 64) f32 — pooled output tile.
    a1_ref:  (m1, 64) f32 VMEM scratch — conv1_1 output staged so
             conv1_2's shifted views can be ref loads.
    """
    m1 = (BH + 2) * wloc + 2                   # conv1_1 rows (+2: dy-slices)
    m2 = BH * wloc                             # conv1_2 rows
    assert 2 * wloc + 2 + m1 <= xc_ref.shape[3]  # shifted windows fit

    # conv1_1: patches (m1, 27) by lane-concatenating 9 flat-shifted views,
    # each a direct ref load at its offset (see module docstring)
    taps = [xc_ref[0, 0, 0, pl.ds(dy * wloc + dx, m1), :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(taps, axis=1).astype(jnp.bfloat16)  # (m1, 27)
    a1 = jnp.dot(patches, w1_ref[:], preferred_element_type=jnp.float32)
    a1 = jnp.maximum(a1 + b1_ref[0, :], 0.0)

    # SAME-padding semantics of the CHAINED convs: conv1_2 must see ZEROS
    # outside the image, not conv1_1 evaluated on the padded extension —
    # zero the A1 halo ring that falls outside [0, H) x [0, W).  Rows: the
    # top halo row exists only in the first row-chunk, the bottom one only
    # in the last; columns: vl == 0 is global v = -1 in the left half,
    # vl == W/2 + 1 is global v = W in the right half (each half's other
    # halo column is interior and must be kept).
    i = pl.program_id(1)
    j = pl.program_id(2)
    f = jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0)
    halo = (jnp.logical_and(i == 0, f < wloc)
            | jnp.logical_and(i == pl.num_programs(1) - 1,
                              f >= (BH + 1) * wloc)
            | (f % wloc == jnp.where(j == 0, 0, wloc - 3)))
    a1_ref[:] = jnp.where(halo, 0.0, a1)       # stage for shifted-view loads

    # conv1_2: per dx-tap, lane-concatenate the 3 dy-shifted views of a1
    # into (m2, 192) and accumulate a K=192 matmul — 4.5 MXU K-passes
    # total, same as one K=576.  The lhs MUST be a concatenate result:
    # offset loads feeding jnp.dot directly miscompile (probe P,
    # tools/PROBES.md, probe_mosaic2).
    acc = jnp.zeros((m2, 64), jnp.float32)
    for dx in range(3):
        lhs = jnp.concatenate(
            [a1_ref[pl.ds(dy * wloc + dx, m2), :] for dy in range(3)],
            axis=1).astype(jnp.bfloat16)       # (m2, 192)
        acc = acc + jnp.dot(lhs, w2_ref[dx],
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b2_ref[0, :], 0.0)   # (m2, 64) f32

    # 2x2/2 maxpool; the last (wloc - 2*wout) columns per row are the
    # flat-shift wrap garbage and are dropped here
    yv = y.reshape(BH // 2, 2, wloc // 2, 2, 64)
    pooled = jnp.max(jnp.max(yv, axis=3), axis=1)     # (BH//2, wloc//2, 64)
    out_ref[0] = pooled[:, :wout, :]


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def vgg_stem_fused(x, w1, b1, w2, b2, out_dtype=jnp.float32,
                   interpret=False):
    """Fused stem: x [B, H, W, 3] f32/bf16 -> [B, H//2, W//2, 64].

    Requires ``fused_stem_ok(x.shape)`` (or ``interpret=True`` for CPU
    correctness tests).  Weights are the ConvBlock params: w1 [3,3,3,64],
    w2 [3,3,64,64], biases [64]."""
    if not stem_shape_ok(x.shape):
        raise ValueError(
            f"vgg_stem_fused: input shape {tuple(x.shape)} fails the "
            f"chunking preconditions (need [B, H, W, 3] with H % {2 * BH} "
            "== 0, W % 4 == 0, W >= 16) — gate call sites on "
            "fused_stem_ok()")
    B, H, W, _ = x.shape
    nrow = H // BH
    wout = W // 4                   # pooled cols per half
    wloc = W // 2 + 4               # half width + 2-col halo each side

    # pad 2 rows/cols each side (+1 extra row: the flat-shift reads of the
    # final chunk run one row past its 12-row window)
    # f32 chunks (not bf16): the in-kernel shifted-view loads feed a
    # concatenate and sub-32-bit relayouts are this Mosaic's weak spot.
    # The input stream is 3 channels — doubling it is noise next to the
    # 64-ch pooled output stream; the bf16 cast moves inside the kernel.
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (2, 3), (2, 2), (0, 0)))
    rows = BH + _HALO + 1
    # overlapping (rows x wloc) chunks, flattened row-major so in-kernel
    # tap shifts are contiguous sublane slices
    row_chunks = [xp[:, i * BH: i * BH + rows] for i in range(nrow)]
    xr = jnp.stack(row_chunks, axis=1)          # (B, nrow, rows, W+4, 3)
    halves = [xr[:, :, :, : wloc], xr[:, :, :, W // 2: W // 2 + wloc]]
    xc = jnp.stack(halves, axis=2)              # (B, nrow, 2, rows, wloc, 3)
    xc = xc.reshape(B, nrow, 2, rows * wloc, 3)

    w1m = w1.reshape(27, 64).astype(jnp.bfloat16)
    # (dy, dx, ci, co) -> per-dx (dy*64 + ci, co): the kernel's per-dx lhs
    # lane order is (dy-tap, channel)
    w2m = jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 192, 64) \
             .astype(jnp.bfloat16)
    b1m = b1.reshape(1, 64).astype(jnp.float32)
    b2m = b2.reshape(1, 64).astype(jnp.float32)

    kernel = functools.partial(_stem_kernel, wloc=wloc, wout=wout)
    out = pl.pallas_call(
        kernel,
        grid=(B, nrow, 2),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rows * wloc, 3),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM(((BH + 2) * wloc + 2, 64), jnp.float32)],
        out_specs=pl.BlockSpec((1, BH // 2, wout, 64),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, 64),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 64 * (27 + 9 * 64),
            bytes_accessed=xc.size * 4 + B * (H // 2) * (W // 2) * 64 * 4,
            transcendentals=0),
    )(xc, w1m, b1m, w2m, b2m)
    return out.astype(out_dtype)
