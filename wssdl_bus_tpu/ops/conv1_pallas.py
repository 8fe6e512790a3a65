"""Fused VGG stem (conv1_1 -> relu -> conv1_2 -> relu -> 2x2 maxpool) as a
single Pallas TPU kernel.

Why this exists (measured on v5e, batch 8, 608x800, tools/profile_conv1.py):

    conv1_1 (XLA conv)      0.806 ms/img   (2.1 TF/s — K=3 channels)
    conv1_2 (XLA conv)      1.379 ms/img   (26 TF/s)
    pool1  (reduce_window)  0.858 ms/img
    whole stem, XLA-fused   1.656 ms/img

which is ~57% of the VGG trunk and ~46% of the whole batched serving step
(tools/profile_vgg_blocks.py: every other conv block already runs at the
~195 TF/s MXU roofline).  Three structural problems XLA cannot fix at
these shapes: (a) conv1_1's contraction depth is 3·3·3=27 — the MXU's
K dimension is 128, so a direct conv runs at ~2% utilisation; (b) the
full-resolution intermediates (608·800·64·4B = 124 MB/image) round-trip
HBM twice between the convs and the pool (~0.5 GB/image of traffic);
(c) ``reduce_window`` lowers to a windowed reduction that re-reads its
124 MB input at ~1/4 of the HBM copy rate.

The kernel strategy (all shapes static; reference semantics are the
plain biased convs + VALID 2x2/2 maxpool of
``/root/reference/code/lib/networks/VGGnet_train_bus.py:45-49``):

  * the image is pre-padded and cut into overlapping row/column chunks in
    XLA (halo 2 rows/cols for the two 3x3 convs), one grid step per chunk
    — the only HBM traffic is the 3-channel input chunks in and the
    pooled 64-channel output out (~37 MB/image vs ~0.5 GB);
  * conv1_1 is an im2col matmul: 9 flat shifted copies of the (rows, 3)
    chunk are lane-concatenated into patches (rows, 27) and hit the MXU
    as ONE K=27 matmul (21% utilisation instead of 2%, and only 1.7 GF);
  * conv1_2 packs the 3 dy-taps channel-wise: lane-concatenating the
    three row-shifted views of conv1_1's output gives (rows, 192), and
    the 3 dx-taps become 3 accumulated K=192 matmuls — full-depth MXU
    pipelining instead of 9 K=64 passes;
  * row shifts are FLAT sublane offsets over the (row-major) flattened
    chunk, so every "shifted view" is a contiguous slice: the 2 garbage
    columns this wraps into each row are dropped at the pool stage;
  * the 2x2 maxpool runs on the VMEM-resident conv1_2 output.

Numerics: matmuls run bf16 x bf16 -> f32 on the MXU, which is exactly how
XLA lowers these f32 convs at default precision (single-pass bf16; see
COMPONENT_MAP.md perf notes), so the fused stem matches the XLA stem to
bf16 rounding (tests assert ~1e-2 relative; exact on pow2 grids).  Biases,
ReLUs, tap accumulation and the pool are f32.

Used for INFERENCE only (the train path keeps XLA convs: conv1/conv2 are
frozen — reference VGGnet_train_bus.py:45-49 — so no backward exists, but
autodiff through ``pallas_call`` would need a custom VJP we don't want on
a path whose weights never train).  Gated by ``fused_stem_ok``.
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

__all__ = ["vgg_stem_fused", "vgg_stem_reference", "fused_stem_ok"]


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


def fused_stem_ok(shape) -> bool:
    """Fused-stem eligibility for an [B, H, W, 3] input: TPU backend, the
    row/column chunking divides evenly, and not opted out via
    ``WSSDL_FUSED_STEM=0``."""
    if os.environ.get("WSSDL_FUSED_STEM", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if len(shape) != 4 or shape[3] != 3:
        return False
    h, w = shape[1], shape[2]
    # rows: BH per step; cols: two halves, each even (pool) and >= 8
    return h % (2 * BH) == 0 and w % 4 == 0 and h >= 2 * BH and w >= 16


def _stem_kernel(xc_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                 *, wloc: int, wout: int):
    """One (batch, row-chunk, col-half) grid step.

    xc_ref:  (1, 1, 1, (BH+_HALO+1) * wloc, 3) bf16 — flattened padded
             input rows for this chunk (row-major (row, col)).
    w1_ref:  (27, 64)  bf16 — conv1_1 kernel, (dy, dx, c) flat.
    b1_ref:  (1, 64)   f32
    w2_ref:  (3, 192, 64) bf16 — conv1_2 kernel regrouped per dx-tap,
             lane order (dy, c).
    b2_ref:  (1, 64)   f32
    out_ref: (1, BH // 2, wout, 64) f32 — pooled output tile.
    """
    xf = xc_ref[0, 0, 0]                       # (rows*wloc, 3) bf16
    m1 = (BH + 2) * wloc + 2                   # conv1_1 rows (+2: dy-slices)
    m2 = BH * wloc                             # conv1_2 rows

    # conv1_1: patches (m1, 27) by lane-concatenating 9 flat-shifted views
    # (all offsets are static Python ints -> plain strided slices)
    taps = [xf[dy * wloc + dx: dy * wloc + dx + m1, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(taps, axis=1)    # (m1, 27) bf16
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
    a1 = jnp.where(halo, 0.0, a1).astype(jnp.bfloat16)

    # conv1_2: pack the 3 dy-taps into lanes -> K=192, 3 dx matmuls
    a1cat = jnp.concatenate(
        [a1[dy * wloc: dy * wloc + m2 + 2, :] for dy in range(3)],
        axis=1)                                # (m2+2, 192) bf16
    acc = jnp.dot(a1cat[0:m2, :], w2_ref[0],
                  preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(a1cat[1:m2 + 1, :], w2_ref[1],
                        preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(a1cat[2:m2 + 2, :], w2_ref[2],
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
    B, H, W, _ = x.shape
    nrow = H // BH
    wout = W // 4                   # pooled cols per half
    wloc = W // 2 + 4               # half width + 2-col halo each side

    # pad 2 rows/cols each side (+1 extra row: the flat-shift reads of the
    # final chunk run one row past its 12-row window)
    xp = jnp.pad(x.astype(jnp.bfloat16),
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
    # (dy, dx, ci, co) -> per-dx (dy*64 + ci, co)
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
        out_specs=pl.BlockSpec((1, BH // 2, wout, 64),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, 64),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 64 * (27 + 9 * 64),
            bytes_accessed=xc.size * 2 + B * (H // 2) * (W // 2) * 64 * 4,
            transcendentals=0),
    )(xc, w1m, b1m, w2m, b2m)
    return out.astype(out_dtype)
