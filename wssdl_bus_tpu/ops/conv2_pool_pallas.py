"""Fused VGG stem TAIL (conv1_2 -> relu -> 2x2 maxpool) as a Pallas TPU
kernel — the production sibling of the full fused stem in
``ops/conv1_pallas.py``.

Why a tail-only kernel.  The full fused stem is bit-exact but 2x SLOWER
than XLA's stem because its overlapping row/column chunks are materialised
in XLA with a 3-lane minor dim, and the pipeline DMA physically pads those
3 lanes to 128 (ops/conv1_pallas.py STATUS note, tools/probe_stem_phases.py:
~2.9 ms/img of chunk DMA against ~1.2 ms of in-kernel compute).  conv1_1
itself stays in XLA — at K=3x3x3=27 its cost is pure conv scheduling that
the MXU cannot help much with, and XLA's direct conv (0.80 ms/img) beats
every recomposition tried (tools/probe_stem_xla.py).

PAIR-PACKED design (v3).  The first cut of this tail (non-overlapping
``[R*W, 64]`` row blocks + XLA-assembled halo tensors) measured 0.81x —
tools/PROBES.md (probe_stem_tail) decomposed it: the XLA halo assembly alone cost
0.87 ms/img (more than conv1_1!), and the 64-lane blocks waste half of
every DMA lane-tile and half of the MXU output lanes (N=64 dots).  v3
removes both wastes by packing each ADJACENT PIXEL PAIR into the 128-lane
minor dim:

  * conv1_1 emits bf16 (measured free: 0.807 vs 0.804 ms/img f32 — the
    cast fuses into the conv epilogue; XLA stores this activation bf16
    inside the real trunk anyway, tools/check_bf16_store_tpu.py), and the
    kernel input is the FREE reshape ``[B, H, W, 64] -> [B, H, W/2, 128]``
    — zero XLA-side assembly ops;
  * grid (batch, H // R); the main block is ``(1, R, W/2, 128)`` — full
    128-lane DMA tiles; the 3x3 vertical halo ships as two SINGLE-ROW
    blocks of the same array (BlockSpec ``(1, 1, W/2, 128)`` with clamped
    dynamic index maps — rows i*R-1 and i*R+R), so the input overhead is
    (R+2)/R instead of the 2x of v2's halo tensors or the 3x of shipping
    neighbour chunks whole;
  * both pixel parities of an output pair are computed by ONE dot: for
    each dy-tap, the three pair-shifted views (prev/same/next pair) are
    lane-concatenated into ``(R*W/2, 384)`` and multiplied by a
    block-structured ``(384, 128)`` weight in which input-pixel x output-
    parity blocks that are not conv taps are structural zeros.  M x 384 x
    128 bf16 dots keep all 128 MXU output lanes busy (v2 ran N=64); the
    structural zeros double the tap FLOPs, but at 35.9 GF/img the MXU
    floor is ~0.2 ms/img — this stage is bandwidth-, not FLOP-, limited;
  * SAME padding: the shipped halo rows are zeroed in-kernel for the
    first/last row chunk (clamped index maps would otherwise alias rows
    0 / H-1); horizontally the pair-0 rows of every dp = -1 view and the
    pair-(W/2-1) rows of every dp = +1 view are zeroed (image edge; the
    same mask kills flat-shift row-wrap garbage, which lands exactly on
    those rows);
  * the horizontal 2->1 pool becomes a STATIC LANE SLICE: the conv output
    pair ``(M, 128)`` holds the two pooled-together pixels side by side,
    so hpool = max(y[:, :64], y[:, 64:]); the vertical pool pairs rows by
    reshape+max as before.  Pooled f32 output only — the kernel writes
    1/8 of what conv1_2+pool write as separate XLA ops.

In-kernel idioms proven in ops/conv1_pallas.py and tools/probe_mosaic.py + tools/PROBES.md:
shifted views are direct f32 ref loads at static sublane offsets from a
staged VMEM scratch (sub-32-bit shifted loads are this Mosaic's weak
spot), flowing through ``jnp.concatenate`` into bf16 x bf16 -> f32 dots.

Numerics: identical contract to the full-stem kernel — matmuls are
bf16 x bf16 -> f32, which is exactly how XLA lowers these f32 convs at
default precision, so the tail matches the XLA stem to bf16 rounding
(exact on pow2-friendly inputs; tests assert both).  Bias, relu and pool
are f32.

STATUS (measured on v5e, 2026-08-20, driver bench protocol, 3 runs
each): the v3 tail is faithful at the stem level but LOSES at the
pipeline level — full serving bench 253.5/253.3/253.6 img/s @ b32 with
the tail ON vs 278.9/278.5 with it OFF (the r03 driver regression,
BENCH_r03.json 253.6 vs BENCH_r02.json 278.5, was exactly this kernel
being switched on by default unmeasured).  Per-image (b1): 147.4-149.6 on (off: see
README perf table).  The kernel is kept as a measured-negative record
and is gated OPT-IN (``WSSDL_STEM_TAIL=1``); ``conv2_pool_ok`` returns
False otherwise.  See tools/PROBES.md for the design history and
tools/profile_vgg_blocks.py for where the stem time actually goes.

RE-EVALUATION TRIGGER: re-run the on/off x b32/b1 bench matrix
(tools/PROBES.md "Stem-dispatch status") when a Mosaic upgrade lowers
sub-32-bit shifted ref-loads or lane-offset concatenation (PROBES.md
"Mosaic lowering support matrix") — those would let the halo staging move
in-kernel and remove the 0.87 ms/img XLA-side halo-tensor assembly this
design pays for.  Until then the kernel is a measured-negative record.

Wired into ``models/detector.py:FasterRCNN.apply_trunk`` (inference AND
the training forward — VGG conv1/conv2 are frozen, reference
``VGGnet_train_bus.py:45-49`` ``trainable=False``, here the optimizer
mask — so the ``stop_gradient`` around the kernel changes nothing).

Reference semantics: ``/root/reference/code/lib/networks/
VGGnet_train_bus.py:45-49`` (conv1_2 + pool1 of the VGG16 stem).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8            # conv1_2 output rows per grid step (even: pool pairs rows)
_PAD = 8         # scratch front/back guard sublanes: the (dy=-1, dp=-1)
#                  view starts one pair-row before the staged window (its
#                  only consumer rows are edge-masked, but the LOAD must be
#                  in bounds), and 8 keeps every store tile-aligned

__all__ = ["vgg_conv2_pool", "vgg_conv2_pool_reference", "vgg_conv1_1",
           "conv2_pool_ok", "conv2_pool_shape_ok", "pack_conv2_weights"]


def vgg_conv1_1(x, w1, b1, out_dtype=jnp.float32):
    """conv1_1 + relu as plain XLA ops — the exact graph ConvBlock builds
    (f32 accumulate, SAME, biased).  Kept in XLA on purpose: at K=3x3x3=27
    the direct conv beats every recomposition tried (module docstring).
    ``out_dtype=bfloat16`` fuses the storage cast into the conv epilogue
    (measured free — tools/PROBES.md, probe_stem_tail: conv11_bf16 == conv11_f32)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return jnp.maximum(y + b1, 0.0).astype(out_dtype)


def vgg_conv2_pool_reference(a1, w2, b2):
    """conv1_2 + relu + pool as plain XLA ops (what ConvBlock + max_pool
    build): conv(64->64, SAME) + bias + relu, 2x2/2 VALID maxpool.
    Float32 out."""
    dn = jax.lax.conv_dimension_numbers(
        a1.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        a1.astype(jnp.float32), w2, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b2, 0.0)
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def conv2_pool_shape_ok(shape) -> bool:
    """Pure shape eligibility for the tail kernel on an [B, H, W, C] input:
    R-row chunking divides evenly and the pair-packed rows stay sublane-
    tile aligned (W/2 % 8 == 0).  (C is the input's own channel count; the
    kernel itself is built for C = 64.)  Backend/opt-out gating lives in
    ``conv2_pool_ok``."""
    if len(shape) != 4:
        return False
    h, w = shape[1], shape[2]
    return h % R == 0 and h >= 2 * R and w % 16 == 0 and w >= 32


def conv2_pool_ok(shape) -> bool:
    """Eligibility for an [B, H, W, *] image/feature shape: TPU backend,
    chunking divides evenly, and opted IN via ``WSSDL_STEM_TAIL=1``
    (measured SLOWER than the XLA stem at the pipeline level — see the
    STATUS note in the module docstring)."""
    if os.environ.get("WSSDL_STEM_TAIL", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    return conv2_pool_shape_ok(shape)


def pack_conv2_weights(w2):
    """[3, 3, 64, 64] conv1_2 kernel -> (3, 384, 128) pair-packed blocks.

    For dy-tap d, the (384, 128) matrix maps the lane-concatenation of the
    three pair-shifted input views [dp=-1 | dp=0 | dp=+1] (each 128 lanes:
    even-pixel channels 0:64, odd-pixel channels 64:128) to the output
    pair (even-out 0:64, odd-out 64:128).  Only the conv taps are nonzero:

      even output x:  x-1 = odd of PREV pair, x = even of SAME,
                      x+1 = odd of SAME;
      odd  output x:  x-1 = even of SAME, x = odd of SAME,
                      x+1 = even of NEXT pair.

    Built with numpy at trace time (w2 is a jax array: falls back to jnp
    functional updates under tracing — but in the product path the packing
    runs inside jit on a constant-shaped param, so XLA constant-folds or
    fuses it either way)."""
    blocks = []
    for d in range(3):
        dpm = jnp.zeros((128, 128), w2.dtype)   # dp = -1
        dpm = dpm.at[64:, :64].set(w2[d, 0])    # odd(prev) -> even, kx=-1
        dp0 = jnp.zeros((128, 128), w2.dtype)   # dp = 0
        dp0 = dp0.at[:64, :64].set(w2[d, 1])    # even -> even, kx=0
        dp0 = dp0.at[64:, :64].set(w2[d, 2])    # odd  -> even, kx=+1
        dp0 = dp0.at[:64, 64:].set(w2[d, 0])    # even -> odd,  kx=-1
        dp0 = dp0.at[64:, 64:].set(w2[d, 1])    # odd  -> odd,  kx=0
        dpp = jnp.zeros((128, 128), w2.dtype)   # dp = +1
        dpp = dpp.at[:64, 64:].set(w2[d, 2])    # even(next) -> odd, kx=+1
        blocks.append(jnp.concatenate([dpm, dp0, dpp], axis=0))
    return jnp.stack(blocks).astype(jnp.bfloat16)


def _tail_kernel(th_ref, main_ref, bh_ref, w2_ref, b2_ref, out_ref, a_ref,
                 *, wp: int, nch: int):
    """One (batch, row-chunk) grid step, pair-packed lanes.

    th_ref:   (1, 1, wp, 128) bf16 — image row i*R - 1 (clamped; zeroed
              here for the first chunk): vertical SAME padding.
    main_ref: (1, R, wp, 128) bf16 — the chunk's R image rows.
    bh_ref:   (1, 1, wp, 128) bf16 — image row i*R + R (clamped; zeroed
              for the last chunk).
    w2_ref:   (3, 384, 128) bf16 — ``pack_conv2_weights`` output.
    b2_ref:   (1, 128) f32 — conv1_2 bias tiled [b2 | b2].
    out_ref:  (1, R//2, wp, 64) f32 — pooled output tile.
    a_ref:    (_PAD + (R+2)*wp + _PAD, 128) f32 VMEM scratch — the staged
              window, so every shifted view is a direct f32 ref load at a
              static offset (sub-32-bit shifted loads are this Mosaic's
              weak spot, see ops/conv1_pallas.py).
    """
    i = pl.program_id(1)
    m = R * wp                       # output pair-rows per chunk

    # stage the window f32; all store offsets are multiples of wp (tile-
    # aligned: wp % 8 == 0) shifted by the 8-sublane front guard
    @pl.when(i > 0)
    def _():
        a_ref[pl.ds(_PAD, wp), :] = th_ref[0, 0].astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        a_ref[pl.ds(_PAD, wp), :] = jnp.zeros((wp, 128), jnp.float32)

    a_ref[pl.ds(_PAD + wp, m), :] = \
        main_ref[0].reshape(m, 128).astype(jnp.float32)

    @pl.when(i < nch - 1)
    def _():
        a_ref[pl.ds(_PAD + wp + m, wp), :] = bh_ref[0, 0].astype(jnp.float32)

    @pl.when(i == nch - 1)
    def _():
        a_ref[pl.ds(_PAD + wp + m, wp), :] = jnp.zeros((wp, 128),
                                                       jnp.float32)

    # pair position within each image row: pair 0 masks the dp = -1 views
    # (x = -1 taps + row-wrap), pair wp-1 masks the dp = +1 views
    ppos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wp
    first, last = ppos == 0, ppos == wp - 1

    acc = jnp.zeros((m, 128), jnp.float32)
    for dy in range(3):
        base = _PAD + dy * wp
        views = [a_ref[pl.ds(base - 1, m), :],
                 a_ref[pl.ds(base, m), :],
                 a_ref[pl.ds(base + 1, m), :]]
        lhs = jnp.concatenate(
            [jnp.where(first, 0.0, views[0]), views[1],
             jnp.where(last, 0.0, views[2])], axis=1).astype(jnp.bfloat16)
        acc = acc + jnp.dot(lhs, w2_ref[dy],
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b2_ref[0, :], 0.0)          # (m, 128) f32

    # 2x2/2 pool: horizontal = the pair's two pixels sit in lanes
    # [0:64] / [64:128]; vertical = adjacent image rows, wp pair-rows apart
    hp = jnp.maximum(y[:, :64], y[:, 64:])            # (m, 64)
    vp = jnp.max(hp.reshape(R // 2, 2, wp, 64), axis=1)
    out_ref[0] = vp


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def vgg_conv2_pool(a1, w2, b2, out_dtype=jnp.float32, interpret=False):
    """Fused tail: a1 [B, H, W, 64] f32/bf16 -> [B, H//2, W//2, 64].

    Requires ``conv2_pool_shape_ok(a1.shape)`` (or ``interpret=True`` for
    CPU correctness tests).  w2 [3,3,64,64], b2 [64] are the conv1_2
    ConvBlock params.  Feed a bf16 ``a1`` (``vgg_conv1_1(..., out_dtype=
    bfloat16)``) to make the packed view a FREE reshape; an f32 input
    costs one XLA cast."""
    if not conv2_pool_shape_ok(a1.shape):
        raise ValueError(
            f"vgg_conv2_pool: input shape {tuple(a1.shape)} fails the "
            f"chunking preconditions (need [B, H, W, 64] with H % {R} == 0,"
            f" H >= {2 * R}, W % 16 == 0, W >= 32) — gate call sites on "
            "conv2_pool_ok()")
    B, H, W, C = a1.shape
    assert C == 64, "conv1_2 consumes the 64-channel conv1_1 output"
    nch = H // R
    wp = W // 2

    # pair-packed view: free when a1 is already bf16 (conv1_1 epilogue)
    ap = a1.astype(jnp.bfloat16).reshape(B, H, wp, 128)
    w2m = pack_conv2_weights(w2.astype(jnp.float32))
    b2m = jnp.tile(b2.reshape(1, 64).astype(jnp.float32), (1, 2))

    kernel = functools.partial(_tail_kernel, wp=wp, nch=nch)
    grid = (B, nch)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # row i*R - 1 (clamped; the kernel zeroes it for i == 0)
            pl.BlockSpec((1, 1, wp, 128),
                         lambda b, i: (b, jnp.maximum(i * R - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, wp, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # row i*R + R (clamped; zeroed for i == nch - 1)
            pl.BlockSpec((1, 1, wp, 128),
                         lambda b, i: (b, jnp.minimum(i * R + R, H - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2 * _PAD + (R + 2) * wp, 128),
                                   jnp.float32)],
        out_specs=pl.BlockSpec((1, R // 2, wp, 64),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, wp, 64), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # structural-zero blocks double the tap FLOPs (docstring)
            flops=2 * 2 * B * H * W * 64 * 9 * 64,
            bytes_accessed=B * nch * (R + 2) * wp * 128 * 2
                           + B * (H // 2) * wp * 64 * 4,
            transcendentals=0),
    )(ap, ap, ap, w2m, b2m)
    return out.astype(out_dtype)
