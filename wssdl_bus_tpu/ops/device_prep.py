"""On-device image preparation: the transfer-side fix for the host-bound
training feed.

The r04 review's top finding: the axon-relay host->device link sustains
~45 MB/s, and the classic feed ships ~22 MB per combined train step (the
f32, 3-channel, resized static canvas) — ~490 ms of pure transfer per
43 ms device step.  The raw SNUBH images are uint8, single-channel and
SMALLER than the resized canvas (they upscale to the 600-px pipeline
scale), so shipping the raw bytes and finishing preparation on device
cuts the payload ~17x (22 MB -> ~1.3 MB for a 1+2 joint batch).

Split of ``prep_im_for_blob`` (reference blob.py:34-79; host half in
``data/augment.py``):

  host   decode, flip, ws rotation + cropping (geometry on the original
         image), ALL random draws (reference draw order preserved), the
         post-brightness contrast mean, the resize scale arithmetic
  device (this module, traced into the train step) brightness, contrast,
         mean subtraction, bilinear resize to the training canvas,
         zero-masking beyond each image's resized extent, VGG x255 /
         ResNet /(std/255) scaling, gray -> 3-channel broadcast

Numerics vs the host path (oracle-tested in tests/test_device_prep.py):

  * unrotated images: the uint8 staging is EXACT (the decode IS uint8;
    ``augment.prep_image`` divides by 255 and this module does the same),
    and ``jax.image.scale_and_translate(..., translation=0,
    antialias=True)`` matches the native/PIL half-pixel resize to ~4e-6
    (measured, upscale) — so supervised images match the host blob to
    float rounding;
  * ws-rotated/cropped images: rotation output is re-quantized to uint8
    (error <= 1/510 in [0,1] units, i.e. half of the source's own
    quantization step) before the photometric ops; downscale antialiasing
    taps edge-replicated padding where the host clamps (measured <= ~4e-2
    on noise) — both bounded and irrelevant to the augmentation's purpose,
    and the SNUBH pipeline always upscales (scales 1.03-2.06 over the
    bundled images).

The TEST/eval pipeline keeps the host path end-to-end: numeric parity
with the reference is measured there (batch 1, no augmentation), and this
module is a TRAIN-feed optimization only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import image as jimage

# prep-parameter row layout ([B, 8] float32), built by
# data/minibatch.py:_device_prep_entry
IH, IW, OH, OW, DELTA, FACTOR, CMEAN, _PAD = range(8)
N_PREP = 8


def prep_device_image(raw, prep, out_hw, pixel_mean, net_divisor):
    """One image: raw [Hr, Wr] uint8 -> prepared [H, W] float32.

    ``pixel_mean`` is cfg.PIXEL_MEAN / 255; ``net_divisor`` is the final
    multiplicative factor (255.0 for VGG, 255 / cfg.PIXEL_STD for ResNet
    — augment.py:113-116 expressed as one multiply)."""
    h, w = out_hw
    x = raw.astype(jnp.float32) * (1.0 / 255.0)
    # brightness: x + delta, clipped (augment.py:74-77); delta == 0 when
    # the op is disabled, and clip(x + 0) == x for x in [0, 1]
    x = jnp.clip(x + prep[DELTA], 0.0, 1.0)
    # contrast about the POST-brightness mean (augment.py:78-82);
    # factor == 1 when disabled: clip((x - m) + m) == x
    x = jnp.clip((x - prep[CMEAN]) * prep[FACTOR] + prep[CMEAN], 0.0, 1.0)
    x = x - pixel_mean
    # bilinear resize of the top-left (ih, iw) region to (oh, ow): with
    # translation 0 the half-pixel sampling never depends on the canvas
    # extent, only on the scale -- the padded region (edge-replicated by
    # the host pack) supplies the clamp taps
    scale = jnp.stack([prep[OH] / prep[IH], prep[OW] / prep[IW]])
    x = jimage.scale_and_translate(
        x, (h, w), (0, 1), scale, jnp.zeros((2,), jnp.float32),
        method="linear", antialias=True)
    # zero beyond the resized extent, like the host _pack zero canvas
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = jnp.where((rows < prep[OH]) & (cols < prep[OW]),
                  x * net_divisor, 0.0)
    return x


def prep_device_batch(raw, prep, out_hw, pixel_mean, net_divisor):
    """[B, Hr, Wr] uint8 + [B, 8] f32 -> [B, H, W, 3] float32, the exact
    layout of the classic ``data`` blob (gray replicated to 3 channels,
    minibatch.py:_pack)."""
    x = jax.vmap(
        lambda r, p: prep_device_image(r, p, out_hw, pixel_mean,
                                       net_divisor))(raw, prep)
    return jnp.broadcast_to(x[..., None], (*x.shape, 3))


def net_divisor_for(net_name: str, pixel_std: float) -> float:
    """The final scale factor of ``augment.prep_image`` (VGG x255,
    ResNet /(PIXEL_STD/255)) as one multiplier."""
    if net_name[:6] == "Resnet":
        return 255.0 / pixel_std
    return 255.0
