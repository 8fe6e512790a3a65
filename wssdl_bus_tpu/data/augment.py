"""Host-side image preparation and augmentation.

Re-implements ``prep_im_for_blob`` (``/root/reference/code/lib/utils/blob.py:
34-79``) on single-channel float arrays (the BUS TIFFs are grayscale and every
op below is channel-uniform, so we process one channel and replicate at pack
time — numerically identical to the reference's 3-channel path):

  * weak-image-only: rotation within +/-ROTATION_MAX_ANGLE degrees (bilinear,
    background filled with the pixel mean) and random margin cropping up to
    CROPPING_MAX_MARGIN per side (blob.py:39-48);
  * all-training: brightness shift +/-0.2 and contrast scaling in [0.2, 1.8]
    about the image mean, both clipped to [0, 1] (blob.py:50-58);
  * mean subtraction, shortest-side-600 / longest-side-1000 resize;
  * output scaling: x255 for VGG, /(std/255) for ResNet (blob.py:74-77).

The reference uses stateful numpy RNG; we thread a ``np.random.RandomState``
for reproducibility under ``cfg.RNG_SEED`` (train.py:63-65).
"""

from __future__ import annotations

import numpy as np
from PIL import Image
from scipy import ndimage

from wssdl_bus_tpu.config import Config


def resize_bilinear(im: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize of a single-channel float image (native C++ kernel
    when built, PIL otherwise — same half-pixel-center convention)."""
    from wssdl_bus_tpu import native
    out = native.resize_bilinear(im, out_h, out_w)
    if out is not None:
        return out
    pil = Image.fromarray(im.astype(np.float32), mode="F")
    return np.asarray(pil.resize((out_w, out_h), Image.BILINEAR))


def compute_scale(h: int, w: int, target_size: int, max_size: int) -> float:
    """shortest-side target with a longest-side cap (blob.py:63-68)."""
    im_scale = float(target_size) / min(h, w)
    if np.round(im_scale * max(h, w)) > max_size:
        im_scale = float(max_size) / max(h, w)
    return im_scale


def sample_prep(im: np.ndarray, net_name: str, cfg: Config,
                is_training: bool, is_ws: bool, rng: np.random.RandomState):
    """Phase A of ``prep_image``: the host-side geometric transforms (ws
    rotation + cropping) plus ALL the random draws, in the reference's
    exact draw sequence (blob.py:39-58 + minibatch_bus.py:24-25), so the
    host and device-prep paths consume an identical RNG stream.

    -> (im_a [h, w] float32 in [0, 1], params dict) where params carries
    everything phase B needs: brightness ``delta`` (0.0 when disabled),
    contrast ``factor`` (1.0) and ``cmean`` (the POST-brightness image
    mean the reference contrast op pivots on), the resized extent
    ``(oh, ow)`` and ``im_scale``."""
    t = cfg.TRAIN
    im = im.astype(np.float32) / 255.0

    if is_ws and is_training:
        if t.USE_ROTATION:
            angle = rng.uniform(-t.ROTATION_MAX_ANGLE, t.ROTATION_MAX_ANGLE)
            from wssdl_bus_tpu import native
            rotated = native.rotate_bilinear(im, angle, cfg.PIXEL_MEAN / 255.0)
            if rotated is not None:
                im = rotated
            else:
                im = ndimage.rotate(im, angle, reshape=False, order=1,
                                    mode="constant", cval=cfg.PIXEL_MEAN / 255.0)
        if t.USE_CROPPING:
            mh = t.CROPPING_MAX_MARGIN * im.shape[0]
            mw = t.CROPPING_MAX_MARGIN * im.shape[1]
            u = rng.randint(0, int(mh) + 1)
            d = rng.randint(1, max(int(mh), 1) + 1)
            l = rng.randint(0, int(mw) + 1)
            r = rng.randint(1, max(int(mw), 1) + 1)
            im = im[u:-d, l:-r]

    delta, factor, cmean = 0.0, 1.0, 0.0
    if is_training:
        if t.USE_BRIGHTNESS_ADJUSTMENT:
            delta = rng.uniform(-t.BRIGHTNESS_ADJUSTMENT_MAX_DELTA,
                                t.BRIGHTNESS_ADJUSTMENT_MAX_DELTA)
        if t.USE_CONTRAST_ADJUSTMENT:
            # the reference computes the pivot mean AFTER brightness
            # (augmented image order blob.py:50-58); the factor draw
            # follows the mean computation in program order but consumes
            # the stream identically either way
            cmean = (np.clip(im + delta, 0.0, 1.0).mean() if delta != 0.0
                     else im.mean())
            factor = rng.uniform(t.CONTRAST_ADJUSTMENT_LOWER_FACTOR,
                                 t.CONTRAST_ADJUSTMENT_UPPER_FACTOR)

    if is_training:
        # reference training picks one random scale per image
        # (minibatch_bus.py:24-25 scale_inds = npr.randint(len(SCALES)))
        scales, max_size = t.SCALES, t.MAX_SIZE
        target = scales[rng.randint(len(scales))] if len(scales) > 1 \
            else scales[0]
    else:
        # The reference's RPN inference path asserts single-scale
        # (test_bus.py:209 ``assert len(im_scales) == 1``): the multi-blob
        # image pyramid built by _get_image_blob (:48-76) is consumable only
        # by the dead HAS_RPN=False external-proposal path (:79-104).  Fail
        # loudly instead of silently sampling one scale (see COMPONENT_MAP
        # deadpool notes).
        scales, max_size = cfg.TEST.SCALES, cfg.TEST.MAX_SIZE
        if len(scales) != 1:
            raise NotImplementedError(
                f"TEST.SCALES={list(scales)}: multi-scale test-time image "
                "pyramids are not supported with RPN proposals — the "
                "reference itself asserts len(im_scales) == 1 on this path "
                "(test_bus.py:209); set a single TEST scale")
        target = scales[0]
    h, w = im.shape
    im_scale = compute_scale(h, w, target, max_size)
    out_h = int(np.round(h * im_scale))
    out_w = int(np.round(w * im_scale))
    return im, {"delta": delta, "factor": factor, "cmean": cmean,
                "im_scale": im_scale, "oh": out_h, "ow": out_w}


def prep_image(im: np.ndarray, net_name: str, cfg: Config, is_training: bool,
               is_ws: bool, rng: np.random.RandomState):
    """-> (prepared [H', W'] float32, im_scale).  Phase A draws +
    transforms via :func:`sample_prep`, then the photometric / mean-sub /
    resize / net-scale tail applied HOST-side (the classic path; the
    device-prep path applies the identical tail on device,
    ops/device_prep.py)."""
    im, p = sample_prep(im, net_name, cfg, is_training, is_ws, rng)
    if p["delta"] != 0.0:
        im = np.clip(im + p["delta"], 0.0, 1.0)
    if p["factor"] != 1.0:
        im = np.clip((im - p["cmean"]) * p["factor"] + p["cmean"], 0.0, 1.0)

    im = im - cfg.PIXEL_MEAN / 255.0
    im = resize_bilinear(im, p["oh"], p["ow"])

    if net_name[:6] == "Resnet":
        im = im / (cfg.PIXEL_STD / 255.0)
    else:  # VGGnet
        im = im * 255.0
    return im.astype(np.float32), p["im_scale"]


def max_canvas(image_sizes, target_size: int, max_size: int,
               multiple: int = 16, margin: int = 4,
               crop_margin: float = 0.0):
    """Static canvas (H, W) covering every resized image in the dataset,
    rounded up to a multiple of the feature stride.

    ``crop_margin``: TRAIN.CROPPING_MAX_MARGIN when ws-cropping is active.
    Cropping can REMOVE up to 2*crop_margin of either axis independently;
    shrinking only the shortest side inflates the resize scale by up to
    1/(1-2*crop_margin) (~11% at the default 0.05), which a small fixed
    margin cannot cover — so the worst case is enumerated exactly over the
    four crop-extreme corners per image (output dims are monotone in each
    cropped extent, so the corners bound the interior)."""
    best_h = best_w = 0
    shrink = max(0.0, 1.0 - 2.0 * crop_margin)
    for (h, w) in image_sizes:
        for fh in (1.0, shrink):
            for fw in (1.0, shrink):
                ch, cw = h * fh, w * fw
                s = compute_scale(ch, cw, target_size, max_size)
                best_h = max(best_h, int(np.round(ch * s)))
                best_w = max(best_w, int(np.round(cw * s)))
    rh = -(-(best_h + margin) // multiple) * multiple
    rw = -(-(best_w + margin) // multiple) * multiple
    return rh, rw
