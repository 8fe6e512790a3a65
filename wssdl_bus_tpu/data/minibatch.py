"""Fixed-shape minibatch blob assembly.

Re-implements ``get_minibatch`` / ``get_minibatch_joint``
(``/root/reference/code/lib/roi_data_layer/minibatch_bus.py:15-139``) with one
TPU-critical change: images are packed into a STATIC canvas (computed once
from the dataset, see ``augment.max_canvas``) instead of the per-batch max
(blob.py:19-32), so every training step compiles exactly once.

Blob layout per batch (supervised images first, then weak ones — the joint
order from minibatch_bus.py:117-126):
  data        [B, Hc, Wc, 3] float32 zero-padded
  gt_boxes    [B, MAX_GT_PER_IMAGE, 5] scaled by im_scale, (x1,y1,x2,y2,cls)
  num_gt      [B] int32 (0 for weak images)
  im_info     [B, 4] = (resized_h, resized_w, im_scale, birads_diag)

im_info[:2] deviation: the reference stores the batch-padded blob size
(minibatch_bus.py:46); we store each image's true resized extent so anchors
and proposal clipping never spill into the zero padding.  At test time
(batch 1, no padding) the two definitions coincide, which is where numeric
parity is measured.
"""

from __future__ import annotations

from typing import List

import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.data.augment import prep_image


def _load_gray(entry) -> np.ndarray:
    from PIL import Image
    im = np.asarray(Image.open(entry["image"]))
    if entry.get("flipped"):
        im = im[:, ::-1]
    return im


def _pack(images: List[np.ndarray], canvas_hw) -> np.ndarray:
    h, w = canvas_hw
    blob = np.zeros((len(images), h, w, 3), np.float32)
    for i, im in enumerate(images):
        ih, iw = im.shape
        if ih > h or iw > w:
            # Last-resort guard: max_canvas enumerates the ws-crop worst
            # case, so overflow means the canvas came from a different
            # dataset/config than this image.  Truncate loudly rather than
            # crash mid-training.
            import warnings
            warnings.warn(
                f"image {im.shape} exceeds static canvas {canvas_hw}; "
                "truncating — recompute the canvas for this dataset/config")
            im = im[:h, :w]
            ih, iw = im.shape
        blob[i, :ih, :iw, :] = im[:, :, None]  # gray -> 3 channels
    return blob


def get_minibatch(roidb, net_name: str, cfg: Config, canvas_hw,
                  is_training: bool, is_ws: bool,
                  rng: np.random.RandomState):
    """Single-regime minibatch (supervised OR weak), minibatch_bus.py:15-94."""
    n = len(roidb)
    images, scales = [], []
    for entry in roidb:
        im, s = prep_image(_load_gray(entry), net_name, cfg, is_training,
                           is_ws, rng)
        images.append(im)
        scales.append(s)

    g = cfg.TRAIN.MAX_GT_PER_IMAGE
    gt_boxes = np.zeros((n, g, 5), np.float32)
    num_gt = np.zeros((n,), np.int32)
    im_info = np.zeros((n, 4), np.float32)
    for i, entry in enumerate(roidb):
        if not is_ws:
            k = len(entry["gt_classes"])
            gt_boxes[i, :k, :4] = entry["boxes"] * scales[i]
            gt_boxes[i, :k, 4] = entry["gt_classes"]
            num_gt[i] = k
        im_info[i] = [images[i].shape[0], images[i].shape[1], scales[i],
                      entry["birads_diag"]]

    return {"data": _pack(images, canvas_hw), "gt_boxes": gt_boxes,
            "num_gt_boxes": num_gt, "im_info": im_info}


def get_minibatch_joint(roidb_s, roidb_ws, net_name: str, cfg: Config,
                        canvas_hw, rng: np.random.RandomState,
                        is_training: bool = True):
    """Joint minibatch: supervised images (full aug minus ws-only ops), then
    weak images (with rotation/cropping), minibatch_bus.py:96-139.
    ``is_training=False`` disables all random augmentation (the reference
    threads the flag through to prep_im_for_blob, minibatch_bus.py:96)."""
    n_s, n_ws = len(roidb_s), len(roidb_ws)
    n = n_s + n_ws
    images, scales = [], []
    for entry in roidb_s:
        im, s = prep_image(_load_gray(entry), net_name, cfg, is_training,
                           False, rng)
        images.append(im)
        scales.append(s)
    for entry in roidb_ws:
        im, s = prep_image(_load_gray(entry), net_name, cfg, is_training,
                           is_training, rng)
        images.append(im)
        scales.append(s)

    g = cfg.TRAIN.MAX_GT_PER_IMAGE
    gt_boxes = np.zeros((n, g, 5), np.float32)
    num_gt = np.zeros((n,), np.int32)
    im_info = np.zeros((n, 4), np.float32)
    for i, entry in enumerate(roidb_s):
        k = len(entry["gt_classes"])
        gt_boxes[i, :k, :4] = entry["boxes"] * scales[i]
        gt_boxes[i, :k, 4] = entry["gt_classes"]
        num_gt[i] = k
        im_info[i] = [images[i].shape[0], images[i].shape[1], scales[i],
                      entry["birads_diag"]]
    for j, entry in enumerate(roidb_ws):
        i = n_s + j
        im_info[i] = [images[i].shape[0], images[i].shape[1], scales[i],
                      entry["birads_diag"]]

    return {"data": _pack(images, canvas_hw), "gt_boxes": gt_boxes,
            "num_gt_boxes": num_gt, "im_info": im_info}
