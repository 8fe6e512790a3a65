"""Inference pipeline: ``im_detect`` + ``test_net``.

Re-implements the reference's ``test_bus.py`` (``/root/reference/code/lib/
fast_rcnn/test_bus.py:28-430``):

  * ``_get_image_blob`` (:48-76): resize shortest side to TEST.SCALES[0]=600
    capped at 1000, mean-subtract, VGG x255 / ResNet /std scaling — all shared
    with the training path via ``data.augment.prep_image``;
  * ``im_detect`` (:146-240): one device forward, then box decode
    (``bbox_transform_inv``) + clip on the host, coordinates divided by
    im_scale back to original pixels;
  * ``test_net`` (:300-413): per-class score threshold 0.05, per-class NMS
    0.3 (optionally class-agnostic), cap of ``max_per_image=300`` detections
    per image, ``detections.pkl`` dump, then ``imdb.evaluate_detections``.

TPU-specific notes: images are packed into a static canvas so the jitted
forward compiles once per dataset (padding is zeros == pixel mean after mean
subtraction); proposals are produced as a fixed top-N with a validity mask,
filtered on the host before NMS.  Per-class NMS over <=300 final boxes is
host-side numpy, same as the reference's Cython path.
"""

from __future__ import annotations

import contextlib
import os
import pickle

import numpy as np

from wssdl_bus_tpu.data.augment import prep_image
from wssdl_bus_tpu.utils.timer import Timer


def _greedy_nms(dets: np.ndarray, thresh: float, containment: bool) -> list:
    """Shared greedy sweep.  Suppresses at IoU >= thresh (the reference
    Cython convention, ``nms/cpu_nms.pyx:65``); with ``containment`` also
    drops a box when either box covers >95% of the other
    (``utils/nms.pyx:118-120``)."""
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = dets[:, 4].argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = (np.maximum(0.0, xx2 - xx1 + 1)
                 * np.maximum(0.0, yy2 - yy1 + 1))
        ovr = inter / (areas[i] + areas[rest] - inter)
        drop = ovr >= thresh
        if containment:
            drop |= (inter / areas[i] > 0.95) | (inter / areas[rest] > 0.95)
        order = rest[~drop]
    return keep


def nms_numpy(dets: np.ndarray, thresh: float) -> list:
    """Greedy IoU NMS, identical to the reference Cython kernel
    (``nms/cpu_nms.pyx:17-68``, +1 pixel area convention).  Dispatches to the
    native C++ kernel (native/wssdl_native.cc) when built, like the
    reference's nms_wrapper.py dispatch."""
    if len(dets) == 0:
        return []
    order0 = dets[:, 4].argsort()[::-1]
    from wssdl_bus_tpu import native
    kept = native.nms(dets[order0], thresh)
    if kept is not None:
        return [int(order0[i]) for i in kept]
    return _greedy_nms(dets, thresh, containment=False)


def nms_new_numpy(dets: np.ndarray, thresh: float) -> list:
    """Greedy NMS with extra containment suppression: besides IoU >= thresh,
    a lower-scoring box is also dropped when either box covers >95% of the
    other (inter/area_kept > 0.95 or inter/area_other > 0.95) — the
    reference's ``nms_new`` (``utils/nms.pyx:71-123``; exported but unused on
    live paths, kept for API parity)."""
    if len(dets) == 0:
        return []
    return _greedy_nms(dets, thresh, containment=True)


def get_image_blob(im: np.ndarray, net_name: str, cfg, canvas_hw):
    """Single test image -> (padded [1,Hc,Wc,3] blob, im_scale, (h', w'))."""
    rng = np.random.RandomState(0)  # unused: single test scale
    prepared, im_scale = prep_image(im, net_name, cfg, is_training=False,
                                    is_ws=False, rng=rng)
    h, w = prepared.shape
    if h > canvas_hw[0] or w > canvas_hw[1]:
        # an out-of-dataset image larger than the compiled canvas: truncate
        # with a warning instead of crashing the serving loop
        import warnings
        warnings.warn(f"image resized to {(h, w)} exceeds canvas "
                      f"{canvas_hw}; truncating")
        prepared = prepared[:canvas_hw[0], :canvas_hw[1]]
        h, w = prepared.shape
    blob = np.zeros((1, canvas_hw[0], canvas_hw[1], 3), np.float32)
    blob[0, :h, :w, :] = prepared[:, :, None]
    return blob, im_scale, (h, w)


def unnormalize_bbox_pred(bbox_pred: np.ndarray, cfg) -> np.ndarray:
    """Un-whiten regression outputs when targets were trained normalized
    (TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED).  The reference instead bakes
    the stds/means into the saved bbox_pred weights at snapshot time
    (train_bus.py:133-173); doing it at decode keeps checkpoints
    untouched and is numerically identical."""
    if not cfg.TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED:
        return bbox_pred
    n_cls = bbox_pred.shape[1] // 4
    stds = np.tile(np.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, np.float32),
                   n_cls)
    means = np.tile(np.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS, np.float32),
                    n_cls)
    return bbox_pred * stds + means


def _decode_one(eng, im_shape, im_scale, rois, valid, cls_prob, bbox_pred):
    """Device outputs of ONE image -> (scores, pred_boxes) in original
    coords (test_bus.py:214-223)."""
    from wssdl_bus_tpu.ops.boxes import bbox_transform_inv, clip_boxes

    valid = np.asarray(valid).astype(bool)
    cls_prob = np.asarray(cls_prob)[valid]
    bbox_pred = np.asarray(bbox_pred)[valid]
    boxes = np.asarray(rois)[valid, 1:5] / im_scale
    if eng.cfg.TEST.BBOX_REG:
        bbox_pred = unnormalize_bbox_pred(bbox_pred, eng.cfg)
        pred = np.asarray(bbox_transform_inv(boxes, bbox_pred))
        pred = np.asarray(clip_boxes(pred.reshape(-1, 4),
                                     im_shape[0], im_shape[1]))
        # explicit column count: reshape(n, -1) raises when every proposal
        # slot is masked invalid (n == 0)
        pred_boxes = pred.reshape(len(boxes), bbox_pred.shape[1])
    else:
        pred_boxes = np.tile(boxes, (1, cls_prob.shape[1]))
    return cls_prob, pred_boxes


def im_detect(eng, variables, im: np.ndarray, net_name: str,
              canvas_hw) -> tuple:
    """-> (scores [N, C], pred_boxes [N, 4C]) in ORIGINAL image coords
    (test_bus.py:146-240)."""
    cfg = eng.cfg
    blob, im_scale, (h, w) = get_image_blob(im, net_name, cfg, canvas_hw)
    im_info = np.array([[h, w, im_scale, 0.0]], np.float32)
    rois, valid, cls_score, cls_prob, bbox_pred = eng.inference_step(
        variables, blob, im_info)
    return _decode_one(eng, im.shape, im_scale, rois, valid, cls_prob,
                       bbox_pred)


def pack_image_batch(eng, images, net_name, canvas_hw):
    """Prepare a batch of raw images into (blob, infos, scales) for one
    device step — the one canonical packing loop for every serving path."""
    n = len(images)
    blob = np.zeros((n, canvas_hw[0], canvas_hw[1], 3), np.float32)
    infos = np.zeros((n, 4), np.float32)
    scales = []
    for i, im in enumerate(images):
        b, s, (h, w) = get_image_blob(im, net_name, eng.cfg, canvas_hw)
        blob[i] = b[0]
        infos[i] = [h, w, s, 0.0]
        scales.append(s)
    return blob, infos, scales


def _decode_packed(eng, images, scales, outs):
    """Fetch one packed batch's device outputs (BLOCKS on the device) and
    decode per image."""
    n = len(images)
    rois, valid, cls_score, cls_prob, bbox_pred = outs
    p = eng.cfg.TEST.RPN_POST_NMS_TOP_N
    rois = np.asarray(rois).reshape(n, p, 5)
    valid = np.asarray(valid).reshape(n, p)
    cls_prob = np.asarray(cls_prob).reshape(n, p, -1)
    bbox_pred = np.asarray(bbox_pred).reshape(n, p, -1)
    return [_decode_one(eng, images[i].shape, scales[i], rois[i], valid[i],
                        cls_prob[i], bbox_pred[i]) for i in range(n)]


def _im_detect_packed(eng, variables, images, blob, infos, scales):
    """Device step + per-image decode over an already-packed batch blob."""
    outs = eng.inference_step(variables, blob, infos)
    return _decode_packed(eng, images, scales, outs)


def im_detect_batch(eng, variables, images, net_name: str, canvas_hw):
    """Batched serving path (no reference analog — its im_detect is strictly
    single-image, test_bus.py:146): pack B images into the static canvas, one
    device step, split per image.  -> list of (scores, pred_boxes)."""
    blob, infos, scales = pack_image_batch(eng, images, net_name, canvas_hw)
    return _im_detect_packed(eng, variables, images, blob, infos, scales)


def apply_nms_per_class(scores, boxes, num_classes, thresh, nms_thresh,
                        cls_agnostic=False):
    """-> dets_per_class[list of [n_j, 5]] for classes 1..C-1
    (test_bus.py:359-386).

    Always runs per-class score-threshold + NMS first; with ``cls_agnostic``
    the per-class survivors are then concatenated (class tag appended) and
    suppressed jointly by a second NMS, exactly like the reference — so a
    proposal can still contribute one detection per class when its per-class
    boxes do not overlap (test_bus.py:371-384)."""
    out = [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
    for j in range(1, num_classes):
        inds = np.where(scores[:, j] > thresh)[0]
        cls_boxes = boxes[inds, j * 4:(j + 1) * 4]
        cls_scores = scores[inds, j]
        dets = np.hstack([cls_boxes, cls_scores[:, None]]).astype(np.float32)
        keep = nms_numpy(dets, nms_thresh)
        out[j] = dets[keep]
    if cls_agnostic:
        all_dets = np.zeros((0, 6), np.float32)
        for j in range(1, num_classes):
            tagged = np.hstack([out[j],
                                np.full((len(out[j]), 1), j, np.float32)])
            all_dets = np.concatenate([all_dets, tagged], axis=0)
        keep = nms_numpy(all_dets[:, :5], nms_thresh)
        all_dets = all_dets[keep]
        for j in range(1, num_classes):
            out[j] = all_dets[all_dets[:, 5] == j][:, :5]
    return out


def test_net(eng, variables, imdb, output_dir: str, net_name: str,
             canvas_hw, max_per_image: int = 300, thresh: float = 0.05,
             verbose: bool = True, vis: bool = False, batch_size: int = 1):
    """Detect over an imdb and evaluate (test_bus.py:300-413).

    ``vis`` saves per-image qualitative overlays (test_bus.py:244,333-339).
    ``batch_size`` > 1 runs the batched serving path (im_detect_batch).
    Returns (all_boxes, eval result from imdb.evaluate_detections)."""
    num_images = imdb.num_images
    num_classes = imdb.num_classes
    all_boxes = [[[] for _ in range(num_images)] for _ in range(num_classes)]
    os.makedirs(output_dir, exist_ok=True)
    t_det, t_misc = Timer(), Timer()

    # TEST.DEBUG_TIMELINE analog (reference wraps each im_detect sess.run
    # with FULL_TRACE and dumps Chrome traces, test_bus.py:186-188,233-237):
    # trace the first post-compile detection into <output_dir>/jax_trace.
    from wssdl_bus_tpu.utils import TraceContext
    trace = TraceContext(output_dir, enabled=eng.cfg.TEST.DEBUG_TIMELINE)

    from wssdl_bus_tpu.data.loader import prefetch_iter

    def detections():
        """Yield (i, image, scores, boxes) lazily.  Host-side work (file
        read, decode, resize, canvas packing) runs on a prefetch thread so
        it overlaps the device step.  Peak host memory in the batched path
        is ~4 in-flight batches (prefetch queue depth 2 + the dispatched
        batch + the one being post-processed), each holding its raw images
        and packed canvas blob."""
        if batch_size > 1:
            # trace the second batch if one exists (post-compile), else the
            # only batch
            trace_start = batch_size if num_images > batch_size else 0

            def host_batches():
                for start in range(0, num_images, batch_size):
                    idxs = list(range(start,
                                      min(start + batch_size, num_images)))
                    ims = [imdb.read_image(i) for i in idxs]
                    # pad the tail batch to the compiled batch size
                    padded = ims + [ims[-1]] * (batch_size - len(ims))
                    yield (start, idxs, ims, padded) + pack_image_batch(
                        eng, padded, net_name, canvas_hw)

            def emit(pend):
                """Fetch + decode + yield one dispatched batch."""
                idxs, ims, padded, scales, outs = pend
                t_det.tic()
                # padded (length == compiled batch) carries the shapes for
                # decode; only the idxs prefix is real
                results = _decode_packed(eng, padded, scales, outs)
                t_det.toc()
                for k, i in enumerate(idxs):
                    yield (i, ims[k]) + results[k]

            # double-buffered dispatch: batch k+1 is dispatched to the
            # device BEFORE batch k's results are fetched/post-processed,
            # so the per-image NMS below overlaps the next device step
            # (jax dispatch is async; only the np.asarray fetch blocks)
            pending = None
            for start, idxs, ims, padded, blob, infos, scales \
                    in prefetch_iter(host_batches()):
                if start == trace_start:
                    # the traced batch runs unpipelined, and the blocking
                    # fetch happens INSIDE the trace window (so it covers
                    # the device execution) while the yields happen outside
                    # (so the consumer's NMS/vis does not pollute it —
                    # the reference traced only sess.run,
                    # test_bus.py:186-188)
                    if pending is not None:
                        yield from emit(pending)
                        pending = None
                    with trace:
                        outs = eng.inference_step(variables, blob, infos)
                        t_det.tic()
                        results = _decode_packed(eng, padded, scales, outs)
                        t_det.toc()
                    for k, i in enumerate(idxs):
                        yield (i, ims[k]) + results[k]
                    continue
                outs = eng.inference_step(variables, blob, infos)
                if pending is not None:
                    yield from emit(pending)
                pending = (idxs, ims, padded, scales, outs)
            if pending is not None:
                yield from emit(pending)
        else:
            def host_images():
                for i in range(num_images):
                    im = imdb.read_image(i)
                    yield (i, im) + pack_image_batch(eng, [im], net_name,
                                                     canvas_hw)

            for i, im, blob, infos, scales in prefetch_iter(host_images()):
                t_det.tic()
                with trace if i == min(1, num_images - 1) \
                        else contextlib.nullcontext():
                    (scores, boxes), = _im_detect_packed(
                        eng, variables, [im], blob, infos, scales)
                t_det.toc()
                yield i, im, scores, boxes

    for i, im, scores, boxes in detections():

        t_misc.tic()
        per_class = apply_nms_per_class(
            scores, boxes, num_classes, thresh, eng.cfg.TEST.NMS,
            cls_agnostic=eng.cfg.TEST.CLS_AGNOSTIC_NMS)
        for j in range(1, num_classes):
            all_boxes[j][i] = per_class[j]
        # cap total detections per image (test_bus.py:393-401)
        if max_per_image > 0:
            image_scores = np.hstack([all_boxes[j][i][:, -1]
                                      for j in range(1, num_classes)])
            if len(image_scores) > max_per_image:
                image_thresh = np.sort(image_scores)[-max_per_image]
                for j in range(1, num_classes):
                    keep = np.where(all_boxes[j][i][:, -1] >= image_thresh)[0]
                    all_boxes[j][i] = all_boxes[j][i][keep]
        if vis:
            from wssdl_bus_tpu.evaluate.visualize import save_qualitative
            # overlay GT under the detections like the reference's test-time
            # visualization (test_bus.py:345-355)
            entry = imdb.roidb[i] if imdb.roidb else None
            save_qualitative(
                im, {j: all_boxes[j][i] for j in range(1, num_classes)},
                os.path.join(output_dir, "qual"), imdb.image_index[i],
                thresh=0.5,
                gt_boxes=entry["boxes"] if entry is not None else None,
                gt_classes=entry["gt_classes"] if entry is not None else None)
        t_misc.toc()
        if verbose:
            print(f"im_detect: {i + 1:d}/{num_images:d} "
                  f"{t_det.average_time:.3f}s {t_misc.average_time:.3f}s")

    with open(os.path.join(output_dir, "detections.pkl"), "wb") as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)

    result = imdb.evaluate_detections(all_boxes, output_dir)
    return all_boxes, result
