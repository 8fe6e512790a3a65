"""Pure-numpy oracles duplicating the reference kernels' semantics.

These are *independent re-implementations* of the algorithms in
``/root/reference/code/lib`` (bbox.pyx, bbox_ui.pyx, cpu_nms.pyx,
bbox_transform.py, roi_pooling_op.cc) used only as test references.
"""

import numpy as np


def iou_oracle(boxes, query):
    """Dense IoU, +1 convention, zero when no positive overlap (bbox.pyx)."""
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k))
    for j in range(k):
        qa = (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
        for i in range(n):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                ba = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                out[i, j] = iw * ih / (ba + qa - iw * ih)
    return out


def iou_ui_oracle(boxes, query):
    """Unidirectional overlap: intersection / area(boxes[n]) (bbox_ui.pyx)."""
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k))
    for i in range(n):
        ba = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
        for j in range(k):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                out[i, j] = iw * ih / ba
    return out


def nms_oracle(dets, thresh):
    """Greedy NMS keeping the reference's >= suppression rule (cpu_nms.pyx:65).

    dets: [N, 5] (x1, y1, x2, y2, score).  Returns kept indices in score order.
    """
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(len(dets), bool)
    keep = []
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(order)):
            j = order[_j]
            if suppressed[j]:
                continue
            xx1 = max(x1[i], x1[j])
            yy1 = max(y1[i], y1[j])
            xx2 = min(x2[i], x2[j])
            yy2 = min(y2[i], y2[j])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            if inter / (areas[i] + areas[j] - inter) >= thresh:
                suppressed[j] = True
    return keep


def bbox_transform_oracle(ex, gt):
    ex_w = ex[:, 2] - ex[:, 0] + 1.0
    ex_h = ex[:, 3] - ex[:, 1] + 1.0
    ex_cx = ex[:, 0] + 0.5 * ex_w
    ex_cy = ex[:, 1] + 0.5 * ex_h
    gt_w = gt[:, 2] - gt[:, 0] + 1.0
    gt_h = gt[:, 3] - gt[:, 1] + 1.0
    gt_cx = gt[:, 0] + 0.5 * gt_w
    gt_cy = gt[:, 1] + 0.5 * gt_h
    return np.stack([(gt_cx - ex_cx) / ex_w, (gt_cy - ex_cy) / ex_h,
                     np.log(gt_w / ex_w), np.log(gt_h / ex_h)], axis=1)


def bbox_transform_inv_oracle(boxes, deltas):
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    dx, dy, dw, dh = (deltas[:, 0::4], deltas[:, 1::4],
                      deltas[:, 2::4], deltas[:, 3::4])
    cx = dx * widths[:, None] + ctr_x[:, None]
    cy = dy * heights[:, None] + ctr_y[:, None]
    w = np.exp(dw) * widths[:, None]
    h = np.exp(dh) * heights[:, None]
    out = np.zeros_like(deltas)
    out[:, 0::4] = cx - 0.5 * w
    out[:, 1::4] = cy - 0.5 * h
    out[:, 2::4] = cx + 0.5 * w
    out[:, 3::4] = cy + 0.5 * h
    return out


def roi_pool_oracle(feat, rois, pooled_h, pooled_w, spatial_scale,
                    flavor="gpu"):
    """ROI max pooling, mirroring the reference kernels.

    feat: [B, H, W, C]; rois: [R, 5] (batch_idx, x1, y1, x2, y2).
    flavor='gpu' (default): true floor/ceil bin edges — the CUDA kernel the
    reference actually runs (roi_pooling_op_gpu.cu.cc:51-58).
    flavor='cpu': the CPU kernel casts the float bin edge to int BEFORE
    floor/ceil (`floor(static_cast<int>(ph*bin_h))`,
    roi_pooling_op.cc:167-170), so both edges truncate — its ceil is a no-op.
    """
    B, H, W, C = feat.shape
    R = rois.shape[0]
    out = np.zeros((R, pooled_h, pooled_w, C), np.float32)

    def c_round(x):
        # C round(): half away from zero (Python round() is banker's and
        # would give round(2.5) == 2, diverging from the reference kernel)
        return int(np.floor(x + 0.5)) if x >= 0 else -int(np.floor(-x + 0.5))

    for r in range(R):
        b = int(rois[r, 0])
        rsw = c_round(rois[r, 1] * spatial_scale)
        rsh = c_round(rois[r, 2] * spatial_scale)
        rew = c_round(rois[r, 3] * spatial_scale)
        reh = c_round(rois[r, 4] * spatial_scale)
        roi_w = max(rew - rsw + 1, 1)
        roi_h = max(reh - rsh + 1, 1)
        # exact integer bin edges (the kernels' definition; the C kernels'
        # f32 arithmetic deviates by one cell only where its rounding
        # crosses an integer boundary, and is compiler-dependent there)
        for ph in range(pooled_h):
            for pw in range(pooled_w):
                hstart = (ph * roi_h) // pooled_h
                wstart = (pw * roi_w) // pooled_w
                if flavor == "gpu":
                    hend = ((ph + 1) * roi_h + pooled_h - 1) // pooled_h
                    wend = ((pw + 1) * roi_w + pooled_w - 1) // pooled_w
                else:
                    hend = ((ph + 1) * roi_h) // pooled_h
                    wend = ((pw + 1) * roi_w) // pooled_w
                hstart = min(max(hstart + rsh, 0), H)
                hend = min(max(hend + rsh, 0), H)
                wstart = min(max(wstart + rsw, 0), W)
                wend = min(max(wend + rsw, 0), W)
                if hend <= hstart or wend <= wstart:
                    continue  # empty bin -> 0
                patch = feat[b, hstart:hend, wstart:wend, :]
                out[r, ph, pw, :] = patch.max(axis=(0, 1))
    return out
