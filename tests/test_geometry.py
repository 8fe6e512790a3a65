"""Unit tests for the pure geometry core: anchors, box transforms, IoU, NMS."""

import numpy as np
import jax.numpy as jnp

from wssdl_bus_tpu.ops import (
    bbox_transform, bbox_transform_inv, clip_boxes,
    generate_anchors, iou_matrix, iou_ui_matrix,
    nms_indices, nms_mask, shifted_anchors,
)
from tests import oracles

# The 9-anchor matrix the reference code produces: the MATLAB matrix embedded
# as a comment in generate_anchors.py:15-25 shifted to 0-based coordinates
# (the python port subtracts 1 from the base window, generate_anchors.py:44).
EXPECTED_ANCHORS = np.array([
    [-83., -39., 100., 56.],
    [-175., -87., 192., 104.],
    [-359., -183., 376., 200.],
    [-55., -55., 72., 72.],
    [-119., -119., 136., 136.],
    [-247., -247., 264., 264.],
    [-35., -79., 52., 96.],
    [-79., -167., 96., 184.],
    [-167., -343., 184., 360.],
]) - 1.0


def _rand_boxes(rng, n, scale=600.0):
    x1 = rng.uniform(0, scale * 0.8, n)
    y1 = rng.uniform(0, scale * 0.8, n)
    w = rng.uniform(1, scale * 0.4, n)
    h = rng.uniform(1, scale * 0.4, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_generate_anchors_matches_matlab():
    np.testing.assert_array_equal(generate_anchors(), EXPECTED_ANCHORS)


def test_shifted_anchors_layout():
    a = shifted_anchors(2, 3, 16)
    assert a.shape == (2 * 3 * 9, 4)
    # cell (0,0) holds the base anchors; cell (h=1, w=2) is shifted by (32,16)
    np.testing.assert_allclose(a[:9], EXPECTED_ANCHORS)
    np.testing.assert_allclose(a[(1 * 3 + 2) * 9:(1 * 3 + 2) * 9 + 9],
                               EXPECTED_ANCHORS + np.array([32, 16, 32, 16]))


def test_bbox_transform_roundtrip(rng):
    ex = _rand_boxes(rng, 64)
    gt = _rand_boxes(rng, 64)
    deltas = np.asarray(bbox_transform(jnp.array(ex), jnp.array(gt)))
    np.testing.assert_allclose(deltas, oracles.bbox_transform_oracle(ex, gt),
                               rtol=1e-3, atol=1e-4)
    back = np.asarray(bbox_transform_inv(jnp.array(ex), jnp.array(deltas)))
    # The reference decode is NOT an exact inverse: with the +1 pixel-extent
    # convention, ctr +/- 0.5*w (bbox_transform.py:53-59) lands on
    # (x1, y1, x2+1, y2+1).  We reproduce that faithfully.
    np.testing.assert_allclose(back, gt + np.array([0, 0, 1, 1], np.float32),
                               rtol=1e-3, atol=2e-2)


def test_bbox_transform_inv_multiclass(rng):
    boxes = _rand_boxes(rng, 32)
    deltas = rng.randn(32, 12).astype(np.float32) * 0.1
    got = np.asarray(bbox_transform_inv(jnp.array(boxes), jnp.array(deltas)))
    want = oracles.bbox_transform_inv_oracle(boxes, deltas)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_clip_boxes(rng):
    boxes = _rand_boxes(rng, 40) * 2 - 200
    got = np.asarray(clip_boxes(jnp.array(boxes), 291.0, 498.0))
    assert (got[:, 0::4] >= 0).all() and (got[:, 0::4] <= 497).all()
    assert (got[:, 1::4] >= 0).all() and (got[:, 1::4] <= 290).all()


def test_iou_matrix(rng):
    a = _rand_boxes(rng, 50)
    b = _rand_boxes(rng, 7)
    got = np.asarray(iou_matrix(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, oracles.iou_oracle(a, b), rtol=1e-5, atol=1e-6)


def test_iou_ui_matrix(rng):
    a = _rand_boxes(rng, 50)
    b = _rand_boxes(rng, 7)
    got = np.asarray(iou_ui_matrix(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, oracles.iou_ui_oracle(a, b), rtol=1e-5, atol=1e-6)


def test_nms_matches_oracle(rng):
    for trial in range(4):
        n = [17, 100, 130, 400][trial]
        boxes = _rand_boxes(rng, n, scale=200.0)
        scores = rng.uniform(size=n).astype(np.float32)
        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        want = oracles.nms_oracle(dets, 0.7)

        idx, keep_valid = nms_indices(
            jnp.array(boxes), jnp.array(scores), jnp.ones(n, bool), 0.7, n)
        got = np.asarray(idx)[np.asarray(keep_valid)]
        np.testing.assert_array_equal(got, want)


def test_nms_respects_validity_mask(rng):
    n = 60
    boxes = _rand_boxes(rng, n, scale=100.0)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[20:] = False
    dets = np.hstack([boxes[:20], scores[:20, None]]).astype(np.float32)
    want = oracles.nms_oracle(dets, 0.5)
    idx, keep_valid = nms_indices(
        jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5, n)
    got = np.asarray(idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, want)
    # invalid boxes must never appear in the kept set
    assert (got < 20).all()


def test_nms_mask_block_sizes(rng):
    """The blocked sweep must be invariant to the block size."""
    n = 300
    boxes = _rand_boxes(rng, n, scale=150.0)
    scores = rng.uniform(size=n).astype(np.float32)
    order = np.argsort(-scores)
    sb = jnp.array(boxes[order])
    valid = jnp.ones(n, bool)
    ref = np.asarray(nms_mask(sb, valid, 0.6, block_size=64))
    for bs in (32, 128, 256):
        np.testing.assert_array_equal(
            np.asarray(nms_mask(sb, valid, 0.6, block_size=bs)), ref)


def test_nms_new_containment(rng):
    """nms_new (reference utils/nms.pyx:71-123): suppress on IoU >= thresh OR
    >95% containment in either direction."""
    from wssdl_bus_tpu.evaluate.detect import nms_new_numpy, nms_numpy

    # A tiny box fully inside a big one: IoU is small (survives plain NMS)
    # but inter/area_small = 1 > 0.95 so nms_new drops it.
    dets = np.array([
        [0, 0, 299, 299, 0.9],     # big, highest score
        [100, 100, 129, 129, 0.8], # tiny, fully contained
        [400, 400, 499, 499, 0.7], # far away, kept
    ], np.float32)
    assert nms_numpy(dets, 0.5) == [0, 1, 2]
    assert nms_new_numpy(dets, 0.5) == [0, 2]

    # Random fuzz: nms_new keep-set == brute-force greedy sweep per spec.
    for _ in range(20):
        n = 40
        boxes = _rand_boxes(rng, n, scale=300.0)
        scores = rng.rand(n).astype(np.float32)
        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        x1, y1, x2, y2 = boxes.T
        areas = (x2 - x1 + 1) * (y2 - y1 + 1)
        order = list(scores.argsort()[::-1])
        expect, supp = [], set()
        for i in order:
            if i in supp:
                continue
            expect.append(int(i))
            for j in order:
                if j in supp or scores[j] > scores[i] or j == i:
                    continue
                iw = max(0.0, min(x2[i], x2[j]) - max(x1[i], x1[j]) + 1)
                ih = max(0.0, min(y2[i], y2[j]) - max(y1[i], y1[j]) + 1)
                inter = iw * ih
                iou = inter / (areas[i] + areas[j] - inter)
                if iou >= 0.4 or inter / areas[i] > 0.95 or inter / areas[j] > 0.95:
                    supp.add(j)
        assert nms_new_numpy(dets, 0.4) == expect


def test_get_output_dir(tmp_path):
    from wssdl_bus_tpu.config import Config, get_direct_output_dir, get_output_dir

    cfg = Config().with_overrides(
        ["ROOT_DIR", repr(str(tmp_path)), "EXP_DIR", "'exp1'"])
    d = get_output_dir("bus_test", "vgg16_iter_100", cfg)
    assert d.endswith("output/exp1/bus_test/vgg16_iter_100")
    import os
    assert os.path.isdir(d)
    d2 = get_direct_output_dir("plots", cfg)
    assert d2.endswith("output/exp1/plots") and os.path.isdir(d2)
