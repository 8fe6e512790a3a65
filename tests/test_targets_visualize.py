"""Tests: bbox-target statistics (roidb.py:48-135 parity), qualitative
overlay rendering, and the bus_test_normal FP-counting eval mode."""

import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.data.targets import add_bbox_regression_targets


def make_roidb():
    return [{
        "boxes": np.array([[10, 10, 50, 60], [100, 100, 160, 150],
                           [5, 5, 30, 30]], np.uint16),
        "max_overlaps": np.array([1.0, 1.0, 1.0], np.float32),
        "max_classes": np.array([1, 2, 0]),
        "gt_overlaps": np.zeros((3, 3), np.float32),
    }]


def test_targets_gt_rois_zero_deltas():
    cfg = Config()
    roidb = make_roidb()
    means, stds = add_bbox_regression_targets(roidb, cfg)
    t = roidb[0]["bbox_targets"]
    assert t.shape == (3, 5)
    # every fg roi regresses to itself -> zero deltas, class column labeled
    np.testing.assert_array_equal(t[:, 0], [1, 2, 0])
    np.testing.assert_allclose(t[:, 1:], 0.0, atol=1e-6)
    assert means.shape == (12,) and stds.shape == (12,)
    np.testing.assert_allclose(means, 0.0, atol=1e-6)


def test_targets_precomputed_stats():
    cfg = Config().with_overrides(
        ["TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED", "True"])
    means, stds = add_bbox_regression_targets(make_roidb(), cfg)
    np.testing.assert_allclose(stds.reshape(3, 4)[1], [0.1, 0.1, 0.2, 0.2])


def test_visualize_overlay(tmp_path):
    from wssdl_bus_tpu.evaluate.visualize import save_qualitative

    im = (np.random.RandomState(0).rand(80, 100) * 255).astype(np.uint8)
    dets = {1: np.array([[10, 10, 40, 40, 0.9]], np.float32),
            2: np.array([[50, 20, 90, 70, 0.7],
                         [5, 5, 20, 20, 0.2]], np.float32)}
    gt = np.array([[12, 12, 42, 42]], np.float32)
    path = save_qualitative(im, dets, str(tmp_path), "sample",
                            gt_boxes=gt, gt_classes=[1])
    from PIL import Image

    img = np.asarray(Image.open(path))
    assert img.shape == (80, 100, 3)
    # some red (malignant det) and blue (benign gt/det) pixels were drawn
    assert (img[..., 0].astype(int) - img[..., 2]).max() > 100
    assert (img[..., 2].astype(int) - img[..., 0]).max() > 100


def test_test_normal_fp_counting(tmp_path):
    """The bus_test_normal split counts false positives only
    (bus.py:303-322)."""
    from wssdl_bus_tpu.evaluate.voc_eval import evaluate_bus_detections

    class FakeImdb:
        name = "bus_test_normal"
        classes = ("__background__", "benign", "malignant")
        num_classes = 3
        image_index = ["FILE01182"]
        num_images = 1
        data_dir = "/root/reference/SNUBH_BUS"

    # two confident detections on a normal image -> both are FPs unless they
    # match this image's (mass) annotations; use far-off boxes
    all_boxes = [
        [[]],
        [np.array([[1, 1, 5, 5, 0.9]], np.float32)],
        [np.array([[2, 2, 6, 6, 0.8]], np.float32)],
    ]
    res = evaluate_bus_detections(FakeImdb(), all_boxes, str(tmp_path))
    assert res[0] >= 1  # at least one counted FP
    assert (tmp_path / "num_fp_per_img.npy").exists()
    txt = (tmp_path / "eval.txt").read_text()
    assert "Number of all FPs" in txt
