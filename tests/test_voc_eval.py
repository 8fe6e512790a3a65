"""Deterministic checks of the metrics engine (voc_eval_bus parity):
VOC-07 11-point AP arithmetic, CorLoc counting, FROC FP counting."""

import numpy as np

from wssdl_bus_tpu.evaluate.voc_eval import voc_ap, voc_eval_class


def test_voc_ap_11_point():
    # perfect detector: precision 1 at every recall -> AP 1
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-9
    # detector reaching recall 0.5 with precision 1: 6 of 11 points score 1
    ap = voc_ap(np.array([0.5]), np.array([1.0]), use_07_metric=True)
    assert abs(ap - 6 / 11) < 1e-9


def test_voc_eval_class_counts():
    """1 image, 2 GT boxes; detections: one TP@0.9 on gt0, one duplicate
    TP->FP@0.8 on gt0, one FP@0.7 in the void, one TP@0.6 on gt1."""
    gts = {"im0": (np.array([[10, 10, 50, 50], [100, 100, 160, 160]], float),
                 np.array([False, False]))}
    dets = {"im0": np.array([
        [9, 9, 49, 49, 0.9],      # matches gt0 (coords are 0-based here;
        [11, 11, 51, 51, 0.8],    # the evaluator adds +1 like the writer)
        [300, 300, 320, 320, 0.7],
        [99, 99, 159, 159, 0.6],
    ], np.float32)}
    rec, prec, ap, ni, nok, arr_ok, num_fps, fp_per_img = voc_eval_class(
        dets, gts, ["im0"], score_thresh=0.5)
    # recall sweep: TP, FP(dup), FP, TP -> final recall 1.0
    assert rec[-1] == 1.0
    np.testing.assert_allclose(prec, [1, 0.5, 1 / 3, 0.5])
    # CorLoc: the image has GT and a >=0.5-scoring det overlapping -> 1/1
    assert (ni, nok) == (1, 1)
    # FROC FPs at thresh 0.5: ONLY the void detection — a duplicate hit on
    # an already-claimed GT is a PR false positive but NOT a FROC FP (the
    # reference counts localization misses only, voc_eval_bus.py:248-266)
    assert num_fps == 1
    assert fp_per_img == [1]


def test_corloc_requires_confident_detection():
    gts = {"im0": (np.array([[10, 10, 50, 50]], float),
               np.array([False]))}
    dets = {"im0": np.array([[9, 9, 49, 49, 0.4]], np.float32)}  # score < .5
    *_, ni, nok, _, _, _ = voc_eval_class(dets, gts, ["im0"],
                                          score_thresh=0.5)
    assert (ni, nok) == (1, 0)


def test_difficult_gt_neither_tp_nor_fp():
    """Reference semantics (voc_eval_bus.py:134-141,238-246): difficult GT
    stays an overlap target but is excluded from npos; a detection matching
    it is neither TP nor FP, and not a FROC FP either."""
    gts = {"im0": (np.array([[10, 10, 50, 50], [100, 100, 160, 160]], float),
                   np.array([True, False]))}
    dets = {"im0": np.array([
        [9, 9, 49, 49, 0.9],       # hits the DIFFICULT gt0 -> ignored
        [99, 99, 159, 159, 0.6],   # TP on gt1
    ], np.float32)}
    rec, prec, ap, ni, nok, arr_ok, num_fps, fp_per_img = voc_eval_class(
        dets, gts, ["im0"], score_thresh=0.5)
    # npos == 1 (only the non-difficult gt); the difficult hit added nothing
    assert rec[-1] == 1.0
    np.testing.assert_allclose(prec, [0.0, 1.0])  # tp=[0,1], fp=[0,0]
    assert num_fps == 0  # the difficult hit is NOT a FROC FP (ovmax > thresh)
    # CorLoc still counts the image and the difficult box as an OK target
    assert (ni, nok) == (1, 1)


def test_score_rounding_matches_results_file():
    """The reference evaluates the %.3f-rounded score the results file
    carries (bus.py:258): 0.4996 -> '0.500' passes the 0.5 CorLoc cut."""
    gts = {"im0": (np.array([[10, 10, 50, 50]], float), np.array([False]))}
    dets = {"im0": np.array([[9, 9, 49, 49, 0.4996]], np.float32)}
    *_, ni, nok, _, _, _ = voc_eval_class(dets, gts, ["im0"],
                                          score_thresh=0.5)
    assert (ni, nok) == (1, 1)
    dets = {"im0": np.array([[9, 9, 49, 49, 0.4994]], np.float32)}
    *_, ni, nok, _, _, _ = voc_eval_class(dets, gts, ["im0"],
                                          score_thresh=0.5)
    assert (ni, nok) == (1, 0)
