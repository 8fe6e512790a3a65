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


def test_froc_sweep_matches_per_threshold_calls():
    """The one-pass froc_sweep must reproduce the reference's 21 separate
    voc_eval_class evaluations point-for-point, including score ties at the
    rounded thresholds and images with no GT / no detections."""
    from wssdl_bus_tpu.evaluate.voc_eval import froc_sweep

    rng = np.random.RandomState(7)
    imagenames = [f"im{i}" for i in range(12)]
    gts, dets = {}, {}
    for i, name in enumerate(imagenames):
        n_gt = rng.randint(0, 3)
        boxes = []
        for _ in range(n_gt):
            x1, y1 = rng.randint(0, 200, 2)
            w, h = rng.randint(20, 80, 2)
            boxes.append([x1, y1, x1 + w, y1 + h])
        gts[name] = (np.array(boxes, float).reshape(-1, 4),
                     rng.rand(n_gt) < 0.2)
        n_det = rng.randint(0, 6)
        rows = []
        for _ in range(n_det):
            if boxes and rng.rand() < 0.5:  # near-hit of a random GT
                bx = boxes[rng.randint(len(boxes))]
                jit = rng.randint(-5, 6, 4)
                rows.append([bx[0] + jit[0], bx[1] + jit[1],
                             bx[2] + jit[2], bx[3] + jit[3],
                             # scores that round to exact threshold values
                             rng.choice([0.95, 0.9, 0.8999, 0.5, 0.05,
                                         rng.rand()])])
            else:
                x1, y1 = rng.randint(0, 300, 2)
                rows.append([x1, y1, x1 + 30, y1 + 30, rng.rand()])
        dets[name] = np.array(rows, np.float32).reshape(-1, 5)

    def corloc_oracle(thr):
        """Independent CorLoc re-implementation straight from the reference
        loop (voc_eval_bus.py:160-206): per GT-containing image, select the
        ROUNDED detections with score >= thr and test each GT for an
        IoU > 0.5 overlap.  Deliberately shares no code with _ClassEval."""
        ni = nok = 0
        for name in imagenames:
            BBGT = np.asarray(gts[name][0], float)
            if BBGT.shape[0] == 0:
                continue
            ni += 1
            rows = np.asarray(dets[name], float).reshape(-1, 5)
            sel = [r for r in rows if -float(f"{r[4]:.3f}") <= -thr]
            bok = False
            for r in sel:
                bb = [float(f"{r[0] + 1:.1f}"), float(f"{r[1] + 1:.1f}"),
                      float(f"{r[2] + 1:.1f}"), float(f"{r[3] + 1:.1f}")]
                for g in BBGT:
                    ix = max(0.0, min(bb[2], g[2]) - max(bb[0], g[0]) + 1)
                    iy = max(0.0, min(bb[3], g[3]) - max(bb[1], g[1]) + 1)
                    inter = ix * iy
                    uni = ((bb[2] - bb[0] + 1) * (bb[3] - bb[1] + 1)
                           + (g[2] - g[0] + 1) * (g[3] - g[1] + 1) - inter)
                    if inter / uni > 0.5:
                        bok = True
            if bok:
                nok += 1
        return ni, nok

    thresholds = list(np.arange(1.0, -0.01, -0.05))
    fast = froc_sweep(dets, gts, imagenames, thresholds)
    any_dets = any(len(dets[n]) for n in imagenames)
    for t, thr in enumerate(thresholds):
        _, _, _, ni, nok, _, num_fps, _ = voc_eval_class(
            dets, gts, imagenames, score_thresh=thr)
        slow_pt = (float(num_fps) / max(ni, 1), float(nok) / max(ni, 1))
        assert fast[t] == slow_pt, (thr, fast[t], slow_pt)
        # cross-check CorLoc against the independent oracle (voc_eval_class
        # and froc_sweep share _ClassEval.corloc, so agreement between them
        # alone would not catch a shared bug)
        if any_dets:
            o_ni, o_nok = corloc_oracle(thr)
            assert (ni, nok) == (o_ni, o_nok), (thr, ni, nok, o_ni, o_nok)

    # degenerate: no detections anywhere -> the reference's ni=0 early
    # return makes every point (0, 0)
    empty = {n: np.zeros((0, 5), np.float32) for n in imagenames}
    assert froc_sweep(empty, gts, imagenames, thresholds) == \
        [(0.0, 0.0)] * len(thresholds)
