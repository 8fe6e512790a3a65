"""Serving-artifact export/restore (wssdl_bus_tpu.serve): the StableHLO
program + weights + config bundle must reproduce the live Engine's
inference bit-for-bit on the same platform, and the restored ServingModel
must drive the host-side serving helpers unchanged."""

import os

import jax
import numpy as np
import pytest

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.serve import export_serving, load_serving
from wssdl_bus_tpu.train.engine import Engine

CANVAS = (96, 128)

# the module fixtures export (jit + StableHLO serialize) whole inference
# programs -> multi-minute cold compiles; fast-lane serve coverage is the
# pure-host batcher logic in test_serve_server.py
pytestmark = pytest.mark.slow


def tiny_cfg():
    return Config().with_overrides([
        "TEST.RPN_PRE_NMS_TOP_N", "200",
        "TEST.RPN_POST_NMS_TOP_N", "32",
        "TEST.SCALES", "(90,)", "TEST.MAX_SIZE", "128",
    ])


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = tiny_cfg()
    model = FasterRCNN(backbone="VGGnet")
    eng = Engine(model, cfg, CANVAS)
    variables, _ = eng.init(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("artifact"))
    meta = export_serving(eng, variables, out, "VGGnet_test",
                          batch_sizes=(1, 2))
    return eng, variables, out, meta


def _batch(b, seed=0):
    rng = np.random.RandomState(seed)
    data = rng.rand(b, *CANVAS, 3).astype(np.float32)
    infos = np.tile(np.array([[CANVAS[0], CANVAS[1], 1.5, 0.0]],
                             np.float32), (b, 1))
    return data, infos


def test_artifact_files(exported):
    _, _, out, meta = exported
    for f in ("meta.json", "variables.msgpack", "infer_b1.shlo",
              "infer_b2.shlo"):
        assert os.path.exists(os.path.join(out, f)), f
    assert meta["batch_sizes"] == [1, 2]
    assert meta["canvas_hw"] == list(CANVAS)
    assert meta["platform"] == jax.default_backend()


@pytest.mark.parametrize("b", [1, 2])
def test_roundtrip_bitwise(exported, b):
    eng, variables, out, _ = exported
    served = load_serving(out)
    data, infos = _batch(b, seed=b)
    want = eng.inference_step(variables, data, infos)
    got = served.inference_step(served.variables, data, infos)
    for w, g, name in zip(want, got,
                          ("rois", "valid", "cls_score", "cls_prob",
                           "bbox_pred")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), name)


def test_config_survives_roundtrip(exported):
    eng, _, out, _ = exported
    served = load_serving(out)
    assert served.cfg == eng.cfg
    assert served.cfg.TEST.RPN_POST_NMS_TOP_N == 32
    assert served.canvas_hw == CANVAS


def test_detect_pads_to_exported_batch(exported):
    eng, variables, out, _ = exported
    served = load_serving(out)
    # one raw grayscale image -> uses the b=1 program; compare against the
    # live-engine serving path (im_detect) on the same image
    from wssdl_bus_tpu.evaluate.detect import im_detect
    im = np.full((100, 120), 128, np.uint8)
    im[30:60, 40:90] = 200
    want_scores, want_boxes = im_detect(eng, variables, im, "VGGnet_test",
                                        CANVAS)
    (got_scores, got_boxes), = served.detect([im])
    np.testing.assert_array_equal(want_scores, got_scores)
    np.testing.assert_array_equal(want_boxes, got_boxes)

    # two images exercise the b=2 program with NO padding; the second image
    # must decode identically to serving it alone
    im2 = np.full((90, 110), 100, np.uint8)
    im2[10:40, 20:70] = 220
    res2 = served.detect([im, im2])
    assert len(res2) == 2
    (solo_scores, solo_boxes), = served.detect([im2])
    np.testing.assert_array_equal(res2[1][0], solo_scores)
    np.testing.assert_array_equal(res2[1][1], solo_boxes)


def test_detect_with_real_padding(exported, tmp_path):
    """Artifact with ONLY batch-2 program: a single-image request must pad
    with a blank canvas slot and decode identically to the live engine's
    single-image path (padding must not perturb the real image's slots)."""
    eng, variables, _, _ = exported
    out = str(tmp_path / "b2only")
    export_serving(eng, variables, out, "VGGnet_test", batch_sizes=(2,))
    served = load_serving(out)
    from wssdl_bus_tpu.evaluate.detect import im_detect
    im = np.full((100, 120), 128, np.uint8)
    im[30:60, 40:90] = 200
    want_scores, want_boxes = im_detect(eng, variables, im, "VGGnet_test",
                                        CANVAS)
    (got_scores, got_boxes), = served.detect([im])
    np.testing.assert_array_equal(want_scores, got_scores)
    np.testing.assert_array_equal(want_boxes, got_boxes)


def test_unexported_batch_raises(exported):
    _, _, out, _ = exported
    served = load_serving(out)
    data, infos = _batch(3)
    with pytest.raises(ValueError, match="batch size 3"):
        served.inference_step(served.variables, data, infos)
    ims = [np.full((50, 60), 128, np.uint8)] * 3
    with pytest.raises(ValueError, match="exceed"):
        served.detect(ims)


def test_predict_cli_from_artifact(exported, tmp_path):
    import json
    import sys

    from PIL import Image

    _, _, art, _ = exported
    im = np.full((100, 120), 128, np.uint8)
    im[30:60, 40:90] = 210
    p1 = str(tmp_path / "im1.png")
    p2 = str(tmp_path / "im2.png")
    Image.fromarray(im).save(p1)
    Image.fromarray(im.T.copy()).save(p2)
    out = str(tmp_path / "preds")

    from wssdl_bus_tpu.main.predict import main as predict_main
    old = sys.argv
    sys.argv = ["predict.py", p1, p2, "--artifact", art, "--out", out,
                "--thresh", "0.0", "--vis"]
    try:
        predict_main()
    finally:
        sys.argv = old

    report = json.load(open(os.path.join(out, "predictions.json")))
    assert [e["image"] for e in report] == [p1, p2]
    for e in report:
        for d in e["detections"]:
            assert d["class"] in ("benign", "malignant")
            assert 0.0 <= d["score"] <= 1.0
            x1, y1, x2, y2 = d["box"]
            assert 0 <= x1 <= x2 and 0 <= y1 <= y2
    assert os.path.exists(os.path.join(out, "im1_pred.png"))
    assert os.path.exists(os.path.join(out, "im2_pred.png"))


@pytest.mark.mesh
def test_parallel_engine_rejected(tmp_path):
    from wssdl_bus_tpu.parallel import build_engine
    cfg = tiny_cfg()
    model = FasterRCNN(backbone="VGGnet")
    eng = build_engine(model, cfg, CANVAS, mesh_data=2, mesh_model=1)
    with pytest.raises(NotImplementedError, match="single-device"):
        export_serving(eng, None, str(tmp_path), "VGGnet_test")


# ------------------------------------------------------------------ #
# int8-quantized artifacts (export_serving(calib_batches=...))
# ------------------------------------------------------------------ #
@pytest.fixture(scope="module")
def exported_q(exported, tmp_path_factory):
    eng, variables, _, _ = exported
    rng = np.random.RandomState(7)
    calib = rng.rand(2, *CANVAS, 3).astype(np.float32) * 50.0
    out = str(tmp_path_factory.mktemp("artifact_q"))
    meta = export_serving(eng, variables, out, "VGGnet_test",
                          batch_sizes=(1,), calib_batches=[calib])
    qtrunk = eng.quantize_for_serving(variables, [calib])
    return eng, variables, qtrunk, out, meta


def test_quant_artifact_meta_and_size(exported, exported_q):
    _, _, out_f, meta_f = exported
    _, _, _, out_q, meta_q = exported_q
    assert meta_q["quantized"] is True
    assert meta_f["quantized"] is False
    sz_f = os.path.getsize(os.path.join(out_f, "variables.msgpack"))
    sz_q = os.path.getsize(os.path.join(out_q, "variables.msgpack"))
    # the int8 trunk replaces the float trunk: ~45 MB saved on VGG16
    assert sz_q < 0.7 * sz_f


def test_quant_roundtrip_bitwise(exported_q):
    eng, variables, qtrunk, out, _ = exported_q
    served = load_serving(out)
    data, infos = _batch(1, seed=3)
    want = eng.inference_step_quant(qtrunk, variables, data, infos)
    got = served.inference_step(served.variables, data, infos)
    for w, g, name in zip(want, got,
                          ("rois", "valid", "cls_score", "cls_prob",
                           "bbox_pred")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), name)


def test_quant_artifact_detect(exported_q):
    _, _, _, out, _ = exported_q
    served = load_serving(out)
    im = np.full((100, 120), 120, np.uint8)
    im[20:70, 30:100] = 220
    (scores, boxes), = served.detect([im])
    assert np.isfinite(scores).all() and np.isfinite(boxes).all()
    assert scores.shape[1] == 3 and boxes.shape[1] == 12


def test_quant_resnet_export_roundtrip(tmp_path):
    """int8 ResNet (trunk + group3 head) artifacts export/restore and
    reproduce the live quantized engine bitwise (r04: quantize_for_serving
    dispatches by backbone)."""
    cfg = tiny_cfg()
    model = FasterRCNN(backbone="Resnet", depth=18, norm=None)
    eng = Engine(model, cfg, CANVAS)
    variables, _ = eng.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    calib = rng.rand(1, *CANVAS, 3).astype(np.float32)
    out = str(tmp_path / "artifact_rq")
    meta = export_serving(eng, variables, out, "Resnet_test",
                          batch_sizes=(1,), calib_batches=[calib])
    assert meta["quantized"] is True
    qtrunk = eng.quantize_for_serving(variables, [calib])
    served = load_serving(out)
    data, infos = _batch(1, seed=3)
    want = eng.inference_step_quant(qtrunk, variables, data, infos)
    got = served.inference_step(served.variables, data, infos)
    for w, g, name in zip(want, got,
                          ("rois", "valid", "cls_score", "cls_prob",
                           "bbox_pred")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), name)
