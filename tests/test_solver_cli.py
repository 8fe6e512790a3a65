"""End-to-end CLI tests on the 5 bundled SNUBH sample images: a short
combined training run (with in-loop eval + snapshot), then the test CLI
restoring the snapshot and evaluating — the reference's own overfit-run
defaults (train.py:40-42) at a reduced scale for CPU speed."""

import os
import sys

import numpy as np
import pytest

SMALL_CFGS = [
    "TRAIN.SCALES", "(150,)", "TRAIN.MAX_SIZE", "250",
    "TEST.SCALES", "(150,)", "TEST.MAX_SIZE", "250",
    "TRAIN.RPN_PRE_NMS_TOP_N", "300", "TRAIN.RPN_POST_NMS_TOP_N", "64",
    "TRAIN.BATCH_SIZE", "32", "TRAIN.RPN_BATCHSIZE", "64",
    "TEST.RPN_PRE_NMS_TOP_N", "200", "TEST.RPN_POST_NMS_TOP_N", "32",
    "TRAIN.SNAPSHOT_ITERS", "2", "TRAIN.TEST_ITERS", "2",
    "TRAIN.DISPLAY", "1",
]

DATA = "/root/reference/SNUBH_BUS"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(DATA),
                       reason="SNUBH_BUS samples not present"),
    # every test here is a real CLI training/eval run -> multi-minute cold
    # XLA compiles; CLI/config parsing stays fast-lane via test_config_loader
    pytest.mark.slow,
]


def run_cli(main_fn, argv):
    old = sys.argv
    sys.argv = argv
    try:
        main_fn()
    finally:
        sys.argv = old


def test_train_then_test_cli(tmp_path):
    out = str(tmp_path / "run")
    from wssdl_bus_tpu.main.train import main as train_main
    run_cli(train_main, [
        "train.py", "--max_iters", "2", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch",
        "--set_cfgs", *SMALL_CFGS])

    # artifacts: snapshot dir, log.txt, in-loop eval outputs
    snaps = [d for d in os.listdir(out) if "_iter_" in d]
    assert snaps, os.listdir(out)
    assert os.path.exists(os.path.join(out, "log.txt"))
    test_dir = os.path.join(out, "test")
    assert os.path.exists(os.path.join(test_dir, "detections.pkl"))
    assert os.path.exists(os.path.join(test_dir, "eval.txt"))
    assert os.path.exists(os.path.join(test_dir, "froc_curve_pts.npy"))

    ckpt = os.path.join(out, sorted(snaps)[-1])
    from wssdl_bus_tpu.main.test import main as test_main
    out2 = str(tmp_path / "eval")
    run_cli(test_main, [
        "test.py", "--model", ckpt, "--output_dir", out2,
        "--data_dir", DATA,
        "--set_cfgs", *SMALL_CFGS, "TEST.DEBUG_TIMELINE", "True"])
    assert os.path.exists(os.path.join(out2, "detections.pkl"))
    assert os.path.exists(os.path.join(out2, "eval.txt"))
    # TEST.DEBUG_TIMELINE -> a jax profiler trace was dumped
    assert os.path.isdir(os.path.join(out2, "jax_trace"))
    # eval.txt must contain AP + CorLoc lines for both classes
    txt = open(os.path.join(out2, "eval.txt")).read()
    for needle in ("AP for benign", "AP for malignant", "CorLoc for benign",
                   "Mean AP", "CorLoc ="):
        assert needle in txt, txt

    # export the same snapshot to a serving artifact and serve a bundled
    # image from it without the model-building path (main/export.py + serve)
    from wssdl_bus_tpu.main.export import main as export_main
    art = str(tmp_path / "artifact")
    run_cli(export_main, [
        "export.py", "--model", ckpt, "--out", art, "--batch_sizes", "1",
        "--data_dir", DATA, "--set_cfgs", *SMALL_CFGS])
    from wssdl_bus_tpu.data.dataset import get_imdb
    from wssdl_bus_tpu.serve import load_serving
    served = load_serving(art)
    imdb = get_imdb("bus_test", DATA)
    im = imdb.read_image(0)
    (scores, boxes), = served.detect([im])
    assert scores.shape[1] == 3 and boxes.shape[1] == 12
    assert np.isfinite(scores).all() and np.isfinite(boxes).all()

    # predict CLI in SNAPSHOT mode on a raw image file (the --model branch;
    # the artifact branch is covered in tests/test_export.py)
    import json
    from wssdl_bus_tpu.main.predict import main as predict_main
    img_path = imdb.image_path_at(0)
    preds = str(tmp_path / "preds")
    run_cli(predict_main, [
        "predict.py", img_path, "--model", ckpt, "--out", preds,
        "--thresh", "0.0", "--data_dir", DATA,
        "--set_cfgs", *SMALL_CFGS])
    report = json.load(open(os.path.join(preds, "predictions.json")))
    assert report[0]["image"] == img_path
    for d in report[0]["detections"]:
        assert d["class"] in ("benign", "malignant")


def test_train_alter_cli(tmp_path):
    out = str(tmp_path / "alter")
    from wssdl_bus_tpu.main.train_alter import main as alter_main
    run_cli(alter_main, [
        "train_alter.py", "--max_iters", "2", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch",
        "--s_start_iter", "0", "--s_end_iter", "2",
        "--ws_start_iter", "0", "--ws_end_iter", "2",
        "--set_cfgs", *SMALL_CFGS])
    assert any("_iter_" in d for d in os.listdir(out))
    assert os.path.exists(os.path.join(out, "test", "eval.txt"))


@pytest.mark.mesh
def test_mesh_train_and_serve_cli(tmp_path):
    """Multi-device wiring e2e on the virtual CPU mesh: combined training
    with --mesh_data 2 (global batch = 2 contiguous joint slots, grads
    pmean'd over the data axis), snapshot fetched to host, then the test CLI
    serving data-parallel with --mesh_data 2."""
    out = str(tmp_path / "mesh_run")
    from wssdl_bus_tpu.main.train import main as train_main
    run_cli(train_main, [
        "train.py", "--max_iters", "2", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch", "--mesh_data", "2",
        "--set_cfgs", *SMALL_CFGS])
    snaps = [d for d in os.listdir(out) if "_iter_" in d]
    assert snaps, os.listdir(out)
    assert os.path.exists(os.path.join(out, "test", "eval.txt"))

    ckpt = os.path.join(out, sorted(snaps)[-1])
    from wssdl_bus_tpu.main.test import main as test_main
    out2 = str(tmp_path / "mesh_eval")
    run_cli(test_main, [
        "test.py", "--model", ckpt, "--output_dir", out2,
        "--data_dir", DATA, "--mesh_data", "2", "--batch_size", "2",
        "--set_cfgs", *SMALL_CFGS])
    assert os.path.exists(os.path.join(out2, "detections.pkl"))
    assert os.path.exists(os.path.join(out2, "eval.txt"))


def test_eval_batch_cli(tmp_path):
    """Batched in-loop eval (--eval_batch 2 over 5 test images exercises
    the padded tail batch): same artifacts, per-image loss accumulation."""
    out = str(tmp_path / "evalb")
    from wssdl_bus_tpu.main.train import main as train_main
    run_cli(train_main, [
        "train.py", "--max_iters", "2", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch", "--eval_batch", "2",
        "--set_cfgs", *SMALL_CFGS])
    assert os.path.exists(os.path.join(out, "test", "eval.txt"))
    assert os.path.exists(os.path.join(out, "test", "detections.pkl"))
    import pickle
    with open(os.path.join(out, "test", "detections.pkl"), "rb") as f:
        all_boxes = pickle.load(f)
    # every one of the 5 test images got a (possibly empty) detection table
    assert len(all_boxes[1]) == 5
    assert all(isinstance(b, np.ndarray) for b in all_boxes[1])


@pytest.mark.mesh
def test_mesh_alter_cli(tmp_path):
    """Alternating regime under a data-parallel mesh: both the supervised
    parallel step and train_step_mil_parallel run, two optimizer states."""
    out = str(tmp_path / "mesh_alter")
    from wssdl_bus_tpu.main.train_alter import main as alter_main
    run_cli(alter_main, [
        "train_alter.py", "--max_iters", "2", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch", "--mesh_data", "2",
        "--s_start_iter", "0", "--s_end_iter", "2",
        "--ws_start_iter", "0", "--ws_end_iter", "2",
        "--set_cfgs", *SMALL_CFGS])
    assert any("_iter_" in d for d in os.listdir(out))
    assert os.path.exists(os.path.join(out, "test", "eval.txt"))


def test_batched_serving_cli(tmp_path):
    """The batch_size>1 serving path: same artifacts + per-image qualitative
    overlays with GT; five images through a batch-2 compiled step (covers
    the padded tail batch)."""
    out = str(tmp_path / "run")
    from wssdl_bus_tpu.main.train import main as train_main
    run_cli(train_main, [
        "train.py", "--max_iters", "2", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch",
        "--set_cfgs", *SMALL_CFGS])
    snaps = [d for d in os.listdir(out) if "_iter_" in d]
    ckpt = os.path.join(out, sorted(snaps)[-1])

    from wssdl_bus_tpu.main.test import main as test_main
    out2 = str(tmp_path / "eval_batched")
    run_cli(test_main, [
        "test.py", "--model", ckpt, "--output_dir", out2,
        "--data_dir", DATA, "--batch_size", "2", "--qual_res",
        "--set_cfgs", *SMALL_CFGS])
    assert os.path.exists(os.path.join(out2, "eval.txt"))
    qual = os.path.join(out2, "qual")
    assert os.path.isdir(qual) and len(os.listdir(qual)) == 5


def test_int8_eval_cli(tmp_path):
    """--int8 on the test CLI: the quantized trunk drives the full VOC
    eval pipeline (calibration on the evaluated split's images)."""
    out = str(tmp_path / "run")
    from wssdl_bus_tpu.main.train import main as train_main
    run_cli(train_main, [
        "train.py", "--max_iters", "1", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch",
        "--set_cfgs", *SMALL_CFGS, "TRAIN.TEST_ITERS", "5"])
    snaps = [d for d in os.listdir(out) if "_iter_" in d]
    ckpt = os.path.join(out, sorted(snaps)[-1])

    from wssdl_bus_tpu.main.test import main as test_main
    out2 = str(tmp_path / "eval_int8")
    run_cli(test_main, [
        "test.py", "--model", ckpt, "--output_dir", out2,
        "--data_dir", DATA, "--int8", "--calib_images", "3",
        "--batch_size", "2",
        "--set_cfgs", *SMALL_CFGS])
    assert os.path.exists(os.path.join(out2, "detections.pkl"))
    txt = open(os.path.join(out2, "eval.txt")).read()
    for needle in ("AP for benign", "AP for malignant", "Mean AP"):
        assert needle in txt, txt


def test_train_cli_bf16_remat(tmp_path):
    """--bf16 / --remat reach build_detector from the train CLI."""
    out = str(tmp_path / "run")
    from wssdl_bus_tpu.main.train import main as train_main
    run_cli(train_main, [
        "train.py", "--max_iters", "1", "--output_dir", out,
        "--data_dir", DATA, "--no_prefetch", "--bf16", "--remat", "trunk",
        "--set_cfgs", *SMALL_CFGS, "TRAIN.TEST_ITERS", "5"])
    # log.txt appears only at TEST_ITERS cadence (reference behavior);
    # 1 iter -> assert on the snapshot instead
    snaps = [d for d in os.listdir(out) if "_iter_" in d]
    assert snaps, os.listdir(out)
