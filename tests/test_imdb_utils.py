"""Tests for the imdb proposal utilities: evaluate_recall and
create_roidb_from_box_list (imdb.py:125-215 parity), plus resume."""

import os

import numpy as np
import pytest

DATA = "/root/reference/SNUBH_BUS"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="SNUBH_BUS samples not present")


def make_imdb():
    from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb

    imdb = get_imdb("bus_test", DATA)
    prepare_roidb(imdb)
    return imdb


def test_evaluate_recall_perfect_candidates():
    imdb = make_imdb()
    # candidates == the gt boxes themselves -> recall 1.0 at every threshold
    cands = [imdb.roidb[i]["boxes"][imdb.roidb[i]["gt_classes"] > 0]
             for i in range(imdb.num_images)]
    res = imdb.evaluate_recall(cands)
    assert res["ar"] == pytest.approx(1.0)
    assert np.all(res["recalls"] == 1.0)
    # garbage candidates -> zero recall
    res0 = imdb.evaluate_recall(
        [np.array([[0, 0, 2, 2]]) for _ in range(imdb.num_images)])
    assert res0["ar"] == pytest.approx(0.0)


def test_create_roidb_from_box_list():
    imdb = make_imdb()
    box_list = [imdb.roidb[i]["boxes"][:1] for i in range(imdb.num_images)]
    prop = imdb.create_roidb_from_box_list(box_list)
    assert len(prop) == imdb.num_images
    e0 = prop[0]
    cls0 = imdb.roidb[0]["gt_classes"][0]
    if cls0 > 0:  # first box is a fg gt -> overlap 1 at its class
        assert e0["gt_overlaps"][0, cls0] == pytest.approx(1.0)
    assert e0["gt_classes"][0] == 0  # proposals carry no labels


def _small_cfg(extra=()):
    from wssdl_bus_tpu.config import Config
    return Config().with_overrides([
        "TRAIN.SCALES", "(96,)", "TRAIN.MAX_SIZE", "160",
        "TEST.SCALES", "(96,)", "TEST.MAX_SIZE", "160",
        "TRAIN.RPN_PRE_NMS_TOP_N", "200", "TRAIN.RPN_POST_NMS_TOP_N", "32",
        "TRAIN.BATCH_SIZE", "16", "TRAIN.RPN_BATCHSIZE", "32",
        "TEST.RPN_PRE_NMS_TOP_N", "100", "TEST.RPN_POST_NMS_TOP_N", "16",
        "TRAIN.SNAPSHOT_ITERS", "2", "TRAIN.TEST_ITERS", "1000",
        "TRAIN.DISPLAY", "1000", *extra,
    ])


def test_solver_resume(tmp_path):
    """Train 2 iters, resume, finish to 3: start_iter restored."""
    import jax

    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.engine import Engine
    from wssdl_bus_tpu.train.solver import Solver

    cfg = _small_cfg()
    from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb
    imdb = get_imdb("bus_test", DATA)
    roidb = prepare_roidb(imdb)
    from wssdl_bus_tpu.data.augment import max_canvas
    canvas = max_canvas([(e["height"], e["width"]) for e in roidb], 96, 160)

    def mk():
        eng = Engine(build_detector("VGGnet_train"), cfg, canvas)
        return Solver(eng, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
                      str(tmp_path), max_iters=2, use_prefetch=False)

    mk().train_combined()
    assert any("_iter_2" in d for d in os.listdir(tmp_path))

    eng2 = Engine(build_detector("VGGnet_train"), cfg, canvas)
    s2 = Solver(eng2, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
                str(tmp_path), max_iters=3, use_prefetch=False, resume=True)
    assert s2.start_iter == 2
    s2.train_combined()
    assert any("_iter_3" in d for d in os.listdir(tmp_path))

    # cross-regime resume: a combined snapshot feeding train_alternating
    # must NOT leak its regime-keyed draw state / loss accumulators —
    # the alternating run starts those fresh (and must not crash)
    eng3 = Engine(build_detector("VGGnet_train"), cfg, canvas, num_ws=0)
    s3 = Solver(eng3, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
                str(tmp_path), max_iters=3, use_prefetch=False, resume=True)
    assert s3._saved_layer_state and "joint" in s3._saved_layer_state
    s3.train_alternating(0, 9, 0, 9)  # start_iter == max_iters: gate only

    # ...and resuming an already-FINISHED run must not overwrite the
    # stored snapshot with this regime's fresh host state (that would
    # destroy the combined run's exact-resume data)
    from wssdl_bus_tpu.train.checkpoint import (latest_checkpoint,
                                                load_host_state)
    host = load_host_state(latest_checkpoint(str(tmp_path)))
    assert "joint" in host["data_layers"]


@pytest.mark.slow  # mesh <-> single-device resume; test_solver_resume covers the
# subsystem in the fast lane
@pytest.mark.mesh
def test_solver_resume_across_topologies(tmp_path):
    """Snapshots are host-fetched before orbax, so a run trained on a
    (2,1) mesh resumes on a single-device Engine and vice versa."""
    import jax

    from wssdl_bus_tpu.data.augment import max_canvas
    from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.parallel import build_engine
    from wssdl_bus_tpu.train.solver import Solver

    cfg = _small_cfg()
    imdb = get_imdb("bus_test", DATA)
    roidb = prepare_roidb(imdb)
    canvas = max_canvas([(e["height"], e["width"]) for e in roidb], 96, 160)

    def mk(mesh_data, max_iters, resume):
        eng = build_engine(build_detector("VGGnet_train"), cfg, canvas,
                           mesh_data, 1)
        return Solver(eng, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
                      str(tmp_path), max_iters=max_iters,
                      use_prefetch=False, resume=resume)

    # train on the mesh, snapshot at iter 2
    mk(2, 2, False).train_combined()
    assert any("_iter_2" in d for d in os.listdir(tmp_path))

    # resume that snapshot single-device
    s2 = mk(1, 3, True)
    assert s2.start_iter == 2
    s2.train_combined()
    assert any("_iter_3" in d for d in os.listdir(tmp_path))

    # and resume the single-device snapshot back onto the mesh
    s3 = mk(2, 4, True)
    assert s3.start_iter == 3
    s3.train_combined()
    assert any("_iter_4" in d for d in os.listdir(tmp_path))


def _assert_trees_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow  # bit-exact trajectory, runs the solver 3x; test_solver_resume covers the
# subsystem in the fast lane
def test_solver_resume_exact_trajectory_combined(tmp_path):
    """--resume reproduces the uninterrupted trajectory BITWISE: a 2-iter
    run snapshotted then resumed to 4 ends with the same params as a
    straight 4-iter run.  The resumed half runs under prefetch, so this
    also proves the Prefetcher's consumption-synchronous draw-state pairing
    (the worker runs up to `depth` batches ahead of what was consumed).
    TEST_ITERS=2 makes every snapshot coincide with an in-loop eval, so
    the snapshot-AFTER-eval ordering (the eval mutates eval_rng, self.key
    and the test-loss log) is part of what must reproduce bitwise."""
    import jax

    from wssdl_bus_tpu.data.augment import max_canvas
    from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.engine import Engine
    from wssdl_bus_tpu.train.solver import Solver

    cfg = _small_cfg(("TRAIN.TEST_ITERS", "2"))
    imdb = get_imdb("bus_test", DATA)
    roidb = prepare_roidb(imdb)
    canvas = max_canvas([(e["height"], e["width"]) for e in roidb], 96, 160)

    def mk(out, max_iters, resume, prefetch):
        eng = Engine(build_detector("VGGnet_train"), cfg, canvas)
        return Solver(eng, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
                      str(tmp_path / out), max_iters=max_iters,
                      use_prefetch=prefetch, resume=resume)

    sa = mk("straight", 4, False, False)
    sa.train_combined()
    ref_vars = jax.device_get(sa.variables)

    sb = mk("resumed", 2, False, True)
    sb.train_combined()
    sc = mk("resumed", 4, True, True)
    assert sc.start_iter == 2
    sc.train_combined()
    _assert_trees_equal(ref_vars, jax.device_get(sc.variables))
    _assert_trees_equal(np.asarray(sa.key), np.asarray(sc.key))


@pytest.mark.slow  # bit-exact alternating trajectory, the lane's slowest test; test_solver_resume covers the
# subsystem in the fast lane
def test_solver_resume_exact_trajectory_alternating(tmp_path):
    """Alternating-regime exactness: the resumed run restores BOTH data
    layers' draw state, the WS-update counter (MIL decay), the
    carry-forward loss vector, and the second optimizer's moments — final
    params bitwise-match an uninterrupted run.  The interrupted+resumed
    runs prefetch on both layers (consumption-synchronous pairing for two
    independent streams); the straight run does not, which also proves
    prefetch never changes the trajectory."""
    import jax

    from wssdl_bus_tpu.data.augment import max_canvas
    from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.engine import Engine
    from wssdl_bus_tpu.train.solver import Solver

    cfg = _small_cfg()
    imdb = get_imdb("bus_test", DATA)
    roidb = prepare_roidb(imdb)
    canvas = max_canvas([(e["height"], e["width"]) for e in roidb], 96, 160)

    def mk(out, max_iters, resume, prefetch):
        eng = Engine(build_detector("VGGnet_train"), cfg, canvas, num_ws=0)
        return Solver(eng, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
                      str(tmp_path / out), max_iters=max_iters,
                      use_prefetch=prefetch, resume=resume)

    sa = mk("straight", 4, False, False)
    sa.train_alternating(0, 9, 0, 9)
    ref_vars = jax.device_get(sa.variables)

    sb = mk("resumed", 2, False, True)
    sb.train_alternating(0, 9, 0, 9)
    sc = mk("resumed", 4, True, True)
    assert sc.start_iter == 2
    sc.train_alternating(0, 9, 0, 9)
    _assert_trees_equal(ref_vars, jax.device_get(sc.variables))


def test_get_test_roidb_and_data_layer_factory():
    """Function-level API parity: get_test_roidb (test_bus.py:416) and
    get_data_layer (train_bus.py:1037)."""
    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.data import get_data_layer, get_imdb, get_test_roidb

    imdb = get_imdb("bus_test", DATA)
    roidb = get_test_roidb(imdb)
    assert len(roidb) == imdb.num_images
    assert all("max_overlaps" in e and "image" in e for e in roidb)

    cfg = Config().with_overrides([
        "TRAIN.SCALES", "(150,)", "TRAIN.MAX_SIZE", "250"])
    canvas = (160, 256)
    rng = np.random.RandomState(0)
    layer = get_data_layer(roidb, "VGGnet_train", cfg, canvas,
                           is_training=True, is_ws=False, rng=rng)
    blobs = layer.forward()
    assert blobs["data"].shape[0] == cfg.TRAIN.IMS_PER_BATCH
    joint = get_data_layer((roidb, roidb), "VGGnet_train", cfg, canvas,
                           is_training=True, is_joint=True, rng=rng)
    blobs = joint.forward()
    assert blobs["data"].shape[0] == (cfg.TRAIN.IMS_PER_BATCH
                                      + cfg.TRAIN.WS_IMS_PER_BATCH)


@pytest.mark.slow  # alternating two-optimizer resume; test_solver_resume covers the
# subsystem in the fast lane
def test_solver_resume_alternating_ws_state(tmp_path):
    """Alternating-regime resume: snapshots carry the WS optimizer state and
    host state (schedule, key stream), and resume restores them."""
    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.data.augment import max_canvas
    from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.checkpoint import load_host_state
    from wssdl_bus_tpu.train.engine import Engine
    from wssdl_bus_tpu.train.solver import Solver

    cfg = Config().with_overrides([
        "TRAIN.SCALES", "(96,)", "TRAIN.MAX_SIZE", "160",
        "TEST.SCALES", "(96,)", "TEST.MAX_SIZE", "160",
        "TRAIN.RPN_PRE_NMS_TOP_N", "200", "TRAIN.RPN_POST_NMS_TOP_N", "32",
        "TRAIN.BATCH_SIZE", "16", "TRAIN.RPN_BATCHSIZE", "32",
        "TEST.RPN_PRE_NMS_TOP_N", "100", "TEST.RPN_POST_NMS_TOP_N", "16",
        "TRAIN.SNAPSHOT_ITERS", "2", "TRAIN.TEST_ITERS", "1000",
        "TRAIN.DISPLAY", "1000",
    ])
    imdb = get_imdb("bus_test", DATA)
    roidb = prepare_roidb(imdb)
    canvas = max_canvas([(e["height"], e["width"]) for e in roidb], 96, 160)

    eng = Engine(build_detector("VGGnet_train"), cfg, canvas, num_ws=0)
    s = Solver(eng, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
               str(tmp_path), max_iters=2, use_prefetch=False)
    s.train_alternating(0, 9, 0, 9)
    snap = os.path.join(str(tmp_path), sorted(
        d for d in os.listdir(tmp_path) if "_iter_2" in d)[-1])
    assert os.path.isdir(os.path.join(snap, "opt_state_ws"))
    host = load_host_state(snap)
    assert host is not None and "schedule" in host and "key" in host
    assert "ws_step" in host and host["ws_step"] >= 1  # MIL scale resumes

    eng2 = Engine(build_detector("VGGnet_train"), cfg, canvas, num_ws=0)
    s2 = Solver(eng2, cfg, "VGGnet_train", roidb, roidb, imdb, roidb,
                str(tmp_path), max_iters=3, use_prefetch=False, resume=True)
    assert s2.start_iter == 2
    s2.train_alternating(0, 9, 0, 9)
    assert any("_iter_3" in d for d in os.listdir(tmp_path))
