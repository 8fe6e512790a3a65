"""Unit tests: ImageNet .npy import (ignore-missing semantics) and LR
schedules (const / pc / rop plateau behaviour)."""

import numpy as np
import pytest

from wssdl_bus_tpu.train.schedules import (ConstSchedule, PiecewiseConstant,
                                           ReduceLROnPlateau, build_schedule)


def test_schedules_const_pc():
    assert ConstSchedule(0.1)(99999) == 0.1
    pc = PiecewiseConstant(0.1, max_iters=1000)
    assert pc(0) == 0.1
    # tf.train.piecewise_constant is INCLUSIVE at the boundary
    assert pc(750) == 0.1
    assert pc(751) == pytest.approx(0.01)


def test_rop_reduces_after_patience():
    """Mirrors the reference handler: factor .5, patience 5, eps 1e-3
    (train_bus.py:281)."""
    rop = ReduceLROnPlateau(1.0, verbose=False)
    logs = [10.0]
    rop.on_val_end(logs)          # sets best
    for _ in range(5):            # plateau: wait climbs to patience
        logs.append(10.0)
        rop.on_val_end(logs)
    assert rop(0) == 1.0          # wait == patience, not yet reduced
    logs.append(10.0)
    rop.on_val_end(logs)          # 6th stale epoch -> reduce
    assert rop(0) == 0.5
    # improvement resets the wait
    logs.append(5.0)
    rop.on_val_end(logs)
    assert rop.wait == 0
    assert build_schedule("rop", 1.0, 10).cur_lr == 1.0
    with pytest.raises(NotImplementedError):
        build_schedule("nope", 1.0, 10)


def test_pretrained_npy_roundtrip(tmp_path):
    import jax

    from wssdl_bus_tpu.models.detector import FasterRCNN
    from wssdl_bus_tpu.models.pretrained import load_pretrained_npy

    model = FasterRCNN(backbone="VGGnet")
    variables = model.init_variables(jax.random.PRNGKey(0), (96, 128))

    k11 = np.asarray(
        variables["trunk"]["params"]["backbone"]["conv1_1"]["conv"]["kernel"])
    pretrained = {
        "conv1_1": {"weights": np.full_like(k11, 0.5),
                    "biases": np.full((64,), 0.25, np.float32)},
        # ImageNet fc6 is 4096-wide; ours is 512 -> must be skipped
        "fc6": {"weights": np.zeros((25088, 4096), np.float32),
                "biases": np.zeros((4096,), np.float32)},
        # unknown scope -> skipped
        "fc8": {"weights": np.zeros((4096, 1000), np.float32),
                "biases": np.zeros((1000,), np.float32)},
    }
    path = str(tmp_path / "vgg.npy")
    np.save(path, pretrained, allow_pickle=True)

    out = load_pretrained_npy(path, variables, "VGGnet")
    got = out["trunk"]["params"]["backbone"]["conv1_1"]["conv"]
    assert np.all(np.asarray(got["kernel"]) == 0.5)
    assert np.all(np.asarray(got["bias"]) == 0.25)
    # fc6 untouched (shape mismatch), other layers untouched
    np.testing.assert_array_equal(
        np.asarray(out["head"]["params"]["fc6"]["dense"]["kernel"]),
        np.asarray(variables["head"]["params"]["fc6"]["dense"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(out["trunk"]["params"]["backbone"]["conv1_2"]["conv"]["kernel"]),
        np.asarray(
            variables["trunk"]["params"]["backbone"]["conv1_2"]["conv"]["kernel"]))


def test_pretrained_npy_resnet_nested_scopes(tmp_path):
    """ResNet checkpoints use nested TF scopes (group0/block0/conv1,
    group2/norm — Resnet_train_bus.py:55-101): each must land on ITS OWN
    block (no first-match collapsing), norm gamma/beta must load, and
    moving_mean/variance must reach the batch_stats collection."""
    import jax

    from wssdl_bus_tpu.models.detector import FasterRCNN
    from wssdl_bus_tpu.models.pretrained import load_pretrained_npy

    model = FasterRCNN(backbone="Resnet", depth=18, norm="BN")
    variables = model.init_variables(jax.random.PRNGKey(0), (96, 128))
    bb = variables["trunk"]["params"]["backbone"]

    def shape(p):
        node = bb
        for s in p:
            node = node[s]
        return np.shape(np.asarray(node))

    pretrained = {
        "group0/block0/conv1": {
            "weights": np.full(shape(("group0", "block0", "conv1", "conv",
                                      "kernel")), 0.1, np.float32),
            "gamma": np.full((64,), 2.0, np.float32),
            "moving_mean": np.full((64,), 3.0, np.float32),
        },
        "group0/block1/conv1": {
            "weights": np.full(shape(("group0", "block1", "conv1", "conv",
                                      "kernel")), 0.2, np.float32),
        },
        "group2/norm": {"gamma": np.full((256,), 4.0, np.float32),
                        "beta": np.full((256,), 5.0, np.float32)},
        "conv0": {"weights": np.full(shape(("conv0", "conv", "kernel")),
                                     0.3, np.float32)},
    }
    path = str(tmp_path / "resnet.npy")
    np.save(path, pretrained, allow_pickle=True)

    out = load_pretrained_npy(path, variables, "Resnet")
    ob = out["trunk"]["params"]["backbone"]
    assert np.all(np.asarray(
        ob["group0"]["block0"]["conv1"]["conv"]["kernel"]) == 0.1)
    assert np.all(np.asarray(
        ob["group0"]["block1"]["conv1"]["conv"]["kernel"]) == 0.2)
    assert np.all(np.asarray(
        ob["group0"]["block0"]["conv1"]["bn"]["gamma"]) == 2.0)
    assert np.all(np.asarray(ob["group2_norm"]["gamma"]) == 4.0)
    assert np.all(np.asarray(ob["group2_norm"]["beta"]) == 5.0)
    assert np.all(np.asarray(ob["conv0"]["conv"]["kernel"]) == 0.3)
    # running stats landed in batch_stats, not params
    obs = out["trunk"]["batch_stats"]["backbone"]
    assert np.all(np.asarray(
        obs["group0"]["block0"]["conv1"]["bn"]["mean"]) == 3.0)
    # untouched siblings stay at init
    np.testing.assert_array_equal(
        np.asarray(ob["group1"]["block0"]["conv1"]["conv"]["kernel"]),
        np.asarray(bb["group1"]["block0"]["conv1"]["conv"]["kernel"]))
