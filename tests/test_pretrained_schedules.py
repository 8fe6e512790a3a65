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
    assert pc(749) == 0.1
    assert pc(750) == pytest.approx(0.01)


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
