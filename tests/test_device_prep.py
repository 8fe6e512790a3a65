"""Oracle tests for the device-side image preparation path
(ops/device_prep.py + the raw staging blobs of data/minibatch.py):
the device-finished blob must reproduce the classic host-prepared blob
under IDENTICAL RNG draws, and the train step must accept the staged
layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_engine import tiny_cfg
from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.data.minibatch import get_minibatch, get_minibatch_joint
from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.ops.device_prep import (net_divisor_for,
                                           prep_device_batch)
from wssdl_bus_tpu.train.engine import Engine

CANVAS = (96, 128)
RAW = (72, 96)


def synth_roidb(rng, n=3, hw=(64, 90)):
    """Synthetic uint8 'dataset' entries backed by temp files on demand."""
    entries = []
    for i in range(n):
        h = hw[0] - 3 * i
        w = hw[1] - 5 * i
        entries.append({
            "image": None,  # filled by _write below
            "_array": (rng.rand(h, w) * 255).astype(np.uint8),
            "flipped": False,
            "boxes": np.array([[5, 5, 40, 30]], np.float32),
            "gt_classes": np.array([1], np.int64),
            "birads_diag": 1 + (i % 2),
            "height": h, "width": w,
        })
    return entries


@pytest.fixture()
def roidb(rng, tmp_path):
    from PIL import Image
    entries = synth_roidb(rng)
    for i, e in enumerate(entries):
        p = str(tmp_path / f"im{i}.tif")
        Image.fromarray(e.pop("_array")).save(p)
        e["image"] = p
    return entries


def small_cfg():
    # a single train scale + a test scale that keeps everything on the
    # tiny canvas; photometric augmentation ON so its device path is
    # exercised
    return tiny_cfg().with_overrides([
        "TRAIN.SCALES", "(80,)", "TRAIN.MAX_SIZE", "120",
        "TEST.SCALES", "(80,)", "TEST.MAX_SIZE", "120",
        "ANCHOR_SCALES", "(2,4,8)",
    ])


def _device_finish(blobs, cfg, net_name):
    return np.asarray(prep_device_batch(
        jnp.asarray(blobs["raw"]), jnp.asarray(blobs["prep"]), CANVAS,
        cfg.PIXEL_MEAN / 255.0,
        net_divisor_for(net_name, cfg.PIXEL_STD)))


@pytest.mark.parametrize("net_name", ["VGGnet_train", "Resnet_train"])
def test_supervised_matches_host_blob(roidb, net_name):
    """Unrotated (supervised) images: uint8 staging is exact and the
    device resize matches the native/PIL convention -> the device blob
    reproduces the host blob to float rounding."""
    cfg = small_cfg()
    host = get_minibatch(roidb, net_name, cfg, CANVAS, True, False,
                         np.random.RandomState(5))
    dev = get_minibatch(roidb, net_name, cfg, CANVAS, True, False,
                        np.random.RandomState(5), raw_hw=RAW)
    # identical draw streams -> identical geometry/targets
    np.testing.assert_array_equal(host["gt_boxes"], dev["gt_boxes"])
    np.testing.assert_array_equal(host["im_info"], dev["im_info"])
    assert dev["raw"].dtype == np.uint8 and dev["raw"].shape[1:] == RAW
    got = _device_finish(dev, cfg, net_name)
    # tolerance: resize ~4e-6 relative (measured) x the net scale (x255
    # for VGG; /(std/255) ~ x435 for ResNet, PIXEL_STD default)
    np.testing.assert_allclose(got, host["data"], atol=6e-3)


def test_ws_rotated_matches_host_blob(roidb):
    """ws images add rotation (re-quantized to uint8, <= 1/510) and
    cropping; the device blob stays within the documented bound."""
    cfg = small_cfg()
    host = get_minibatch(roidb, "VGGnet_train", cfg, CANVAS, True, True,
                         np.random.RandomState(7))
    dev = get_minibatch(roidb, "VGGnet_train", cfg, CANVAS, True, True,
                        np.random.RandomState(7), raw_hw=RAW)
    np.testing.assert_array_equal(host["im_info"], dev["im_info"])
    got = _device_finish(dev, cfg, "VGGnet_train")
    # 0.5/255 quantization x contrast <= 1.8 x net scale 255 ~ 0.9, plus
    # interpolation mixing -> 1.2 absolute in VGG units (~0.5% of range)
    np.testing.assert_allclose(got, host["data"], atol=1.2)
    assert np.abs(got - host["data"]).mean() < 0.2


def test_joint_device_blob_and_train_step(roidb):
    """The joint staged batch drives the full jitted train step; its
    losses track the host-path losses under identical draws."""
    cfg = small_cfg()
    host = get_minibatch_joint(roidb[:1], roidb[1:], "VGGnet_train", cfg,
                               CANVAS, np.random.RandomState(9))
    dev = get_minibatch_joint(roidb[:1], roidb[1:], "VGGnet_train", cfg,
                              CANVAS, np.random.RandomState(9), raw_hw=RAW)
    assert set(dev) == {"raw", "prep", "gt_boxes", "num_gt_boxes",
                       "im_info"}
    np.testing.assert_array_equal(host["gt_boxes"], dev["gt_boxes"])

    eng = Engine(FasterRCNN(backbone="VGGnet"), cfg, CANVAS,
                 num_supervised=1, num_ws=2)
    variables, opt_state = eng.init(jax.random.PRNGKey(0))
    key, lr, st = jax.random.PRNGKey(1), jnp.float32(5e-4), jnp.int32(0)
    _, _, ls_host = eng.train_step(variables, opt_state,
                                   {k: jnp.asarray(v)
                                    for k, v in host.items()}, key, lr, st)
    _, _, ls_dev = eng.train_step(variables, opt_state,
                                  {k: jnp.asarray(v)
                                   for k, v in dev.items()}, key, lr, st)
    for h, d in zip(ls_host, ls_dev):
        h, d = float(h), float(d)
        assert np.isfinite(d)
        assert abs(h - d) < 5e-2 + 0.05 * abs(h), (ls_host, ls_dev)


def test_loader_device_prep_layout(roidb):
    """RoIDataLayerJoint(device_prep=True) derives the raw canvas from
    the roidb and emits staged blobs; resume state is unaffected."""
    from wssdl_bus_tpu.data.loader import RoIDataLayerJoint
    cfg = small_cfg()
    layer = RoIDataLayerJoint(roidb, roidb, "VGGnet_train", cfg, CANVAS,
                              rng=np.random.RandomState(3),
                              device_prep=True)
    assert layer.raw_hw[0] >= max(e["height"] for e in roidb)
    assert layer.raw_hw[1] >= max(e["width"] for e in roidb)
    blobs = layer.forward()
    assert blobs["raw"].shape == (3, *layer.raw_hw)
    assert blobs["prep"].shape == (3, 8)
    sd = layer.state_dict()
    layer2 = RoIDataLayerJoint(roidb, roidb, "VGGnet_train", cfg, CANVAS,
                               rng=np.random.RandomState(3),
                               device_prep=True)
    layer2.load_state_dict(sd)
    b1, b2 = layer.forward(), layer2.forward()
    np.testing.assert_array_equal(b1["raw"], b2["raw"])
    np.testing.assert_array_equal(b1["prep"], b2["prep"])
