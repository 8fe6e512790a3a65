"""Torchvision VGG16 pretrained import (models/pretrained.py).

The normalization fold is EXACT, so the converted trunk must reproduce
torchvision's ``features`` forward on the equivalently-normalized input —
an independent oracle for our conv/pool semantics (SAME-padding 3x3 convs,
VALID 2x2 pools) against torch's (padding=1 convs, floor-mode pools).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torchvision = pytest.importorskip("torchvision")

import jax
import jax.numpy as jnp

from wssdl_bus_tpu.models.pretrained import (load_pretrained_torchvision,
                                             torchvision_vgg16_to_reference)
from wssdl_bus_tpu.models.vgg import VGG16Backbone

PIXEL_MEAN = 68.274
TV_MEAN = (0.485, 0.456, 0.406)
TV_STD = (0.229, 0.224, 0.225)


@pytest.fixture(scope="module")
def tv_vgg():
    torch.manual_seed(0)
    m = torchvision.models.vgg16(weights=None)  # random init, no download
    m.eval()
    return m


def test_forward_equivalence(tv_vgg):
    """Our trunk on the pipeline's VGG input (raw_gray - PIXEL_MEAN,
    replicated x3) == torchvision features on its (x-mean)/std input."""
    h, w = 64, 96
    rng = np.random.RandomState(1)
    x = rng.rand(h, w).astype(np.float32)          # raw grayscale in [0, 1]

    bb = VGG16Backbone(train=False)
    variables = bb.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, h, w, 3), jnp.float32))
    loaded = load_pretrained_torchvision(
        tv_vgg.state_dict(), variables, "VGGnet", min_loaded=26,
        pixel_mean=PIXEL_MEAN)

    y = (x * 255.0 - PIXEL_MEAN)                   # prep_image VGG output
    ours = np.asarray(bb.apply(
        loaded, jnp.asarray(np.tile(y[None, :, :, None], (1, 1, 1, 3)))))

    z = np.stack([(x - mu) / s for mu, s in zip(TV_MEAN, TV_STD)], 0)
    with torch.no_grad():
        # features[:30] = conv1_1 .. relu(conv5_3), before the 5th pool —
        # exactly our backbone's extent (models/vgg.py returns stride 16)
        theirs = torch.nn.Sequential(*list(tv_vgg.features[:30]))(
            torch.from_numpy(z[None]).float()).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))    # NCHW -> NHWC

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_conversion_layout(tv_vgg):
    data = torchvision_vgg16_to_reference(
        {k: v.numpy() for k, v in tv_vgg.state_dict().items()
         if k.startswith("features.")}, pixel_mean=PIXEL_MEAN)
    assert set(data) == {f"conv{i}_{j}" for i, n in
                         zip(range(1, 6), (2, 2, 3, 3, 3))
                         for j in range(1, n + 1)}
    assert data["conv1_1"]["weights"].shape == (3, 3, 3, 64)
    assert data["conv5_3"]["weights"].shape == (3, 3, 512, 512)
    # classifier layers are not emitted (BUS heads train from scratch)
    assert not any("fc" in k or "classifier" in k for k in data)


def test_resnet_rejected(tv_vgg):
    with pytest.raises(ValueError, match="pre-activation"):
        load_pretrained_torchvision(tv_vgg.state_dict(), {}, "Resnet")
