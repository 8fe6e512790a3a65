"""Torchvision-format VGG16 pretrained import (models/pretrained.py).

torchvision itself is not installed here, so the oracle builds the SAME
``features`` stack with plain torch (torchvision's make_layers "D" config —
indices, shapes and state_dict keys are identical to
``torchvision.models.vgg16().features``), random-initialized.  The
normalization fold is exact wherever a conv window lies inside the image
(borders differ by zero-padding convention — see
torchvision_vgg16_to_reference), so the converted trunk must reproduce the
torch forward on the equivalently-normalized input — an independent oracle
for our conv/pool semantics (SAME-padding 3x3 convs, VALID 2x2 pools)
against torch's (padding=1 convs, floor-mode pools).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from wssdl_bus_tpu.models.pretrained import (load_pretrained_torchvision,
                                             torchvision_vgg16_to_reference)
from wssdl_bus_tpu.models.vgg import VGG16Backbone

PIXEL_MEAN = 68.274
TV_MEAN = (0.485, 0.456, 0.406)
TV_STD = (0.229, 0.224, 0.225)

# torchvision.models.vgg.cfgs["D"] — vgg16
_CFG_D = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M"]


class _TVStyleVGG16(torch.nn.Module):
    """torchvision.models.vgg16's ``features`` topology, rebuilt with plain
    torch so the test runs without torchvision; state_dict keys
    (``features.{0,2,5,...}.weight``) match torchvision's exactly."""

    def __init__(self):
        super().__init__()
        layers, c = [], 3
        for v in _CFG_D:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers += [torch.nn.Conv2d(c, v, 3, padding=1),
                           torch.nn.ReLU(inplace=True)]
                c = v
        self.features = torch.nn.Sequential(*layers)


@pytest.fixture(scope="module")
def tv_vgg():
    torch.manual_seed(0)
    m = _TVStyleVGG16()
    m.eval()
    return m


def test_forward_equivalence(tv_vgg):
    """Our trunk on the pipeline's VGG input (raw_gray - PIXEL_MEAN,
    replicated x3) == the torch features stack on its (x-mean)/std input."""
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


def test_fold_is_exact_on_conv1_interior(tv_vgg):
    """conv1_1's folded output on our input == the original conv on the
    torch-normalized input, EXACTLY, wherever the 3x3 window lies inside
    the image.  The 1-px border is excluded: both pipelines zero-pad in
    their own input space, and zero-in-pixel-space != zero-in-normalized-
    space, so borders differ by the folded shift times the out-of-image
    taps (documented in torchvision_vgg16_to_reference)."""
    sd = {k: v.numpy() for k, v in tv_vgg.state_dict().items()
          if k.startswith("features.")}
    data = torchvision_vgg16_to_reference(sd, pixel_mean=PIXEL_MEAN)
    rng = np.random.RandomState(2)
    x = rng.rand(16, 16).astype(np.float32)
    y = np.tile((x * 255.0 - PIXEL_MEAN)[None, :, :, None], (1, 1, 1, 3))
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(y), jnp.asarray(data["conv1_1"]["weights"]),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ours = np.asarray(ours) + data["conv1_1"]["biases"]
    z = np.stack([(x - mu) / s for mu, s in zip(TV_MEAN, TV_STD)], 0)
    with torch.no_grad():
        theirs = tv_vgg.features[0](
            torch.from_numpy(z[None]).float()).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    np.testing.assert_allclose(ours[:, 1:-1, 1:-1], theirs[:, 1:-1, 1:-1],
                               rtol=1e-4, atol=1e-5)
    # and the border mismatch is the documented convention difference,
    # not an accident: it is bounded by |shift| * sum|W| per channel
    border_diff = np.abs(ours - theirs)[:, [0, -1], :, :].max()
    assert border_diff > 1e-3  # genuinely different conventions


def test_auto_dispatch_pth_file(tv_vgg, tmp_path):
    """The Solver's --pretrained_model path: a saved .pth round-trips
    through torch.load(weights_only=True) and loads all 26 conv arrays."""
    from wssdl_bus_tpu.models.pretrained import load_pretrained_auto
    p = str(tmp_path / "vgg16.pth")
    torch.save(tv_vgg.state_dict(), p)
    bb = VGG16Backbone(train=False)
    variables = bb.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3), jnp.float32))
    loaded = load_pretrained_auto(p, variables, "VGGnet", min_loaded=26,
                                  pixel_mean=PIXEL_MEAN)
    ref = torchvision_vgg16_to_reference(
        {k: v.numpy() for k, v in tv_vgg.state_dict().items()
         if k.startswith("features.")}, pixel_mean=PIXEL_MEAN)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["conv3_1"]["conv"]["kernel"]),
        ref["conv3_1"]["weights"])


def test_resnet_rejected(tv_vgg):
    with pytest.raises(ValueError, match="pre-activation"):
        load_pretrained_torchvision(tv_vgg.state_dict(), {}, "Resnet")


def test_non_vgg16_layout_rejected(tv_vgg):
    """A vgg16_bn-style state_dict (conv indices shifted by the BN modules)
    must fail with a clear diagnostic, not a KeyError."""
    sd = {k: v for k, v in tv_vgg.state_dict().items()}
    sd["features.1.weight"] = sd.pop("features.2.weight")  # bn-ish shift
    with pytest.raises(ValueError, match="vgg16"):
        torchvision_vgg16_to_reference(sd, pixel_mean=PIXEL_MEAN)
