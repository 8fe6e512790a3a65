"""Post-training int8 quantization of the VGG16 trunk for serving.

TPU MXUs execute s8 x s8 -> s32 matmul passes at twice the bf16 peak
rate, and the serving pipeline's FLOPs are almost entirely the trunk
convolutions, so an int8 trunk is the one lever that can move the
inference roofline itself (bf16 compute is throughput-neutral here —
XLA already lowers default-precision f32 convs to bf16 MXU passes, see
bench.py).  The TF1 reference has no quantized path (serving re-runs the
float training graph against a checkpoint, test_bus.py:300-413); this is
an additive TPU-native capability, OFF by default.

Scheme: symmetric linear quantization, chosen for the TPU MXU (no
zero-point cross terms):

* weights per-output-channel: ``s_w[o] = absmax(K[..., o]) / 127``,
  quantized once offline;
* activations per-tensor from a calibration pass: each conv input uses
  scale ``s_x = absmax / 127`` where absmax is observed over a
  calibration set.  VGG's trunk is a pure conv/relu/max-pool chain, and
  a 2x2 max-pool of ReLU (>= 0) outputs preserves the tensor absmax
  exactly, so the recorded output absmax of conv ``i`` IS the input
  absmax of conv ``i+1`` — 13 scalars plus one for the input image.

Each quantized layer computes ``relu(conv_s8(q(x), q(K)) * (s_x * s_w)
+ b)`` with the conv accumulating in int32 (``preferred_element_type``)
and everything after it in f32; the chain requantizes into the next
layer's scale.  The RPN conv heads and the RCNN head stay float32 (they
are a rounding error of the FLOPs), as does all detection geometry.

Only the VGG backbone is quantized: ResNet's per-ROI conv head dominates
its serving cost and its preact BN/GN blocks need per-block requant
calibration that the accuracy budget here doesn't justify.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.models.layers import ConvBlock, max_pool

# (conv name, 2x2 VALID max-pool after it) — the VGG16Backbone chain
# (models/vgg.py:28-45; reference VGGnet_train_bus.py:45-61)
VGG_LAYERS = (
    ("conv1_1", False), ("conv1_2", True),
    ("conv2_1", False), ("conv2_2", True),
    ("conv3_1", False), ("conv3_2", False), ("conv3_3", True),
    ("conv4_1", False), ("conv4_2", False), ("conv4_3", True),
    ("conv5_1", False), ("conv5_2", False), ("conv5_3", False),
)


def _quantize(x, scale):
    """Symmetric int8: clip(round(x / scale)) in [-127, 127]."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def calibrate_vgg_trunk(model, variables, batches) -> dict:
    """Observe per-conv-input absmax over ``batches`` (iterable of
    [B, H, W, 3] image arrays, already preprocessed like serving inputs).

    Returns ``{"data": m, "conv1_1": m, ...}`` where every value is the
    recorded ABSMAX (not yet divided by 127) of that tensor: ``data`` is
    the network input, ``conv1_1``... are ConvBlock outputs, i.e. the
    inputs of the NEXT conv in the chain (max-pools preserve the absmax
    of ReLU outputs, module docstring)."""
    trunk = model._trunk(train=False)

    @jax.jit
    def absmaxes(data):
        _, state = trunk.apply(
            variables["trunk"], data,
            capture_intermediates=lambda mdl, _: isinstance(mdl, ConvBlock),
            mutable=["intermediates"])
        conv_outs = state["intermediates"]["backbone"]
        out = {"data": jnp.max(jnp.abs(data))}
        for name, _ in VGG_LAYERS:
            out[name] = jnp.max(jnp.abs(conv_outs[name]["__call__"][0]))
        return out

    scales: dict = {}
    for data in batches:
        m = jax.device_get(absmaxes(jnp.asarray(data)))
        for k, v in m.items():
            scales[k] = max(scales.get(k, 0.0), float(v))
    for k, v in scales.items():
        if v <= 0.0:
            raise ValueError(f"calibration absmax for {k!r} is {v}; the "
                             "calibration set never activated this layer")
    return scales


def quantize_vgg_trunk(variables, act_scales: dict) -> dict:
    """Quantize the VGG trunk params offline -> a serving pytree.

    ``act_scales`` comes from :func:`calibrate_vgg_trunk` (absmax per
    tensor).  The result holds per layer: the int8 kernel, the fused
    dequant scale ``s_x * s_w`` [Cout], the f32 bias, and the input
    scale ``s_x`` (scalar); plus the untouched f32 RPN-head params."""
    params = variables["trunk"]["params"]
    backbone = params["backbone"]
    layers = []
    prev = "data"
    for name, _ in VGG_LAYERS:
        kernel = np.asarray(backbone[name]["conv"]["kernel"], np.float32)
        bias = np.asarray(backbone[name]["conv"]["bias"], np.float32)
        in_scale = np.float32(act_scales[prev] / 127.0)
        w_absmax = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)),
                              np.finfo(np.float32).tiny)
        w_scale = (w_absmax / 127.0).astype(np.float32)
        qkernel = np.clip(np.round(kernel / w_scale), -127, 127) \
            .astype(np.int8)
        layers.append({
            "qkernel": jnp.asarray(qkernel),
            "scale": jnp.asarray(in_scale * w_scale),
            "bias": jnp.asarray(bias),
            "in_scale": jnp.asarray(in_scale),
        })
        prev = name
    rpn = {k: jax.tree.map(jnp.asarray, dict(params[k]))
           for k in ("rpn_conv", "rpn_cls_score", "rpn_bbox_pred")}
    return {"layers": layers, "rpn": rpn}


def _conv(x, kernel, padding, **kw):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kernel, (1, 1), padding,
                                        dimension_numbers=dn, **kw)


class QuantServingEngine:
    """Duck-types the Engine serving surface (``.cfg`` / ``.canvas_hw`` /
    ``.inference_step``) with the int8 trunk swapped in, so every host-side
    serving path (``evaluate.detect.test_net`` / ``im_detect[_batch]``)
    evaluates the QUANTIZED model unchanged — that's how int8-vs-f32
    mAP/CorLoc parity is measured (``main/test.py --int8``)."""

    def __init__(self, eng, qtrunk):
        self._eng = eng
        self._qtrunk = qtrunk
        self.cfg = eng.cfg
        self.canvas_hw = eng.canvas_hw

    def inference_step(self, variables, data, im_info):
        return self._eng.inference_step_quant(self._qtrunk, variables,
                                              data, im_info)


def quant_trunk_apply(qtrunk, data):
    """Quantized trunk + f32 RPN heads ->
    (feat, rpn_cls_score, rpn_bbox_pred); drop-in for the VGG branch of
    ``FasterRCNN.apply_trunk(train=False)`` (models/detector.py:43-60)."""
    x = data
    for (_, pool), layer in zip(VGG_LAYERS, qtrunk["layers"]):
        xq = _quantize(x, layer["in_scale"])
        acc = _conv(xq, layer["qkernel"], "SAME",
                    preferred_element_type=jnp.int32)
        y = jax.nn.relu(acc.astype(jnp.float32) * layer["scale"]
                        + layer["bias"])
        x = max_pool(y, 2, 2, "VALID") if pool else y
    feat = x
    rpn = qtrunk["rpn"]
    h = jax.nn.relu(_conv(feat, rpn["rpn_conv"]["conv"]["kernel"], "SAME")
                    + rpn["rpn_conv"]["conv"]["bias"])
    cls = _conv(h, rpn["rpn_cls_score"]["conv"]["kernel"], "VALID") \
        + rpn["rpn_cls_score"]["conv"]["bias"]
    bbox = _conv(h, rpn["rpn_bbox_pred"]["conv"]["kernel"], "VALID") \
        + rpn["rpn_bbox_pred"]["conv"]["bias"]
    return feat, cls, bbox
