"""Post-training int8 quantization for serving: the VGG16 trunk, and the
ResNet trunk + per-ROI group3 head (second section below).

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

This first section covers VGG (trunk-only: the fc head is a rounding
error of its FLOPs).  The ResNet section below quantizes both the trunk
and the group3 per-ROI conv head, which dominates ResNet serving cost.
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


def _conv(x, kernel, padding, stride=1, **kw):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kernel, (stride, stride), padding,
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


# --------------------------------------------------------------------- #
# ResNet int8 serving: trunk AND the per-ROI group3 head.
#
# The ResNet serving cost is dominated by convolutions on both sides of
# the ROI pool (trunk ~1.65 ms/img + group3 head ~1.28 ms/img at batch 8,
# tools/profile_resnet_head.py), so unlike VGG (fc head, trunk-only
# quantization) both parts are quantized.  Scheme is identical to the VGG
# path above (symmetric per-output-channel weights, per-tensor activation
# absmax from calibration, int8 x int8 -> int32 accumulation); the
# serving-mode BatchRenorm (running statistics -> a per-channel affine
# y*g + c) is FOLDED into each conv's dequant scale/bias, standalone
# preact norms stay float32 elementwise.  GroupNorm is data-dependent
# (not an affine at serving time) and is rejected.
#
# The network structure is walked by ONE function (`_walk_resnet`) shared
# by three modes — f32 reference, calibration recording, int8 — so the
# quantized path cannot drift structurally from the flax modules; the f32
# walk is pinned against `ResNetBackbone`/`ResNetRCNNHead` in
# tests/test_quantize.py.  Reference graph: Resnet_train_bus.py:55-101,
# block functions network.py:418-468 (mirrored by models/resnet.py).
# --------------------------------------------------------------------- #
from wssdl_bus_tpu.models.resnet import RESNET_DEFS  # noqa: E402


def _bn_affine(scope: dict, stats: dict, eps: float = 1e-3):
    """Serving-mode BatchRenorm -> per-channel (g, c): y = x*g + c
    (BatchRenorm.use_running_average branch; epsilon 1e-3).  jnp ops so it
    works both offline (concrete arrays) and inside a traced walk."""
    g = jnp.asarray(scope["gamma"], jnp.float32)
    b = jnp.asarray(scope["beta"], jnp.float32)
    mean = jnp.asarray(stats["mean"], jnp.float32)
    var = jnp.asarray(stats["var"], jnp.float32)
    inv = jax.lax.rsqrt(var + eps)
    return g * inv, b - mean * g * inv


class _ResnetF32:
    """f32 walk ops (reference + calibration).  ``params``/``stats`` are the
    flax subtrees for one part ('backbone' scope for the trunk, head params
    root for the head); ``record`` (optional dict) collects per-conv-input
    absmaxes keyed by conv path."""

    def __init__(self, params, stats, norm, record=None):
        self.p, self.s, self.norm, self.rec = params, stats, norm, record

    def _scope(self, path):
        node_p, node_s = self.p, self.s
        for part in path.split("/"):
            node_p = node_p[part]
            node_s = None if node_s is None else node_s.get(part)
        return node_p, node_s

    def conv(self, path, x, stride, relu):
        if self.rec is not None:
            # traced absmax: the calibration walk runs under jit and the
            # caller device_gets the whole record dict at once
            self.rec[path] = jnp.max(jnp.abs(x))
        scope, stats = self._scope(path)
        y = _conv(x, scope["conv"]["kernel"], "SAME", stride=stride)
        if self.norm == "BN":
            g, c = _bn_affine(scope["bn"], stats["bn"])
            y = y * g + c
        else:
            y = y + scope["conv"]["bias"]
        return jax.nn.relu(y) if relu else y

    def prenorm(self, path, x):
        """Standalone norm + relu (block preact / group2_norm /
        group3_norm); identity norm when norm is None (resnet.py:_norm)."""
        if self.norm == "BN":
            scope, stats = self._scope(path)
            g, c = _bn_affine(scope, stats)
            x = x * g + c
        return jax.nn.relu(x)


class _ResnetInt8:
    """int8 walk ops over a quantized pytree from `quantize_resnet_part`."""

    def __init__(self, qpart, norm):
        self.q, self.norm = qpart, norm

    def conv(self, path, x, stride, relu):
        l = self.q["layers"][path]
        xq = _quantize(x, l["in_scale"])
        acc = _conv(xq, l["qkernel"], "SAME", stride=stride,
                    preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * l["scale"] + l["bias"]
        return jax.nn.relu(y) if relu else y

    def prenorm(self, path, x):
        if self.norm == "BN":
            a = self.q["norms"][path]
            x = x * a["g"] + a["c"]
        return jax.nn.relu(x)


def _walk_block(ops, x, bpath, features, stride, preact, kind):
    """Mirror of models/resnet.py:_Block (network.py:424-457 quirks
    included: shortcut input taken before/after the preact per mode)."""
    c_in = x.shape[-1]
    if preact == "both_preact":
        x = ops.prenorm(f"{bpath}/preact_prev", x)
        x_ori = x
    elif preact != "no_preact":
        x_ori = x
        x = ops.prenorm(f"{bpath}/preact_prev", x)
    else:
        x_ori = x
    if kind == "basic":
        y = ops.conv(f"{bpath}/conv1", x, stride, relu=True)
        y = ops.conv(f"{bpath}/conv2", y, 1, relu=False)
        c_out = features
    else:
        y = ops.conv(f"{bpath}/conv1", x, 1, relu=True)
        y = ops.conv(f"{bpath}/conv2", y, stride, relu=True)
        y = ops.conv(f"{bpath}/conv3", y, 1, relu=False)
        c_out = features * 4
    if c_in != c_out:
        sc = ops.conv(f"{bpath}/convshortcut", x_ori, stride, relu=False)
    else:
        sc = x_ori
    return y + sc


def _walk_group(ops, x, gpath, features, count, stride, first, kind):
    x = _walk_block(ops, x, f"{gpath}/block0", features, stride,
                    "no_preact" if first else "both_preact", kind)
    for i in range(1, count):
        x = _walk_block(ops, x, f"{gpath}/block{i}", features, 1,
                        "default", kind)
    return x


def _walk_resnet_trunk(ops, data, depth):
    defs, kind = RESNET_DEFS[depth]
    x = ops.conv("conv0", data, 2, relu=True)
    x = max_pool(x, 3, 2, "VALID")
    x = _walk_group(ops, x, "group0", 64, defs[0], 1, True, kind)
    x = _walk_group(ops, x, "group1", 128, defs[1], 2, False, kind)
    x = _walk_group(ops, x, "group2", 256, defs[2], 2, False, kind)
    return ops.prenorm("group2_norm", x)


def _walk_resnet_head_group(ops, roi_feats, depth):
    defs, kind = RESNET_DEFS[depth]
    x = _walk_group(ops, roi_feats, "group3", 512, defs[3], 2, False, kind)
    return ops.prenorm("group3_norm", x)


def _resnet_conv_paths(depth, part):
    """Conv paths of one part in execution order (used by quantization).
    A block0 has a convshortcut only when its channel count changes
    (models/resnet.py:_Block: c_in != c_out) — e.g. basic group0/block0
    (64 -> 64) has none."""
    defs, kind = RESNET_DEFS[depth]
    mult = 1 if kind == "basic" else 4
    names = ("conv1", "conv2") if kind == "basic" else \
        ("conv1", "conv2", "conv3")
    paths = []
    if part == "trunk":
        paths.append("conv0")
        c_in = 64
        groups = [("group0", defs[0], 64), ("group1", defs[1], 128),
                  ("group2", defs[2], 256)]
    else:
        c_in = 256 * mult  # group2 output feeds the ROI head
        groups = [("group3", defs[3], 512)]
    for gpath, count, features in groups:
        c_out = features * mult
        for i in range(count):
            paths += [f"{gpath}/block{i}/{n}" for n in names]
            if i == 0 and c_in != c_out:
                paths.append(f"{gpath}/block0/convshortcut")
        c_in = c_out
    return paths


def _resnet_norm_paths(depth, part):
    """Standalone (non-folded) norm paths of one part."""
    defs, _ = RESNET_DEFS[depth]
    if part == "trunk":
        groups = [("group0", defs[0], True), ("group1", defs[1], False),
                  ("group2", defs[2], False)]
        extra = ["group2_norm"]
    else:
        groups = [("group3", defs[3], False)]
        extra = ["group3_norm"]
    paths = []
    for gpath, count, first in groups:
        for i in range(count):
            if i == 0 and first:
                continue  # group0/block0 is no_preact
            paths.append(f"{gpath}/block{i}/preact_prev")
    return paths + extra


def calibrate_resnet(model, variables, batches, calib_rois=None,
                     spatial_scale=1.0 / 16.0) -> dict:
    """Observe per-conv-input absmaxes for trunk AND head.

    ``batches`` iterates preprocessed [B, H, W, 3] serving inputs.  The
    head sees ROI-pooled features; ``calib_rois`` optionally supplies
    [B, R, 4] boxes per batch — default is one full-image box per image.
    The full-image pool dominates every sub-ROI's range only at the FIRST
    group3 conv input (ROI max-pooling selects from the same feature map);
    deeper group3 activations under real sub-ROIs are not bounded by the
    full-image walk, so for tight head ranges prefer ``calib_rois`` with
    RPN-proposal-like boxes (the serving accuracy contract is pinned by
    tests/test_quantize.py's detection-tracking tests either way).
    ``spatial_scale`` must match the serving head's ROI pooling geometry
    (the Engine passes ``1.0 / cfg.FEAT_STRIDE``, engine.py:_pool_for_head).
    """
    if model.norm not in (None, "BN"):
        raise NotImplementedError(
            f"int8 ResNet serving supports norm None/'BN', not "
            f"{model.norm!r} (GroupNorm is data-dependent at serving "
            "time and cannot be folded)")
    from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_grouped

    depth = model.depth
    tp = variables["trunk"]["params"]["backbone"]
    ts = variables["trunk"].get("batch_stats", {}).get("backbone")
    hp = variables["head"]["params"]
    hs = variables["head"].get("batch_stats")

    @jax.jit
    def absmaxes(data, rois):
        rec: dict = {}
        t_ops = _ResnetF32(tp, ts, model.norm, record=rec)
        feat = _walk_resnet_trunk(t_ops, data, depth)
        pooled = roi_pool_grouped(feat, rois, 7, 7, spatial_scale)
        pooled = pooled.reshape(-1, 7, 7, feat.shape[-1])
        h_ops = _ResnetF32(hp, hs, model.norm, record=rec)
        _walk_resnet_head_group(h_ops, pooled, depth)
        return rec

    scales: dict = {}
    for bi, data in enumerate(batches):
        data = jnp.asarray(data)
        b, h, w, _ = data.shape
        if calib_rois is not None:
            rois = jnp.asarray(calib_rois[bi])
        else:
            rois = jnp.tile(jnp.asarray(
                [[0.0, 0.0, w - 1.0, h - 1.0]], jnp.float32), (b, 1, 1))
        m = jax.device_get(absmaxes(data, rois))
        for k, v in m.items():
            scales[k] = max(scales.get(k, 0.0), float(v))
    for k, v in scales.items():
        if v <= 0.0:
            raise ValueError(f"calibration absmax for {k!r} is {v}; the "
                             "calibration set never activated this layer")
    return scales


def quantize_resnet_part(params, stats, norm, depth, part,
                         act_scales: dict) -> dict:
    """Quantize one part's convs offline; fold serving-mode BN affines."""
    layers = {}
    for path in _resnet_conv_paths(depth, part):
        node_p, node_s = params, stats
        for seg in path.split("/"):
            node_p = node_p[seg]
            node_s = None if node_s is None else node_s.get(seg)
        kernel = np.asarray(node_p["conv"]["kernel"], np.float32)
        in_scale = np.float32(act_scales[path] / 127.0)
        w_absmax = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)),
                              np.finfo(np.float32).tiny)
        w_scale = (w_absmax / 127.0).astype(np.float32)
        qkernel = np.clip(np.round(kernel / w_scale), -127, 127) \
            .astype(np.int8)
        scale = in_scale * w_scale
        if norm == "BN":
            g, c = _bn_affine(node_p["bn"], node_s["bn"])
            scale = scale * g
            bias = c
        else:
            bias = np.asarray(node_p["conv"]["bias"], np.float32)
        layers[path] = {"qkernel": jnp.asarray(qkernel),
                        "scale": jnp.asarray(scale.astype(np.float32)),
                        "bias": jnp.asarray(bias.astype(np.float32)),
                        "in_scale": jnp.asarray(in_scale)}
    norms = {}
    if norm == "BN":
        for path in _resnet_norm_paths(depth, part):
            node_p, node_s = params, stats
            for seg in path.split("/"):
                node_p = node_p[seg]
                node_s = node_s[seg]
            g, c = _bn_affine(node_p, node_s)
            norms[path] = {"g": jnp.asarray(g), "c": jnp.asarray(c)}
    return {"layers": layers, "norms": norms}


def quantize_resnet(variables, norm, depth, act_scales: dict) -> dict:
    """Quantize trunk + head -> the serving pytree for
    ``quant_resnet_trunk_apply`` / ``quant_resnet_head_apply``.  The f32
    RPN convs and the cls/bbox dense heads ride along unquantized."""
    if norm not in (None, "BN"):
        # duplicate of the calibrate_resnet guard: the act_scales shortcut
        # through Engine.quantize_for_serving must hit the same clear error
        # (not a bare KeyError on the missing conv bias of a GN ConvBlock)
        raise NotImplementedError(
            f"int8 ResNet serving supports norm None/'BN', not {norm!r} "
            "(GroupNorm is data-dependent at serving time and cannot be "
            "folded)")
    tp = variables["trunk"]["params"]
    ts = variables["trunk"].get("batch_stats", {})
    hp = variables["head"]["params"]
    hs = variables["head"].get("batch_stats")
    # f32 RPN heads; rpn_conv carries the backbone norm for ResNet
    # (TrunkRPN: ConvBlock(..., norm=self.norm) -> no conv bias) — fold
    # its serving affine into a post-conv (scale, bias) pair
    if norm == "BN":
        g, c = _bn_affine(tp["rpn_conv"]["bn"],
                          ts["rpn_conv"]["bn"])
        g, c = np.asarray(g, np.float32), np.asarray(c, np.float32)
    else:
        g = np.ones(
            np.asarray(tp["rpn_conv"]["conv"]["kernel"]).shape[-1],
            np.float32)
        c = np.asarray(tp["rpn_conv"]["conv"]["bias"], np.float32)
    rpn = {"rpn_conv": {"kernel": jnp.asarray(
               np.asarray(tp["rpn_conv"]["conv"]["kernel"], np.float32)),
               "scale": jnp.asarray(g), "bias": jnp.asarray(c)}}
    for k in ("rpn_cls_score", "rpn_bbox_pred"):
        rpn[k] = {"kernel": jnp.asarray(
                      np.asarray(tp[k]["conv"]["kernel"], np.float32)),
                  "bias": jnp.asarray(
                      np.asarray(tp[k]["conv"]["bias"], np.float32))}
    out = {
        "trunk": quantize_resnet_part(tp["backbone"],
                                      ts.get("backbone"), norm, depth,
                                      "trunk", act_scales),
        "head": quantize_resnet_part(hp, hs, norm, depth, "head",
                                     act_scales),
        "rpn": rpn,
        "fc": {k: jax.tree.map(jnp.asarray, dict(hp[k]))
               for k in ("cls_score", "bbox_pred")},
    }
    return out


def quant_resnet_trunk_apply(q, data, norm, depth):
    """int8 trunk + f32 RPN heads -> (feat, rpn_cls_score, rpn_bbox_pred);
    drop-in for the Resnet branch of ``FasterRCNN.apply_trunk``
    (train=False)."""
    ops = _ResnetInt8(q["trunk"], norm)
    feat = _walk_resnet_trunk(ops, data, depth)
    rpn = q["rpn"]
    h = jax.nn.relu(_conv(feat, rpn["rpn_conv"]["kernel"], "SAME")
                    * rpn["rpn_conv"]["scale"] + rpn["rpn_conv"]["bias"])
    cls = _conv(h, rpn["rpn_cls_score"]["kernel"], "VALID") \
        + rpn["rpn_cls_score"]["bias"]
    bbox = _conv(h, rpn["rpn_bbox_pred"]["kernel"], "VALID") \
        + rpn["rpn_bbox_pred"]["bias"]
    return feat, cls, bbox


def quant_resnet_head_apply(q, pooled, norm, depth):
    """int8 group3 head + f32 GAP/dense -> (cls_score, bbox_pred);
    drop-in for ``ResNetRCNNHead`` at train=False
    (Resnet_train_bus.py:91-101)."""
    ops = _ResnetInt8(q["head"], norm)
    x = _walk_resnet_head_group(ops, pooled, depth)
    x = x.mean(axis=(1, 2))
    fc = q["fc"]
    cls = x @ fc["cls_score"]["dense"]["kernel"] \
        + fc["cls_score"]["dense"]["bias"]
    bbox = x @ fc["bbox_pred"]["dense"]["kernel"] \
        + fc["bbox_pred"]["dense"]["bias"]
    return cls, bbox
