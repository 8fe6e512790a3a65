"""Composed END-TO-END numeric-parity oracle — the BASELINE.json artifact.

The per-kernel oracle tests (test_geometry, test_target_layers,
test_roi_pool*) each pin one stage; this test pins the COMPOSITION: a full
reference-semantics inference forward — trunk convs -> RPN heads -> paired
bg/fg softmax -> proposal layer (decode/clip/min-size/top-k/NMS) -> ROI max
pool -> fc head -> box decode -> per-class threshold + NMS — implemented in
pure numpy (float64) from ``tests/oracles.py``, compared against the
product jit pipeline (``Engine._inference_impl`` via ``detect.im_detect`` +
``detect.apply_nms_per_class``) on the SAME fixed weights.  Score-channel
ordering, (h, w, a) flattening, im_scale divisions — exactly the places
where independent per-stage tests can all pass while the whole drifts —
must line up for the final detections to agree.

Reference composition being mirrored: ``/root/reference/code/lib/fast_rcnn/
test_bus.py:146-240`` (im_detect: blob -> sess.run -> bbox_transform_inv ->
clip, coords divided by im_scale) and ``:300-413`` (test_net: per-class
score>thresh -> nms(TEST.NMS)).  True parity against a *trained TF model*
is impossible (the reference bundles no weights), so agreement of the two
independent implementations on fixed random weights is the strongest
achievable whole-pipeline artifact.
"""

import numpy as np
import pytest

from wssdl_bus_tpu.config import Config
from tests import oracles

# small everything so the CPU jit compile + numpy f64 trunk stay fast
CANVAS = (192, 256)
PRE_N, POST_N = 300, 50


@pytest.fixture(scope="module")
def cfg():
    return Config().with_overrides([
        "TEST.SCALES", "(120,)",
        "TEST.MAX_SIZE", "160",
        "TEST.RPN_PRE_NMS_TOP_N", str(PRE_N),
        "TEST.RPN_POST_NMS_TOP_N", str(POST_N),
    ])


# --------------------------------------------------------------------- #
# numpy reference-semantics forward
# --------------------------------------------------------------------- #
def np_conv3x3(x, w, b, relu=True):
    """SAME 3x3 conv + bias (+ relu), float64.  x [H, W, Ci], w [3,3,Ci,Co]."""
    h, wd, ci = x.shape
    xp = np.zeros((h + 2, wd + 2, ci), np.float64)
    xp[1:-1, 1:-1] = x
    out = np.zeros((h * wd, w.shape[3]), np.float64)
    for dy in range(3):
        for dx in range(3):
            out += xp[dy:dy + h, dx:dx + wd].reshape(h * wd, ci) @ w[dy, dx]
    out = (out + b).reshape(h, wd, -1)
    return np.maximum(out, 0.0) if relu else out


def np_conv1x1(x, w, b):
    """1x1 conv + bias, no relu.  w [1,1,Ci,Co]."""
    h, wd, ci = x.shape
    return (x.reshape(-1, ci) @ w[0, 0] + b).reshape(h, wd, -1)


def np_maxpool2(x):
    h, wd, c = x.shape
    return x.reshape(h // 2, 2, wd // 2, 2, c).max(axis=(1, 3))


def np_vgg_trunk(x, p):
    """VGG16 conv1..conv5 (VGGnet_test_bus.py conv stack) in numpy f64."""
    def cb(name, v):
        blk = p[name]["conv"]
        return np_conv3x3(v, np.asarray(blk["kernel"], np.float64),
                          np.asarray(blk["bias"], np.float64))

    v = cb("conv1_1", x)
    v = np_maxpool2(cb("conv1_2", v))
    v = cb("conv2_1", v)
    v = np_maxpool2(cb("conv2_2", v))
    v = cb("conv3_1", v)
    v = cb("conv3_2", v)
    v = np_maxpool2(cb("conv3_3", v))
    v = cb("conv4_1", v)
    v = cb("conv4_2", v)
    v = np_maxpool2(cb("conv4_3", v))
    v = cb("conv5_1", v)
    v = cb("conv5_2", v)
    v = cb("conv5_3", v)
    return v


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_fc(x, blk, relu=True):
    y = x @ np.asarray(blk["dense"]["kernel"], np.float64) \
        + np.asarray(blk["dense"]["bias"], np.float64)
    return np.maximum(y, 0.0) if relu else y


def oracle_forward(blob, im_info, im_shape, variables, cfg, anchors):
    """Full reference-semantics im_detect in numpy ->
    (scores [N, C], pred_boxes [N, 4C]) in ORIGINAL image coords."""
    tp = variables["trunk"]["params"]
    hp = variables["head"]["params"]
    a = 9

    # trunk + RPN heads (VGGnet_test_bus.py:45-73)
    feat = np_vgg_trunk(blob[0].astype(np.float64), tp["backbone"])
    rpn = np_conv3x3(feat, np.asarray(tp["rpn_conv"]["conv"]["kernel"],
                                      np.float64),
                     np.asarray(tp["rpn_conv"]["conv"]["bias"], np.float64))
    cls = np_conv1x1(rpn, np.asarray(tp["rpn_cls_score"]["conv"]["kernel"],
                                     np.float64),
                     np.asarray(tp["rpn_cls_score"]["conv"]["bias"],
                                np.float64))
    deltas = np_conv1x1(rpn, np.asarray(tp["rpn_bbox_pred"]["conv"]["kernel"],
                                        np.float64),
                        np.asarray(tp["rpn_bbox_pred"]["conv"]["bias"],
                                   np.float64))

    # paired bg/fg softmax: channel a = bg, A + a = fg of anchor a
    # (network.py reshape_layer(2) -> softmax -> reshape_layer(2A))
    fh, fw, _ = cls.shape
    prob = np_softmax(cls.reshape(fh, fw, 2, a), axis=2)

    # proposal layer (proposal_layer_tf_bus.py:19-156, TEST branch)
    scores = prob[:, :, 1, :].reshape(-1)
    props = oracles.bbox_transform_inv_oracle(
        anchors.astype(np.float64), deltas.reshape(-1, 4))
    props[:, 0::4] = np.clip(props[:, 0::4], 0, im_info[1] - 1)
    props[:, 1::4] = np.clip(props[:, 1::4], 0, im_info[0] - 1)
    props[:, 2::4] = np.clip(props[:, 2::4], 0, im_info[1] - 1)
    props[:, 3::4] = np.clip(props[:, 3::4], 0, im_info[0] - 1)
    min_px = cfg.TEST.RPN_MIN_SIZE * im_info[2]
    ws = props[:, 2] - props[:, 0] + 1
    hs = props[:, 3] - props[:, 1] + 1
    keep = np.where((ws >= min_px) & (hs >= min_px))[0]
    props, scores = props[keep], scores[keep]
    order = scores.argsort()[::-1][:cfg.TEST.RPN_PRE_NMS_TOP_N]
    props, scores = props[order], scores[order]
    keep = oracles.nms_oracle(
        np.hstack([props, scores[:, None]]).astype(np.float32),
        cfg.TEST.RPN_NMS_THRESH)[:cfg.TEST.RPN_POST_NMS_TOP_N]
    props = props[keep]

    # ROI max pool, 'gpu' flavor — the kernel the reference runs
    # (roi_pooling_op_gpu.cu.cc) and the product's default
    rois5 = np.hstack([np.zeros((len(props), 1)), props]).astype(np.float32)
    pooled = oracles.roi_pool_oracle(feat[None].astype(np.float32), rois5,
                                     7, 7, 1.0 / cfg.FEAT_STRIDE)

    # head: fc6 -> fc7 -> cls/bbox (VGGnet_test_bus.py:61-69; no dropout at
    # test).  NHWC flatten per models/layers.py Fc.
    x = pooled.reshape(len(props), -1).astype(np.float64)
    x = np_fc(x, hp["fc6"])
    x = np_fc(x, hp["fc7"])
    cls_score = np_fc(x, hp["cls_score"], relu=False)
    bbox_pred = np_fc(x, hp["bbox_pred"], relu=False)
    cls_prob = np_softmax(cls_score, axis=1)

    # decode to original pixel coords (test_bus.py:214-223)
    boxes = props / im_info[2]
    pred = oracles.bbox_transform_inv_oracle(boxes, bbox_pred)
    pred[:, 0::4] = np.clip(pred[:, 0::4], 0, im_shape[1] - 1)
    pred[:, 1::4] = np.clip(pred[:, 1::4], 0, im_shape[0] - 1)
    pred[:, 2::4] = np.clip(pred[:, 2::4], 0, im_shape[1] - 1)
    pred[:, 3::4] = np.clip(pred[:, 3::4], 0, im_shape[0] - 1)
    return cls_prob, pred


def oracle_nms_per_class(scores, boxes, num_classes, thresh, nms_thresh):
    """test_bus.py:359-370 per-class postprocessing via nms_oracle."""
    out = [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
    for j in range(1, num_classes):
        inds = np.where(scores[:, j] > thresh)[0]
        dets = np.hstack([boxes[inds, j * 4:(j + 1) * 4],
                          scores[inds, j][:, None]]).astype(np.float32)
        keep = oracles.nms_oracle(dets, nms_thresh) if len(dets) else []
        out[j] = dets[keep]
    return out


# --------------------------------------------------------------------- #
def condition_weights(variables):
    """Rescale the freshly-initialized weights so the comparison is
    numerically meaningful.  Lecun-normal + ReLU decays activations ~2x per
    conv: after 13 trunk convs features sit at ~1e-6, every RPN logit is
    ~1e-7, every softmax score is 0.5 +- 1e-7 — and greedy NMS order (hence
    the kept SET) becomes pure f32-vs-f64 rounding noise.  Scaling conv
    kernels ~2.7x keeps activations O(0.3); extra gain on the score/box
    heads spreads score gaps (~1e-4 between rank neighbors) far above the
    f32 pipeline error (~1e-6)."""
    import jax

    v = jax.tree.map(np.array, jax.device_get(variables))

    def walk(d, path):
        for k, x in d.items():
            p = f"{path}/{k}"
            if isinstance(x, dict):
                walk(x, p)
            elif k == "kernel":
                if "/backbone/" in p or "/rpn_conv/" in p:
                    d[k] = x * 2.7
                elif "/fc6/" in p or "/fc7/" in p:
                    d[k] = x * 2.0
                elif "/rpn_cls_score/" in p or "/cls_score/" in p:
                    d[k] = x * 6.0
                elif "/rpn_bbox_pred/" in p or "/bbox_pred/" in p:
                    d[k] = x * 3.0
    walk(v, "")
    return v


def test_e2e_inference_parity_vs_numpy_oracle(cfg):
    """Final per-class detections of the jit pipeline match the composed
    numpy oracle to 1e-3 relative in original pixel coordinates."""
    import jax

    from wssdl_bus_tpu.evaluate.detect import (apply_nms_per_class,
                                               get_image_blob, im_detect)
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.ops.anchors import shifted_anchors
    from wssdl_bus_tpu.train.engine import Engine

    model = build_detector("VGGnet_train", num_classes=3)
    eng = Engine(model, cfg, CANVAS)
    variables, _ = eng.init(jax.random.PRNGKey(0))
    variables = condition_weights(variables)

    # a structured test image (gradients + blobs), 2:3-ish aspect so resize
    # actually rescales (shortest side -> 120)
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:180, 0:240]
    im = (96 + 60 * np.sin(yy / 11.0) * np.cos(xx / 17.0)
          + 40 * rng.rand(180, 240)).clip(0, 255).astype(np.uint8)

    # ---- product path (the real serving pipeline) ----
    scores, boxes = im_detect(eng, variables, im, "VGGnet_test", CANVAS)
    got = apply_nms_per_class(scores, boxes, 3, thresh=0.05,
                              nms_thresh=cfg.TEST.NMS)

    # ---- composed numpy oracle on the same blob + weights ----
    blob, im_scale, (h, w) = get_image_blob(im, "VGGnet_test", cfg, CANVAS)
    im_info = np.array([h, w, im_scale], np.float64)
    anchors = shifted_anchors(CANVAS[0] // cfg.FEAT_STRIDE,
                              CANVAS[1] // cfg.FEAT_STRIDE, cfg.FEAT_STRIDE)
    o_scores, o_boxes = oracle_forward(blob, im_info, im.shape, variables,
                                       cfg, anchors)
    want = oracle_nms_per_class(o_scores, o_boxes, 3, 0.05, cfg.TEST.NMS)

    # the pre-NMS pipeline outputs agree (sorted by score: the jit pipeline
    # emits proposals in masked-top-k order, the oracle in greedy-keep
    # order; NMS keep SETS must match, sequence may not)
    assert scores.shape == o_scores.shape, \
        f"proposal count diverged: {scores.shape} vs {o_scores.shape}"
    gs = np.sort(scores[:, 1])
    os_ = np.sort(o_scores[:, 1])
    np.testing.assert_allclose(gs, os_, rtol=1e-3, atol=1e-4)

    # final detections per class: identical count, boxes within 1e-3
    for j in (1, 2):
        assert len(got[j]) == len(want[j]), \
            f"class {j}: {len(got[j])} vs {len(want[j])} detections"
        assert len(want[j]) > 0, f"class {j}: oracle produced no detections"
        g = got[j][np.lexsort((got[j][:, 0], -got[j][:, 4]))]
        o = want[j][np.lexsort((want[j][:, 0], -want[j][:, 4]))]
        np.testing.assert_allclose(g[:, :4], o[:, :4], rtol=1e-3, atol=5e-2)
        np.testing.assert_allclose(g[:, 4], o[:, 4], rtol=1e-3, atol=1e-4)
