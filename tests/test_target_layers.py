"""Tests for anchor_target / proposal_target / proposal layers against numpy
oracles that follow the reference control flow
(anchor_target_layer_tf_bus.py, proposal_target_layer_tf_bus.py,
proposal_layer_tf_bus.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.ops.anchor_target import (anchor_target_layer_joint,
                                             anchor_target_single)
from wssdl_bus_tpu.ops.anchors import shifted_anchors
from wssdl_bus_tpu.ops.proposal import proposal_layer, proposals_to_rois
from wssdl_bus_tpu.ops.proposal_target import proposal_target_layer
from tests import oracles


def _anchor_target_oracle_snubh(anchors, gt, im_hw, pos_ov=0.7):
    """Reference SNUBH labeling (:120-158) without random subsampling."""
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0]))
    idx_in = np.where(inside)[0]
    a_in = anchors[idx_in]
    labels = np.full(len(idx_in), -1.0)

    fg = gt[gt[:, 4] != 0]
    bg = gt[gt[:, 4] == 0]
    ov_pos = oracles.iou_oracle(a_in, fg[:, :4])
    argmax_pos = ov_pos.argmax(axis=1)
    max_pos = ov_pos[np.arange(len(idx_in)), argmax_pos]
    gt_max = ov_pos.max(axis=0)
    if len(bg):
        ov_neg = oracles.iou_ui_oracle(a_in, bg[:, :4])
        max_neg = ov_neg.max(axis=1)
        labels[max_neg >= pos_ov] = 0
    labels[np.where(ov_pos == gt_max)[0]] = 1
    labels[max_pos >= pos_ov] = 1

    targets_in = oracles.bbox_transform_oracle(a_in, fg[argmax_pos, :4])
    full_labels = np.full(len(anchors), -1.0)
    full_labels[idx_in] = labels
    full_targets = np.zeros((len(anchors), 4))
    full_targets[idx_in] = targets_in
    return full_labels, full_targets


def test_anchor_target_snubh_labels_match_oracle(rng):
    h, w = 20, 28
    anchors = shifted_anchors(h, w, 16)
    im_info = jnp.array([h * 16.0, w * 16.0, 1.0, 1.0])
    gt = np.zeros((20, 5), np.float32)
    gt[0] = [40, 40, 180, 150, 1]     # benign mass
    gt[1] = [200, 100, 390, 280, 2]   # malignant mass
    gt[2] = [10, 180, 260, 310, 0]    # annotated normal-tissue (bg) box
    num_gt = jnp.int32(3)

    labels, targets, in_w, out_w = anchor_target_single(
        jax.random.PRNGKey(0), jnp.array(gt), num_gt, im_info,
        jnp.array(anchors), dataset="SNUBH",
        rpn_batchsize=100000, rpn_fg_fraction=1.0)  # caps off -> deterministic

    want_labels, want_targets = _anchor_target_oracle_snubh(
        anchors.astype(np.float64), gt, (h * 16, w * 16))
    np.testing.assert_array_equal(np.asarray(labels), want_labels)
    got_t = np.asarray(targets)
    lab = np.asarray(labels)
    np.testing.assert_allclose(got_t[lab >= 0], want_targets[lab >= 0],
                               rtol=1e-4, atol=1e-4)
    # inside weights only on positives; outside weights uniform over examples
    assert (np.asarray(in_w)[lab == 1] == 1).all()
    assert (np.asarray(in_w)[lab != 1] == 0).all()
    n_ex = (lab >= 0).sum()
    np.testing.assert_allclose(np.asarray(out_w)[lab >= 0], 1.0 / n_ex,
                               rtol=1e-5)


def test_anchor_target_subsampling_caps(rng):
    h, w = 25, 30
    anchors = shifted_anchors(h, w, 16)
    im_info = jnp.array([h * 16.0, w * 16.0, 1.0, 1.0])
    gt = np.zeros((20, 5), np.float32)
    gt[0] = [10, 10, 250, 250, 2]
    gt[1] = [0, 0, w * 16 - 1, h * 16 - 1, 0]  # huge bg box -> many negatives
    labels, *_ = anchor_target_single(
        jax.random.PRNGKey(1), jnp.array(gt), jnp.int32(2), im_info,
        jnp.array(anchors), dataset="SNUBH")
    lab = np.asarray(labels)
    assert (lab == 1).sum() <= 128
    assert (lab >= 0).sum() <= 256


def test_anchor_target_joint_ws_blocks_ignored(rng):
    h, w = 20, 20
    anchors = shifted_anchors(h, w, 16)
    gt = np.zeros((2, 20, 5), np.float32)
    gt[0, 0] = [40, 40, 200, 200, 1]
    out = anchor_target_layer_joint(
        jax.random.PRNGKey(0), jnp.array(gt), jnp.array([1, 0]),
        jnp.array([[320.0, 320.0, 1.0, 1.0]] * 2), jnp.array(anchors),
        num_supervised=1)
    lab = np.asarray(out.labels)
    assert (lab[1] == -1).all()            # weak image: all ignored
    assert (lab[0] != -1).any()            # supervised image: labeled
    assert np.asarray(out.outside_weights)[1].sum() == 0


def test_proposal_target_sampling_properties(rng):
    p = 64
    boxes = np.zeros((1, p, 4), np.float32)
    gt = np.zeros((1, 20, 5), np.float32)
    gt[0, 0] = [100, 100, 200, 200, 2]
    gt[0, 1] = [300, 300, 400, 380, 1]
    # half the proposals near gt0 (fg), half far away (bg)
    for i in range(p // 2):
        boxes[0, i] = [100 + i, 100 + i, 200 + i, 200 + i]
    for i in range(p // 2, p):
        boxes[0, i] = [500 + i, 500, 560 + i, 560]
    out = proposal_target_layer(
        jax.random.PRNGKey(0), jnp.array(boxes), jnp.ones((1, p), bool),
        jnp.array(gt), jnp.array([2]), num_classes=3, rois_per_image=128)

    lab = np.asarray(out.labels[0])
    filled = lab >= 0
    n_fg = (lab > 0).sum()
    assert n_fg <= 32
    assert filled.sum() <= 128
    # fg slots come first, then bg
    first_bg = np.argmax(lab == 0) if (lab == 0).any() else len(lab)
    assert (lab[:n_fg] > 0).all()
    # regression targets live in the assigned class's 4-column block
    bt = np.asarray(out.bbox_targets[0])
    iw = np.asarray(out.inside_weights[0])
    for i in np.where(lab > 0)[0]:
        c = lab[i]
        assert iw[i, 4 * c:4 * c + 4].all()
        others = np.delete(iw[i], slice(4 * c, 4 * c + 4))
        assert (others == 0).all()
    # bg and padded rows have no regression loss
    assert iw[lab <= 0].sum() == 0
    # gt boxes were appended: the gt box itself should be a perfect fg
    assert n_fg >= 1


def _proposal_oracle(cls_prob_hw2a, bbox_hw4a, anchors, im_info, a,
                     pre_n, post_n, thresh, min_size):
    scores = cls_prob_hw2a[:, :, a:].reshape(-1)
    deltas = bbox_hw4a.reshape(-1, 4)
    props = oracles.bbox_transform_inv_oracle(anchors, deltas)
    props[:, 0::4] = np.clip(props[:, 0::4], 0, im_info[1] - 1)
    props[:, 1::4] = np.clip(props[:, 1::4], 0, im_info[0] - 1)
    props[:, 2::4] = np.clip(props[:, 2::4], 0, im_info[1] - 1)
    props[:, 3::4] = np.clip(props[:, 3::4], 0, im_info[0] - 1)
    ws = props[:, 2] - props[:, 0] + 1
    hs = props[:, 3] - props[:, 1] + 1
    keep = np.where((ws >= min_size * im_info[2]) & (hs >= min_size * im_info[2]))[0]
    props, scores = props[keep], scores[keep]
    order = scores.argsort()[::-1][:pre_n]
    props, scores = props[order], scores[order]
    keep = oracles.nms_oracle(
        np.hstack([props, scores[:, None]]).astype(np.float32), thresh)[:post_n]
    return props[keep], scores[keep]


def test_proposal_layer_matches_oracle(rng):
    h, w, a = 5, 6, 9
    anchors = shifted_anchors(h, w, 16)
    logits = rng.randn(1, h, w, 2 * a).astype(np.float32)
    # build softmax pairs the way the model does: channel a=bg, A+a=fg
    pair = logits.reshape(1, h, w, 2, a)
    prob = np.exp(pair) / np.exp(pair).sum(axis=3, keepdims=True)
    cls_prob = prob.reshape(1, h, w, 2 * a)
    bbox = (rng.randn(1, h, w, 4 * a) * 0.1).astype(np.float32)
    im_info = np.array([[h * 16.0, w * 16.0, 1.5]], np.float32)

    props = proposal_layer(jnp.array(cls_prob), jnp.array(bbox),
                           jnp.array(im_info), jnp.array(anchors),
                           num_anchors=a, pre_nms_top_n=100,
                           post_nms_top_n=30, nms_thresh=0.7, min_size=16.0)
    want_boxes, want_scores = _proposal_oracle(
        cls_prob[0].astype(np.float64), bbox[0].astype(np.float64),
        anchors.astype(np.float64), im_info[0], a, 100, 30, 0.7, 16.0)

    got_valid = np.asarray(props.valid[0])
    got_boxes = np.asarray(props.boxes[0])[got_valid]
    got_scores = np.asarray(props.scores[0])[got_valid]
    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4, atol=1e-5)

    rois = np.asarray(proposals_to_rois(props))
    assert rois.shape == (30, 5)
    assert (rois[:, 0] == 0).all()


def _anchor_target_oracle_classic(anchors, gt, im_hw, fg_only,
                                  pos_ov=0.7, neg_ov=0.3):
    """Classic Faster R-CNN labeling, the reference's SNUBH_FG / UDIAT paths
    (anchor_target_layer_tf_bus.py:159-199): negatives from max IoU < 0.3,
    positives from per-gt argmax + IoU >= 0.7."""
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0]))
    idx_in = np.where(inside)[0]
    a_in = anchors[idx_in]
    labels = np.full(len(idx_in), -1.0)
    gt = gt[:3]  # valid rows only (num_gt), not the zero padding
    cols = gt[gt[:, 4] != 0] if fg_only else gt
    ov = oracles.iou_oracle(a_in, cols[:, :4])
    max_ov = ov.max(axis=1)
    gt_max = ov.max(axis=0)
    labels[max_ov < neg_ov] = 0
    labels[np.where(ov == gt_max)[0]] = 1
    labels[max_ov >= pos_ov] = 1
    full = np.full(len(anchors), -1.0)
    full[idx_in] = labels
    return full


def test_anchor_target_udiat_and_snubh_fg_match_oracle(rng):
    h, w = 20, 28
    anchors = shifted_anchors(h, w, 16)
    im_info = jnp.array([h * 16.0, w * 16.0, 1.0, 1.0])
    gt = np.zeros((20, 5), np.float32)
    gt[0] = [40, 40, 180, 150, 1]
    gt[1] = [200, 100, 390, 280, 2]
    gt[2] = [10, 180, 260, 310, 0]   # bg box: used by UDIAT, not SNUBH_FG

    for dataset, fg_only in (("UDIAT", False), ("SNUBH_FG", True)):
        labels, *_ = anchor_target_single(
            jax.random.PRNGKey(0), jnp.array(gt), jnp.int32(3), im_info,
            jnp.array(anchors), dataset=dataset,
            rpn_batchsize=100000, rpn_fg_fraction=1.0)
        want = _anchor_target_oracle_classic(
            anchors.astype(np.float64), gt, (h * 16, w * 16), fg_only)
        np.testing.assert_array_equal(np.asarray(labels), want,
                                      err_msg=dataset)


def test_anchor_target_positive_weight_and_inside_weights(rng):
    """RPN_POSITIVE_WEIGHT >= 0 splits outside weights p/num_pos vs
    (1-p)/num_neg, and RPN_BBOX_INSIDE_WEIGHTS scales positives' inside
    weights (anchor_target_layer_tf_bus.py:228-244)."""
    import jax
    import jax.numpy as jnp

    from wssdl_bus_tpu.ops.anchor_target import anchor_target_layer_joint
    from wssdl_bus_tpu.ops.anchors import shifted_anchors

    anchors = jnp.asarray(shifted_anchors(12, 16, 16, (0.5, 1.0, 2.0),
                                          (8, 16, 32)))
    gt = np.zeros((1, 20, 5), np.float32)
    gt[0, 0] = [20, 30, 150, 160, 1]
    # whole-image normal-tissue box: covers every inside anchor, so the
    # SNUBH bg path labels all non-positive inside anchors negative
    gt[0, 1] = [0, 0, 255, 191, 0]
    num = np.array([2], np.int32)
    info = np.array([[192, 256, 1.0, 1.0]], np.float32)

    at = anchor_target_layer_joint(
        jax.random.PRNGKey(0), jnp.asarray(gt), jnp.asarray(num),
        jnp.asarray(info), anchors, num_supervised=1,
        bbox_inside_weights=(1.0, 1.0, 2.0, 2.0), positive_weight=0.8)
    labels = np.asarray(at.labels[0])
    ow = np.asarray(at.outside_weights[0])
    iw = np.asarray(at.inside_weights[0])
    n_pos, n_neg = (labels == 1).sum(), (labels == 0).sum()
    assert n_pos > 0 and n_neg > 0
    np.testing.assert_allclose(ow[labels == 1], 0.8 / n_pos, rtol=1e-6)
    np.testing.assert_allclose(ow[labels == 0], 0.2 / n_neg, rtol=1e-6)
    np.testing.assert_allclose(iw[labels == 1],
                               np.tile([1, 1, 2, 2], (n_pos, 1)))


def test_proposal_target_normalized_targets(rng):
    """BBOX_NORMALIZE_TARGETS_PRECOMPUTED whitens the regression targets by
    the configured means/stds (proposal_target_layer_tf_bus.py:221-224)."""
    import jax
    import jax.numpy as jnp

    from wssdl_bus_tpu.ops.proposal_target import proposal_target_layer

    props = np.array([[[10, 10, 100, 120], [30, 40, 90, 140],
                       [200, 200, 280, 260], [5, 5, 40, 40]]], np.float32)
    valid = np.ones((1, 4), bool)
    gt = np.zeros((1, 20, 5), np.float32)
    gt[0, 0] = [12, 12, 98, 118, 1]
    num = np.array([1], np.int32)

    kwargs = dict(num_classes=3, rois_per_image=8, fg_fraction=0.5,
                  fg_thresh=0.5, bg_thresh_hi=0.5, bg_thresh_lo=0.0,
                  include_gt=True)
    key = jax.random.PRNGKey(1)
    plain = proposal_target_layer(key, jnp.asarray(props), jnp.asarray(valid),
                                  jnp.asarray(gt), jnp.asarray(num), **kwargs)
    means, stds = (0.1, -0.1, 0.0, 0.2), (0.2, 0.2, 0.3, 0.3)
    norm = proposal_target_layer(key, jnp.asarray(props), jnp.asarray(valid),
                                 jnp.asarray(gt), jnp.asarray(num),
                                 normalize_targets=True,
                                 normalize_means=means, normalize_stds=stds,
                                 **kwargs)
    lab = np.asarray(plain.labels[0])
    fg = lab > 0
    assert fg.any()
    t_plain = np.asarray(plain.bbox_targets[0])[fg].reshape(-1, 3, 4)
    t_norm = np.asarray(norm.bbox_targets[0])[fg].reshape(-1, 3, 4)
    cls = lab[fg]
    for r, c in enumerate(cls):
        expect = (t_plain[r, c] - np.array(means)) / np.array(stds)
        np.testing.assert_allclose(t_norm[r, c], expect, rtol=1e-5)


def test_masked_keep_topk_static_cap_equivalence(rng):
    """The top_k fast path must select the IDENTICAL set as the argsort
    ranking for the same key — including f32 tie collisions (both break
    ties toward the lower index)."""
    import jax
    import jax.numpy as jnp

    from wssdl_bus_tpu.ops.anchor_target import _masked_keep_topk

    n = 4000
    for trial in range(5):
        key = jax.random.PRNGKey(trial)
        cand = jnp.asarray(rng.rand(n) < 0.4)
        for limit in (0, 7, 128, 256):
            ref = _masked_keep_topk(key, cand, jnp.int32(limit))
            fast = _masked_keep_topk(key, cand, jnp.int32(limit),
                                     static_cap=256)
            np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
            assert int(np.asarray(fast).sum()) <= limit

    # forced ties: quantized scores collide heavily
    orig = jax.random.uniform

    def tied_uniform(key, shape):
        u = orig(key, shape)
        return jnp.round(u * 16) / 16
    try:
        jax.random.uniform = tied_uniform
        key = jax.random.PRNGKey(9)
        cand = jnp.asarray(rng.rand(n) < 0.5)
        ref = _masked_keep_topk(key, cand, jnp.int32(100))
        fast = _masked_keep_topk(key, cand, jnp.int32(100), static_cap=256)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
    finally:
        jax.random.uniform = orig
