"""Jitted train / eval / inference steps.

This is the TPU-native replacement for the reference's TF1 graph + ``sess.run``
hot loop (``/root/reference/code/lib/fast_rcnn/train_bus.py:595-957`` combined,
``:175-592`` alternating): each step below traces the ENTIRE pipeline —
backbone, RPN, anchor targets, proposals (with NMS), ROI sampling, ROI
pooling, heads, all losses, and the optimizer update — into one XLA program.
The reference bounces GPU->CPU->GPU three times per step through ``tf.py_func``
detection ops; here there are zero host round-trips.

Gradient combination note: the reference computes gradients of the supervised
loss and the MIL loss separately and adds them (train_bus.py:701-705).  Both
use the same variables, so this equals one ``jax.grad`` of their sum, which is
what we take.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.mil import get_bag_logits
from wssdl_bus_tpu.models.detector import FasterRCNN, rpn_softmax
from wssdl_bus_tpu.ops.anchor_target import anchor_target_layer_joint
from wssdl_bus_tpu.ops.anchors import shifted_anchors
from wssdl_bus_tpu.ops.proposal import proposal_layer
from wssdl_bus_tpu.ops.proposal_target import proposal_target_layer
from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_fc, roi_pool_grouped
from wssdl_bus_tpu.train import losses as L
from wssdl_bus_tpu.utils.tpu_opts import (lazy_jit, serving_compiler_options,
                                          train_compiler_options)


class StepLosses(NamedTuple):
    total: jnp.ndarray
    rpn_cls: jnp.ndarray
    rpn_box: jnp.ndarray
    rcnn_cls: jnp.ndarray
    rcnn_box: jnp.ndarray
    mil_cls: jnp.ndarray


def _rois5(boxes, first_index=0):
    """[B, P, 4] -> [B*P, 5] with batch indices (proposal_layer_tf_bus
    blob format)."""
    b, p, _ = boxes.shape
    idx = jnp.broadcast_to(
        jnp.arange(first_index, first_index + b, dtype=boxes.dtype)[:, None],
        (b, p))
    return jnp.concatenate([idx[..., None], boxes], axis=-1).reshape(b * p, 5)


def make_optimizer(opt_name: str, cfg: Config, param_mask=None):
    """adam(eps=0.1) / amsgrad(eps=0.1) / nesterov-sgd (train_bus.py:694-699),
    with an injected learning rate so LR schedules run host-side like the
    reference's feed_dict lr (train_bus.py:122-123)."""
    def factory(learning_rate):
        if opt_name == "adam":
            inner = optax.adam(learning_rate, eps=0.1)
        elif opt_name == "amsgrad":
            inner = optax.amsgrad(learning_rate, b2=0.999, eps=0.1)
        elif opt_name == "sgd":
            inner = optax.sgd(learning_rate, momentum=cfg.TRAIN.MOMENTUM,
                              nesterov=True)
        else:
            raise NotImplementedError(opt_name)
        if param_mask is not None:
            frozen = jax.tree_util.tree_map(lambda m: not m, param_mask)
            inner = optax.chain(optax.masked(optax.set_to_zero(), frozen),
                                inner)
        return inner

    return optax.inject_hyperparams(factory)(
        learning_rate=cfg.TRAIN.LEARNING_RATE)


def vgg_frozen_mask(params) -> dict:
    """True = trainable.  VGG conv1/conv2 are frozen
    (VGGnet_train_bus.py:45-49, trainable=False)."""
    def mask_path(path):
        names = [p.key for p in path if hasattr(p, "key")]
        return not any(n.startswith(("conv1_", "conv2_")) for n in names)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: mask_path(path), params)


def stem_mask_is_frozen(mask) -> bool:
    """True iff every conv1_*/conv2_* param leaf in an optimizer mask
    (True = trainable, as ``vgg_frozen_mask`` builds) is NOT trainable.

    Gates the Pallas stem kernels in training: they wrap the stem in
    ``stop_gradient`` (no VJP), which is only sound while the optimizer
    provably never updates conv1/conv2 (``FasterRCNN.apply_trunk``)."""
    frozen = []

    def visit(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if any(n.startswith(("conv1_", "conv2_")) for n in names):
            frozen.append(not leaf)

    jax.tree_util.tree_map_with_path(visit, mask)
    return bool(frozen) and all(frozen)


class Engine:
    """Builds and caches the jitted step functions for one model + canvas.

    Engines compare (and hash) by VALUE over their trace-relevant
    configuration, not by identity.  The step methods are jitted with
    ``static_argnums=(0,)``, so the jit cache is keyed on the engine itself:
    two engines constructed with equal (model, cfg, canvas, batch split,
    dataset, optimizer, selectors) produce byte-identical traced programs and
    therefore SHARE compiled executables instead of recompiling.  Everything
    else on the instance (``anchors``, ``_at_kwargs``, ``tx``, ...) is
    derived deterministically from the key fields in ``__init__``/``init``.
    """

    def __init__(self, model: FasterRCNN, cfg: Config, canvas_hw,
                 num_supervised: int = None, num_ws: int = None,
                 dataset: str = "SNUBH", opt_name: str = "adam",
                 selector_pair=("mal_max", "mal_max"),
                 freeze_stem: bool = True):
        self.model = model
        self.cfg = cfg
        self.canvas_hw = canvas_hw
        self.n_s = cfg.TRAIN.IMS_PER_BATCH if num_supervised is None \
            else num_supervised
        self.n_ws = cfg.TRAIN.WS_IMS_PER_BATCH if num_ws is None else num_ws
        self.dataset = dataset
        self.opt_name = opt_name
        self.selector_pair = selector_pair
        # reference parity default: VGG conv1/conv2 never train
        # (VGGnet_train_bus.py:45-49 trainable=False — sensible with the
        # ImageNet .npy init the reference always loads).  FROM-SCRATCH
        # runs must pass False: freezing the random std-0.01 init leaves
        # conv5_3 nearly featureless (measured: spatial std ~12% of mean
        # after 4k overfit iters; the head then cannot distinguish ROIs
        # and collapses to the class prior).  Ignored for ResNet.
        self.freeze_stem = freeze_stem
        self._tx = None
        self._tx_key = ("opt", opt_name)  # see the tx property
        # whether the optimizer provably never updates conv1/conv2 (gates
        # the no-VJP Pallas stem kernels in the TRAIN forward — see
        # FasterRCNN.apply_trunk).  True for the default masked optimizer
        # (init() re-derives it from the actual mask); assigning a custom
        # ``tx`` resets it to False because an arbitrary transform can't be
        # introspected — set ``engine.stem_frozen = True`` back explicitly
        # if the custom tx also freezes the stem.
        self._stem_frozen = True

        fh, fw = canvas_hw[0] // cfg.FEAT_STRIDE, canvas_hw[1] // cfg.FEAT_STRIDE
        self.anchors = jnp.asarray(shifted_anchors(
            fh, fw, cfg.FEAT_STRIDE, cfg.ANCHOR_RATIOS, cfg.ANCHOR_SCALES))
        self.num_anchors = len(cfg.ANCHOR_RATIOS) * len(cfg.ANCHOR_SCALES)
        # static kwargs shared by the train and eval pipelines (one source
        # of truth so the two call sites cannot drift)
        self._at_kwargs = dict(
            dataset=self.dataset,
            rpn_batchsize=cfg.TRAIN.RPN_BATCHSIZE,
            rpn_fg_fraction=cfg.TRAIN.RPN_FG_FRACTION,
            pos_overlap=cfg.TRAIN.RPN_POSITIVE_OVERLAP,
            neg_overlap=cfg.TRAIN.RPN_NEGATIVE_OVERLAP,
            clobber_positives=cfg.TRAIN.RPN_CLOBBER_POSITIVES,
            bbox_inside_weights=cfg.TRAIN.RPN_BBOX_INSIDE_WEIGHTS,
            positive_weight=cfg.TRAIN.RPN_POSITIVE_WEIGHT)
        self._pt_kwargs = dict(
            num_classes=self.model.num_classes,
            rois_per_image=cfg.TRAIN.BATCH_SIZE,
            fg_fraction=cfg.TRAIN.FG_FRACTION,
            fg_thresh=cfg.TRAIN.FG_THRESH,
            bg_thresh_hi=cfg.TRAIN.BG_THRESH_HI,
            bg_thresh_lo=cfg.TRAIN.BG_THRESH_LO,
            bbox_inside_weights=cfg.TRAIN.BBOX_INSIDE_WEIGHTS,
            normalize_targets=cfg.TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED,
            normalize_means=cfg.TRAIN.BBOX_NORMALIZE_MEANS,
            normalize_stds=cfg.TRAIN.BBOX_NORMALIZE_STDS)

    # ------------------------------------------------------------------ #
    # Value identity (jit-cache sharing across equal-config engines)
    # ------------------------------------------------------------------ #
    def _static_key(self):
        return (dataclasses.astuple(self.model), self.cfg,
                tuple(self.canvas_hw), self.n_s, self.n_ws, self.dataset,
                self.opt_name, tuple(self.selector_pair), self._tx_key,
                self._stem_frozen, self.freeze_stem)

    # The optimizer is part of the traced program (the jitted steps close
    # over ``self.tx.update``), so it must participate in value identity.
    # ``init()`` derives tx deterministically from (opt_name, cfg, backbone)
    # — covered by the key fields above — but a HAND-ASSIGNED tx may be
    # anything: the setter switches this engine's identity to the assigned
    # object, so only engines sharing the very same tx object share
    # compiled steps (conservative: may recompile, never wrong-shares).
    @property
    def tx(self):
        return self._tx

    @tx.setter
    def tx(self, value):
        self._tx = value
        self._tx_key = ("custom", id(value))
        # conservative: a hand-assigned transform may train conv1/conv2,
        # so the train forward falls back to the XLA stem (real gradients)
        # until the caller re-asserts ``engine.stem_frozen = True``
        self._stem_frozen = False

    @property
    def stem_frozen(self) -> bool:
        """Whether the TRAIN forward may dispatch the no-VJP stem kernels
        (see ``stem_mask_is_frozen`` / ``FasterRCNN.apply_trunk``)."""
        return self._stem_frozen

    @stem_frozen.setter
    def stem_frozen(self, value: bool):
        self._stem_frozen = bool(value)

    def __eq__(self, other):
        return (type(self) is type(other)
                and self._static_key() == other._static_key())

    def __hash__(self):
        return hash((type(self),) + self._static_key())

    # ------------------------------------------------------------------ #
    def init(self, rng):
        variables = self.model.init_variables(rng, self.canvas_hw)
        params = {"trunk": variables["trunk"]["params"],
                  "head": variables["head"]["params"]}
        if self.model.backbone == "VGGnet" and self.freeze_stem:
            mask = vgg_frozen_mask(params)
            self._stem_frozen = stem_mask_is_frozen(mask)
        else:
            mask = jax.tree_util.tree_map(lambda _: True, params)
            self._stem_frozen = False
        # bypass the tx setter: this tx is the deterministic product of the
        # key fields (opt_name, cfg, backbone mask), so equal-config engines
        # that each init() keep sharing compiled steps
        self._tx = make_optimizer(self.opt_name, self.cfg, mask)
        opt_state = self.tx.init(params)
        return variables, opt_state

    def _split_vars(self, variables, params):
        tv = dict(variables["trunk"])
        hv = dict(variables["head"])
        tv["params"] = params["trunk"]
        hv["params"] = params["head"]
        return {"trunk": tv, "head": hv}

    # ------------------------------------------------------------------ #
    # Forward pieces shared by train/eval
    # ------------------------------------------------------------------ #
    def _apply_head(self, var, pooled, train, dropout_rng=None):
        """Head application hook; ParallelEngine overrides this with a
        tensor-parallel head when the mesh has a model axis."""
        return self.model.apply_head(var, pooled, train=train,
                                     dropout_rng=dropout_rng)

    def _pool_for_head(self, feat, boxes):
        """ROI-pool ``boxes`` [B, P, 4] against ``feat`` and return the head
        input flattened over (B, P).  VGG on TPU uses the fused
        pool+flatten kernel — the bit-identical flat f32 fc6 operand
        without the [N, 7*7*C] relayout copies (roi_pool_fc docstring);
        everywhere else (CPU bitwise contracts, ResNet's BN conv head)
        the plain pooled [N, 7, 7, C] float32."""
        if self.model.backbone == "VGGnet" \
                and jax.default_backend() == "tpu":
            flat = roi_pool_fc(feat, boxes, 7, 7, 1.0 / self.cfg.FEAT_STRIDE)
            return flat.reshape(-1, flat.shape[-1])
        pooled = roi_pool_grouped(feat, boxes, 7, 7,
                                  1.0 / self.cfg.FEAT_STRIDE)
        return pooled.reshape(-1, 7, 7, feat.shape[-1])

    def _batch_data(self, batch):
        """The [B, H, W, 3] image blob: as shipped (``data``), or finished
        ON DEVICE from the raw uint8 staging blobs (``raw`` + ``prep``,
        ops/device_prep.py) — the train-feed layout that cuts the
        host->device payload ~17x on relay-attached TPUs."""
        if "data" in batch:
            return batch["data"]
        from wssdl_bus_tpu.ops.device_prep import (net_divisor_for,
                                                   prep_device_batch)
        net = "Resnet" if self.model.backbone == "Resnet" else "VGGnet"
        return prep_device_batch(
            batch["raw"], batch["prep"], self.canvas_hw,
            self.cfg.PIXEL_MEAN / 255.0,
            net_divisor_for(net, self.cfg.PIXEL_STD))

    def _forward_train(self, params, variables, batch, key, step):
        cfg = self.cfg
        n_s, n_ws = self.n_s, self.n_ws
        var = self._split_vars(variables, params)
        k_at, k_pt, k_drop = jax.random.split(key, 3)

        feat, rpn_score, rpn_bbox, bs_trunk = self.model.apply_trunk(
            var, self._batch_data(batch), train=True,
            stem_frozen=self._stem_frozen)
        rpn_prob = rpn_softmax(rpn_score, self.num_anchors)

        at = anchor_target_layer_joint(
            k_at, batch["gt_boxes"], batch["num_gt_boxes"], batch["im_info"],
            self.anchors, num_supervised=n_s, **self._at_kwargs)

        props = proposal_layer(
            jax.lax.stop_gradient(rpn_prob),
            jax.lax.stop_gradient(rpn_bbox),
            batch["im_info"], self.anchors, num_anchors=self.num_anchors,
            pre_nms_top_n=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TRAIN.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TRAIN.RPN_NMS_THRESH,
            min_size=float(cfg.TRAIN.RPN_MIN_SIZE))

        samples = proposal_target_layer(
            k_pt, props.boxes[:n_s], props.valid[:n_s],
            batch["gt_boxes"][:n_s], batch["num_gt_boxes"][:n_s],
            include_gt=True, **self._pt_kwargs)

        sup_rois = _rois5(samples.rois, 0)
        if n_ws:
            ws_rois = _rois5(props.boxes[n_s:], n_s)
            rois_all = jnp.concatenate([sup_rois, ws_rois], axis=0)
        else:
            rois_all = sup_rois

        scale = 1.0 / cfg.FEAT_STRIDE
        c = feat.shape[-1]
        vgg_tpu = (self.model.backbone == "VGGnet"
                   and jax.default_backend() == "tpu")
        if vgg_tpu and not n_ws:
            # supervised-only: one group, but still the fused pool+flatten
            # kernel (same dropout draw as the fallback: identical [N, 512]
            # mask shape and key, and fc6's operand is bit-identical per
            # the roi_pool_fc docstring)
            cls_score, bbox_pred, bs_head = self._apply_head(
                var, self._pool_for_head(feat[:n_s], samples.rois),
                train=True, dropout_rng=k_drop)
        elif n_ws and vgg_tpu:
            # Apply the head to the supervised and weak groups SEPARATELY
            # and concatenate only the tiny outputs: concatenating the
            # pooled features first forces XLA to materialize + re-lay-out
            # the [4.1k, 7*7*512] fc6 operand and split its cotangent
            # (~4 ms/step of pure copies at full budgets, profiled).  Valid
            # only while the head is norm-free (VGG fc6/fc7: dropout is
            # per-roi iid either way); the ResNet conv head computes BN
            # batch stats over ALL rois in one call, so it keeps the
            # reference's concatenated application below.  The pool runs
            # the fused pool+flatten kernel: fc6 receives the flat f32
            # operand XLA would otherwise produce with relayout copies,
            # with bit-identical values (roi_pool_fc docstring).  TPU-only
            # at trace time (like roi_pool_grouped / proposal's dispatch):
            # on CPU the split changes the bias-grad reduction tree enough
            # that shard_map-vs-plain programs stop agreeing bitwise,
            # which would break the (1,1)-mesh == Engine contract the
            # tests pin down.
            k_sup, k_ws = jax.random.split(k_drop)
            cls_sup, bbox_sup, bs_head = self._apply_head(
                var, self._pool_for_head(feat[:n_s], samples.rois),
                train=True, dropout_rng=k_sup)
            cls_ws, bbox_ws, _ = self._apply_head(
                var, self._pool_for_head(feat[n_s:], props.boxes[n_s:]),
                train=True, dropout_rng=k_ws)
            cls_score = jnp.concatenate([cls_sup, cls_ws], axis=0)
            bbox_pred = jnp.concatenate([bbox_sup, bbox_ws], axis=0)
        else:
            sup_pooled = roi_pool_grouped(feat[:n_s], samples.rois, 7, 7,
                                          scale)
            if n_ws:
                ws_pooled = roi_pool_grouped(feat[n_s:], props.boxes[n_s:],
                                             7, 7, scale)
                pooled = jnp.concatenate(
                    [sup_pooled.reshape(-1, 7, 7, c),
                     ws_pooled.reshape(-1, 7, 7, c)], axis=0)
            else:
                pooled = sup_pooled.reshape(-1, 7, 7, c)
            cls_score, bbox_pred, bs_head = self._apply_head(
                var, pooled, train=True, dropout_rng=k_drop)

        bs_updates = {"trunk": bs_trunk, "head": bs_head}
        return (feat, rpn_score, rpn_bbox, at, props, samples, rois_all,
                cls_score, bbox_pred, bs_updates)

    def _losses(self, rpn_score, rpn_bbox, at, props, samples, cls_score,
                bbox_pred, batch, step, with_mil=True):
        cfg = self.cfg
        n_s, n_ws = self.n_s, self.n_ws
        r = cfg.TRAIN.BATCH_SIZE

        rpn_cls = L.rpn_class_loss(rpn_score, at.labels, self.num_anchors)
        rpn_box = L.rpn_box_loss(rpn_bbox, at.bbox_targets, at.inside_weights,
                                 at.outside_weights, n_s, self.num_anchors)

        sup_scores = cls_score[:n_s * r].reshape(n_s, r, -1)
        labels = samples.labels
        rcnn_cls = L.rcnn_class_loss(sup_scores.reshape(-1, sup_scores.shape[-1]),
                                     labels.reshape(-1))
        sup_bbox = bbox_pred[:n_s * r].reshape(n_s, r, -1)
        rcnn_box = L.rcnn_box_loss(sup_bbox.reshape(n_s * r, -1),
                                   samples.bbox_targets.reshape(n_s * r, -1),
                                   samples.inside_weights.reshape(n_s * r, -1),
                                   samples.outside_weights.reshape(n_s * r, -1),
                                   labels.reshape(-1))

        if with_mil and n_ws:
            p = cfg.TRAIN.RPN_POST_NMS_TOP_N
            ws_scores = cls_score[n_s * r:].reshape(n_ws, p, -1)
            bag_labels = batch["im_info"][n_s:, 3].astype(jnp.int32)
            bag_logits = get_bag_logits(ws_scores, props.valid[n_s:],
                                        bag_labels, self.selector_pair)
            if cfg.TRAIN.WS_LOSS_USE_ADAPTIVE_SCALE_FACTOR:
                scale = L.mil_adaptive_scale(step)
            else:
                scale = cfg.TRAIN.WS_LOSS_SCALE_FACTOR
            mil = L.mil_class_loss(bag_logits, bag_labels,
                                   cfg.TRAIN.WS_MAL_PCT, scale)
        else:
            mil = jnp.float32(0.0)

        total = rpn_cls + rpn_box + rcnn_cls + rcnn_box
        return StepLosses(total, rpn_cls, rpn_box, rcnn_cls, rcnn_box, mil)

    # ------------------------------------------------------------------ #
    def _train_step_impl(self, variables, opt_state, batch, key, lr, step):
        cfg = self.cfg

        def loss_fn(params):
            (feat, rpn_score, rpn_bbox, at, props, samples, rois_all,
             cls_score, bbox_pred, bs_updates) = self._forward_train(
                 params, variables, batch, key, step)
            ls = self._losses(rpn_score, rpn_bbox, at, props, samples,
                              cls_score, bbox_pred, batch, step)
            wd = L.weight_decay_loss(params, cfg.TRAIN.WEIGHT_DECAY)
            # grads of (supervised + wd) + grads of mil == grad of the sum
            return ls.total + wd + ls.mil_cls, (ls, bs_updates)

        params = {"trunk": variables["trunk"]["params"],
                  "head": variables["head"]["params"]}
        grads, (ls, bs_updates) = jax.grad(loss_fn, has_aux=True)(params)

        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        new_vars = {}
        for part in ("trunk", "head"):
            v = dict(variables[part])
            v["params"] = params[part]
            if bs_updates[part]:
                v["batch_stats"] = bs_updates[part]
            new_vars[part] = v
        return new_vars, opt_state, ls

    @lazy_jit(train_compiler_options, static_argnums=(0,))
    def train_step(self, variables, opt_state, batch, key, lr, step):
        """One combined SGD update (train_model, train_bus.py:595-764)."""
        return self._train_step_impl(variables, opt_state, batch, key, lr,
                                     step)

    @lazy_jit(train_compiler_options, static_argnums=(0,),
              donate_argnums=(1, 2))
    def train_step_donated(self, variables, opt_state, batch, key, lr, step):
        """``train_step`` with the (variables, opt_state) input buffers
        DONATED: XLA writes the updated train state in place, aliasing
        pass-through leaves (frozen conv1/2 params, BN stats) instead of
        copying them.  The hot-loop variant used by Solver/bench — the
        caller's input references are INVALID after the call."""
        return self._train_step_impl(variables, opt_state, batch, key, lr,
                                     step)

    # ------------------------------------------------------------------ #
    def _mil_loss(self, params, variables, batch, key, step):
        """MIL-only forward + bag loss for the alternating regime's weak
        step (shared by ``train_step_mil`` and the parallel variant)."""
        cfg = self.cfg
        var = self._split_vars(variables, params)
        feat, rpn_score, rpn_bbox, _ = self.model.apply_trunk(
            var, self._batch_data(batch), train=True,
            stem_frozen=self._stem_frozen)
        rpn_prob = rpn_softmax(rpn_score, self.num_anchors)
        props = proposal_layer(
            jax.lax.stop_gradient(rpn_prob),
            jax.lax.stop_gradient(rpn_bbox),
            batch["im_info"], self.anchors, num_anchors=self.num_anchors,
            pre_nms_top_n=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TRAIN.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TRAIN.RPN_NMS_THRESH,
            min_size=float(cfg.TRAIN.RPN_MIN_SIZE))
        pooled = self._pool_for_head(feat, props.boxes)
        cls_score, _, _ = self._apply_head(var, pooled, train=True,
                                           dropout_rng=key)
        b = batch["im_info"].shape[0]
        p = cfg.TRAIN.RPN_POST_NMS_TOP_N
        ws_scores = cls_score.reshape(b, p, -1)
        bag_labels = batch["im_info"][:, 3].astype(jnp.int32)
        bag_logits = get_bag_logits(ws_scores, props.valid, bag_labels,
                                    self.selector_pair)
        if cfg.TRAIN.WS_LOSS_USE_ADAPTIVE_SCALE_FACTOR:
            scale = L.mil_adaptive_scale(step)
        else:
            scale = cfg.TRAIN.WS_LOSS_SCALE_FACTOR
        return L.mil_class_loss(bag_logits, bag_labels,
                                cfg.TRAIN.WS_MAL_PCT, scale)

    def _train_step_mil_impl(self, variables, opt_state, batch, key, lr,
                             step):
        def loss_fn(params):
            return self._mil_loss(params, variables, batch, key, step)

        params = {"trunk": variables["trunk"]["params"],
                  "head": variables["head"]["params"]}
        mil, grads = jax.value_and_grad(loss_fn)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {}
        for part in ("trunk", "head"):
            v = dict(variables[part])
            v["params"] = params[part]
            new_vars[part] = v
        return new_vars, opt_state, mil

    @lazy_jit(train_compiler_options, static_argnums=(0,))
    def train_step_mil(self, variables, opt_state, batch, key, lr, step):
        """One weakly-supervised SGD update for the ALTERNATING regime:
        only the MIL bag loss is optimized (train_bus.py:298-301,368-394).
        BN running stats are NOT updated (the reference's update ops only run
        with the supervised step, train_bus.py:357-361 vs :391-394)."""
        return self._train_step_mil_impl(variables, opt_state, batch, key,
                                         lr, step)

    @lazy_jit(train_compiler_options, static_argnums=(0,),
              donate_argnums=(1, 2))
    def train_step_mil_donated(self, variables, opt_state, batch, key, lr,
                               step):
        """``train_step_mil`` with donated (variables, opt_state) input
        buffers (see ``train_step_donated``)."""
        return self._train_step_mil_impl(variables, opt_state, batch, key,
                                         lr, step)

    # ------------------------------------------------------------------ #
    def _eval_impl(self, variables, batch, key, step):
        """Body of ``eval_step`` (also run under shard_map by
        ParallelEngine when the head is tensor-parallel)."""
        cfg = self.cfg
        n_s = batch["data"].shape[0]
        params = {"trunk": variables["trunk"]["params"],
                  "head": variables["head"]["params"]}
        var = self._split_vars(variables, params)
        k_at, k_pt = jax.random.split(key)

        feat, rpn_score, rpn_bbox, _ = self.model.apply_trunk(
            var, batch["data"], train=False)
        rpn_prob = rpn_softmax(rpn_score, self.num_anchors)

        at = anchor_target_layer_joint(
            k_at, batch["gt_boxes"], batch["num_gt_boxes"], batch["im_info"],
            self.anchors, num_supervised=n_s, **self._at_kwargs)

        props = proposal_layer(
            rpn_prob, rpn_bbox, batch["im_info"], self.anchors,
            num_anchors=self.num_anchors,
            pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            min_size=float(cfg.TEST.RPN_MIN_SIZE))

        samples = proposal_target_layer(
            k_pt, props.boxes, props.valid, batch["gt_boxes"],
            batch["num_gt_boxes"],
            include_gt=False,  # is_training=False skips the GT append
            **self._pt_kwargs)

        rois_all = _rois5(samples.rois, 0)
        pooled = self._pool_for_head(feat, samples.rois)
        cls_score, bbox_pred, _ = self._apply_head(var, pooled, train=False)

        r = cfg.TRAIN.BATCH_SIZE
        if cfg.TRAIN.WS_LOSS_USE_ADAPTIVE_SCALE_FACTOR:
            mil_scale = L.mil_adaptive_scale(jnp.asarray(step, jnp.int32))
        else:
            mil_scale = cfg.TRAIN.WS_LOSS_SCALE_FACTOR
        bag_labels = batch["im_info"][:, 3].astype(jnp.int32)

        # PER-IMAGE losses (fields shaped [B]): the reference evaluates the
        # test set one image at a time and accumulates per-image loss values
        # (train_bus.py:792-816); a batched eval step must preserve that
        # per-image normalization (e.g. RPN CE divides by each image's own
        # non-ignored anchor count), so each loss is computed on the image's
        # slice.  With B=1 this is the identical computation.
        per = []
        for i in range(n_s):
            sl = slice(i * r, (i + 1) * r)
            rpn_cls = L.rpn_class_loss(rpn_score[i:i + 1],
                                       at.labels[i:i + 1], self.num_anchors)
            rpn_box = L.rpn_box_loss(
                rpn_bbox[i:i + 1], at.bbox_targets[i:i + 1],
                at.inside_weights[i:i + 1], at.outside_weights[i:i + 1],
                1, self.num_anchors)
            labels_i = samples.labels[i].reshape(-1)
            rcnn_cls = L.rcnn_class_loss(cls_score[sl], labels_i)
            rcnn_box = L.rcnn_box_loss(
                bbox_pred[sl], samples.bbox_targets[i].reshape(r, -1),
                samples.inside_weights[i].reshape(r, -1),
                samples.outside_weights[i].reshape(r, -1), labels_i)
            # test-time MIL bag CE over the sampled rois with the image's
            # BIRADS bag label (the reference fetches mil_cross_entropy per
            # eval image, train_bus.py:445-451,519-520)
            bag_logits = get_bag_logits(
                cls_score[sl].reshape(1, r, -1), (labels_i >= 0)[None],
                bag_labels[i:i + 1], self.selector_pair)
            mil = L.mil_class_loss(bag_logits, bag_labels[i:i + 1],
                                   cfg.TRAIN.WS_MAL_PCT, mil_scale)
            per.append(StepLosses(rpn_cls + rpn_box + rcnn_cls + rcnn_box,
                                  rpn_cls, rpn_box, rcnn_cls, rcnn_box, mil))
        ls = StepLosses(*[jnp.stack([p[f] for p in per])
                          for f in range(len(StepLosses._fields))])
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        return ls, rois_all, cls_prob, bbox_pred, samples.labels.reshape(-1)

    @partial(jax.jit, static_argnums=(0,))
    def eval_step(self, variables, batch, key, step=0):
        """In-training evaluation forward (reference call stack 3.4): the
        training pipeline with is_training=False — TEST proposal budgets,
        no GT appended to candidates, running BN stats, no dropout — PER-IMAGE
        losses (StepLosses fields shaped [B]) plus detection outputs from the
        SAMPLED rois (train_bus.py:792-892).  ``step`` feeds the adaptive MIL
        scale like the reference's fetched ``mil_cross_entropy`` at the
        current global step (:445-451)."""
        return self._eval_impl(variables, batch, key, step)

    # ------------------------------------------------------------------ #
    def _inference_impl(self, variables, data, im_info):
        """Pure test-graph forward (VGGnet_test_bus.py:23-69 /
        test_bus.py:146-240): proposals with TEST budgets feed the head
        directly; returns (rois5, valid, cls_score, cls_prob, bbox_pred)."""
        cfg = self.cfg
        params = {"trunk": variables["trunk"]["params"],
                  "head": variables["head"]["params"]}
        var = self._split_vars(variables, params)

        feat, rpn_score, rpn_bbox, _ = self.model.apply_trunk(
            var, data, train=False)
        rpn_prob = rpn_softmax(rpn_score, self.num_anchors)
        props = proposal_layer(
            rpn_prob, rpn_bbox, im_info, self.anchors,
            num_anchors=self.num_anchors,
            pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            min_size=float(cfg.TEST.RPN_MIN_SIZE))
        rois = _rois5(props.boxes, 0)
        pooled = self._pool_for_head(feat, props.boxes)
        cls_score, bbox_pred, _ = self._apply_head(var, pooled, train=False)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        return rois, props.valid.reshape(-1), cls_score, cls_prob, bbox_pred

    @lazy_jit(serving_compiler_options, static_argnums=(0,))
    def inference_step(self, variables, data, im_info):
        return self._inference_impl(variables, data, im_info)

    # ------------------------------------------------------------------ #
    # int8 quantized serving (additive; models/quantize.py)
    # ------------------------------------------------------------------ #
    def quantize_for_serving(self, variables, calib_batches=None,
                             act_scales=None):
        """Post-training int8 quantization of the trunk for serving.

        ``calib_batches`` iterates preprocessed [B, H, W, 3] serving
        inputs for activation-range calibration; pass ``act_scales``
        instead to reuse recorded ranges.  Returns the quantized
        pytree consumed by :meth:`inference_step_quant`.  VGG quantizes
        the trunk (fc head stays f32); ResNet quantizes trunk AND the
        group3 per-ROI conv head (norm None/'BN' only — GN is
        data-dependent at serving time, models/quantize.py)."""
        if self.model.backbone == "VGGnet":
            from wssdl_bus_tpu.models.quantize import (calibrate_vgg_trunk,
                                                       quantize_vgg_trunk)
            if act_scales is None:
                if calib_batches is None:
                    raise ValueError("need calib_batches or act_scales")
                act_scales = calibrate_vgg_trunk(self.model, variables,
                                                 calib_batches)
            return quantize_vgg_trunk(variables, act_scales)
        from wssdl_bus_tpu.models.quantize import (calibrate_resnet,
                                                   quantize_resnet)
        if act_scales is None:
            if calib_batches is None:
                raise ValueError("need calib_batches or act_scales")
            act_scales = calibrate_resnet(
                self.model, variables, calib_batches,
                spatial_scale=1.0 / self.cfg.FEAT_STRIDE)
        return quantize_resnet(variables, self.model.norm,
                               self.model.depth, act_scales)

    def _inference_quant_impl(self, qtrunk, head_vars, data, im_info):
        """:meth:`_inference_impl` with the int8 trunk: same outputs
        (rois5, valid, cls_score, cls_prob, bbox_pred); the head and all
        detection geometry stay float32.  Needs only the HEAD variables —
        the trunk lives in ``qtrunk`` (so quantized serving artifacts ship
        no float trunk copy, serve/__init__.py)."""
        cfg = self.cfg
        if self.model.backbone == "VGGnet":
            from wssdl_bus_tpu.models.quantize import quant_trunk_apply
            feat, rpn_score, rpn_bbox = quant_trunk_apply(qtrunk, data)
        else:
            from wssdl_bus_tpu.models.quantize import \
                quant_resnet_trunk_apply
            feat, rpn_score, rpn_bbox = quant_resnet_trunk_apply(
                qtrunk, data, self.model.norm, self.model.depth)
        rpn_prob = rpn_softmax(rpn_score, self.num_anchors)
        props = proposal_layer(
            rpn_prob, rpn_bbox, im_info, self.anchors,
            num_anchors=self.num_anchors,
            pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            min_size=float(cfg.TEST.RPN_MIN_SIZE))
        rois = _rois5(props.boxes, 0)
        pooled = self._pool_for_head(feat, props.boxes)
        if self.model.backbone == "VGGnet":
            cls_score, bbox_pred, _ = self.model.apply_head(
                {"head": head_vars}, pooled, train=False)
        else:
            from wssdl_bus_tpu.models.quantize import \
                quant_resnet_head_apply
            cls_score, bbox_pred = quant_resnet_head_apply(
                qtrunk, pooled, self.model.norm, self.model.depth)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        return rois, props.valid.reshape(-1), cls_score, cls_prob, bbox_pred

    @lazy_jit(serving_compiler_options, static_argnums=(0,))
    def inference_step_quant(self, qtrunk, variables, data, im_info):
        """:meth:`inference_step` with the int8 trunk (full ``variables``
        accepted for surface symmetry; only the head is used)."""
        return self._inference_quant_impl(qtrunk, variables["head"],
                                          data, im_info)
