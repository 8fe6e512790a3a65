"""The solver: training loops with periodic in-training evaluation.

TPU-native re-design of ``SolverWrapper`` (``/root/reference/code/lib/
fast_rcnn/train_bus.py:96-957``):

  * ``train_combined``    — joint supervised+weak minibatches, one fused SGD
    update per iteration (train_model, :595-957);
  * ``train_alternating`` — separate supervised / weak SGD steps with two
    independent optimizer states (train_model_alter, :175-592);
  * periodic in-loop evaluation over the whole test set using the TRAINING
    pipeline at is_training=False (losses + detections from the sampled ROIs,
    NMS, CorLoc/AP eval — :792-892), which also drives the 'rop' LR schedule;
  * snapshots every SNAPSHOT_ITERS + at the end (orbax, train/checkpoint.py);
  * stdout/log.txt/TensorBoard observability with the reference's cadence
    (DISPLAY / TEST_ITERS) and tag names (:901-948).

Differences by design: losses never leave the device mid-step; the data layer
prefetches on a host thread; LR is resolved host-side and passed as a scalar.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.data.loader import (Prefetcher, RoIDataLayer,
                                       RoIDataLayerJoint)
from wssdl_bus_tpu.data.minibatch import get_minibatch
from wssdl_bus_tpu.evaluate.detect import apply_nms_per_class
from wssdl_bus_tpu.train.checkpoint import save_checkpoint
from wssdl_bus_tpu.train.engine import Engine
from wssdl_bus_tpu.train.schedules import build_schedule
from wssdl_bus_tpu.utils import MetricLogger, Timer

LOSS_NAMES = ("total", "rpn_cls", "rpn_box", "rcnn_cls", "rcnn_box", "mil_cls")


class Solver:
    """Drives one training run (one model, one canvas, one output dir)."""

    def __init__(self, engine: Engine, cfg: Config, net_name: str,
                 roidb_train_s, roidb_train_ws, imdb_test, roidb_test,
                 output_dir: str, lr_scheduling: str = "const",
                 max_iters: int = 60000, pretrained: Optional[str] = None,
                 use_prefetch: Optional[bool] = None,
                 seed: Optional[int] = None,
                 vis: bool = False, resume: bool = False,
                 eval_batch: int = 1):
        self.eng = engine
        # multi-device: a ParallelEngine carries a ("data","model") mesh;
        # the loaders then assemble one contiguous per-slot global batch per
        # step and the parallel step functions are used (reference has no
        # distributed layer at all, SURVEY.md §2.8)
        self.mesh = getattr(engine, "mesh", None)
        self.n_slots = (self.mesh.shape.get("data", 1)
                        if self.mesh is not None else 1)
        self.cfg = cfg
        self.net_name = net_name
        self.roidb_train_s = roidb_train_s
        self.roidb_train_ws = roidb_train_ws
        self.imdb_test = imdb_test
        self.roidb_test = roidb_test
        self.output_dir = output_dir
        self.max_iters = max_iters
        # None defers to cfg.TRAIN.USE_PREFETCH (reference config.py:172;
        # its layer_bus.py honored the key via a BlobFetcher process) —
        # an explicit argument (CLI --prefetch/--no_prefetch) wins
        self.use_prefetch = (cfg.TRAIN.USE_PREFETCH if use_prefetch is None
                             else use_prefetch)
        # images per device step in periodic_eval.  1 = the reference's
        # per-image cadence (train_bus.py:800-816); >1 packs a whole batch
        # per eval_step dispatch (per-image loss normalization is preserved
        # — eval_step returns [B] per-image losses — only the jax.random
        # draw grouping changes, one key per batch instead of per image)
        self.eval_batch = max(1, int(eval_batch))
        self.vis = vis
        os.makedirs(output_dir, exist_ok=True)
        self.logger = MetricLogger(output_dir)
        self.schedule = build_schedule(lr_scheduling, cfg.TRAIN.LEARNING_RATE,
                                       max_iters)
        # bbox-regression target means/stds over the supervised roidb, like
        # SolverWrapper's ctor (train_bus.py:125-128).  With HAS_RPN these
        # feed only the (identity-by-default) snapshot normalization dance,
        # but the attached per-entry 'bbox_targets' keep roidb parity.
        from wssdl_bus_tpu.data.targets import add_bbox_regression_targets
        if roidb_train_s and "max_classes" in roidb_train_s[0]:
            self.bbox_means, self.bbox_stds = add_bbox_regression_targets(
                roidb_train_s, cfg)
        else:  # unprepared roidb (tests with synthetic entries)
            self.bbox_means = self.bbox_stds = None

        self.rng = np.random.RandomState(
            cfg.RNG_SEED if seed is None else seed)
        self.key = jax.random.PRNGKey(cfg.RNG_SEED if seed is None else seed)
        # Dedicated eval-time stream: periodic_eval runs on the main thread
        # while prefetch workers draw from their own per-layer streams —
        # np.random.RandomState is NOT thread-safe, so streams are never
        # shared across threads (each seeded deterministically from self.rng)
        self.eval_rng = np.random.RandomState(self.rng.randint(2 ** 31))

        self.variables, self.opt_state = self.eng.init(
            jax.random.PRNGKey(cfg.RNG_SEED if seed is None else seed))
        if pretrained:
            from wssdl_bus_tpu.models.pretrained import load_pretrained_auto
            # min_loaded=1: fail fast if the checkpoint's scope names match
            # NOTHING (ignore-missing semantics would otherwise train from
            # scratch while claiming success)
            self.variables = load_pretrained_auto(
                pretrained, self.variables, self.eng.model.backbone,
                verbose=True, min_loaded=1, pixel_mean=self.cfg.PIXEL_MEAN)

        # mid-training resume — a capability the reference LACKS (its
        # checkpoints are only ever consumed by test.py, SURVEY.md §5.4).
        # Restored: params, optimizer state(s), step, LR-schedule state,
        # test-loss logs, jax key stream, eval RNG, WS-update counter,
        # data-layer draw state (RNG streams + shuffled cursor positions,
        # consumption-synchronous even under prefetch) and the loss-display
        # accumulators — a resumed run reproduces the uninterrupted
        # trajectory exactly.
        self.start_iter = 0
        self._snap_writer = None  # lazy orbax checkpointer, overlapped writes
        self._resume_ckpt = None
        self._saved_test_loss_logs = []
        self._saved_ws_step = 0
        self._saved_layer_state = None
        self._saved_training_loss = None
        self._saved_carry = None
        if resume:
            from wssdl_bus_tpu.train.checkpoint import (latest_checkpoint,
                                                        load_checkpoint,
                                                        load_host_state)
            ckpt = latest_checkpoint(output_dir)
            if ckpt is not None:
                self.variables, step, self.opt_state = load_checkpoint(
                    ckpt, self.variables, self.opt_state)
                self.start_iter = step
                self._resume_ckpt = ckpt
                host = load_host_state(ckpt)
                if host:
                    # continue the exact trajectory: LR-schedule state, the
                    # jax key stream, loss logs driving 'rop'
                    self.schedule.load_state_dict(host.get("schedule", {}))
                    self._saved_test_loss_logs = host.get(
                        "test_loss_logs", [])
                    self._saved_ws_step = host.get("ws_step", 0)
                    self._saved_layer_state = host.get("data_layers")
                    self._saved_training_loss = host.get("training_loss")
                    self._saved_carry = host.get("carry")
                    if "key" in host:
                        self.key = jnp.asarray(host["key"])
                    if "eval_rng" in host:
                        self.eval_rng.set_state(host["eval_rng"])
                print(f"Resumed from {ckpt} at iter {step}")

        if self.mesh is not None:
            # commit the train state to the mesh replicated; TP shards
            # resolve inside the jitted steps via their PartitionSpecs
            self.variables = self.eng.replicate(self.variables)
            self.opt_state = self.eng.replicate(self.opt_state)

    # ------------------------------------------------------------------ #
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _put_batch(self, blobs):
        """Device placement for one training batch: data-axis sharded on a
        mesh, plain transfer otherwise."""
        if self.mesh is not None:
            return self.eng.shard_batch(blobs)
        return {k: jnp.asarray(v) for k, v in blobs.items()}

    @property
    def _train_step(self):
        # donated variants: the solver reassigns self.variables/opt_state
        # from the outputs every step, so in-place buffer reuse is safe and
        # saves the copy of every pass-through leaf (frozen params, BN
        # stats, adam moments of masked-out params)
        return (self.eng.train_step_parallel_donated
                if self.mesh is not None else self.eng.train_step_donated)

    def _maybe_trace(self, it: int):
        """DEBUG_TIMELINE analog (reference dumps Chrome traces per step,
        train_bus.py:353-355): profile device steps 1-3 (post-compile) into
        <output_dir>/jax_trace, viewable in TensorBoard/Perfetto.  Called
        BEFORE each step; the stop hook runs after the step."""
        if not self.cfg.TRAIN.DEBUG_TIMELINE:
            return
        start = 1 if self.max_iters > 1 else 0
        if it == start:
            jax.profiler.start_trace(
                os.path.join(self.output_dir, "jax_trace"))
            self._tracing = True

    def _maybe_trace_stop(self, it: int):
        if getattr(self, "_tracing", False) \
                and it >= min(3, self.max_iters - 1):
            jax.profiler.stop_trace()
            self._tracing = False

    def _regime_restore(self, key: str, layers: dict):
        """Apply the saved regime-keyed resume state to this loop's data
        layers and return its (training_loss, carry) accumulators.

        ``key``: the draw-state key this regime snapshots under ('joint'
        for combined, 's' for alternating); ``layers``: state key → layer.
        A snapshot from the OTHER regime must not leak its draw state or
        partial loss sums into this run's logs — params/optimizer are
        reused but these start fresh, with a printed notice."""
        same_regime = bool(self._saved_layer_state
                           and key in self._saved_layer_state)
        if self._saved_layer_state and not same_regime:
            print("resume: snapshot is from the other training regime; "
                  "data-layer state and loss accumulators start fresh")
        if same_regime:
            for k, layer in layers.items():
                if self._saved_layer_state.get(k) is not None:
                    layer.load_state_dict(self._saved_layer_state[k])
        training_loss = (np.asarray(self._saved_training_loss).copy()
                         if same_regime
                         and self._saved_training_loss is not None
                         else np.zeros((6,)))
        carry = (np.asarray(self._saved_carry).copy()
                 if same_regime and self._saved_carry is not None
                 else np.array([0, 0, 0, 0, 0, float(np.log(3.0))]))
        return training_loss, carry

    def snapshot(self, step: int, opt_state_ws=None, test_loss_logs=None,
                 ws_step: int = 0, data_layer_state=None, training_loss=None,
                 carry=None):
        t = self.cfg.TRAIN
        host = {"schedule": self.schedule.state_dict(),
                "test_loss_logs": list(test_loss_logs or []),
                "key": np.asarray(self.key),
                "eval_rng": self.eval_rng.get_state(),
                "ws_step": int(ws_step),
                # data-layer draw state (RNG stream + shuffled cursor
                # positions), captured synchronously with consumption (see
                # Prefetcher.state_dict) — with it, --resume re-draws the
                # exact batch sequence an uninterrupted run would see
                "data_layers": data_layer_state,
                "training_loss": (None if training_loss is None
                                  else np.asarray(training_loss)),
                "carry": None if carry is None else np.asarray(carry)}
        # fetch to host first: snapshots must restore onto ANY device
        # topology (single chip or a different mesh), so nothing
        # mesh-sharded may reach orbax.  The host copies then flow to disk
        # on orbax's background threads (per-component writers; orbax
        # serializes successive saves per component, bounding in-flight
        # copies) while training continues — at the reference's
        # SNAPSHOT_ITERS=10 default a synchronous write would stall the
        # loop every ~0.5 s of steps.
        if self._snap_writer is None:
            from wssdl_bus_tpu.train.checkpoint import make_snapshot_writers
            self._snap_writer = make_snapshot_writers()
        path = save_checkpoint(self.output_dir, t.SNAPSHOT_PREFIX,
                               t.SNAPSHOT_INFIX, step + 1,
                               jax.device_get(self.variables),
                               jax.device_get(self.opt_state),
                               opt_state_ws=(None if opt_state_ws is None
                                             else jax.device_get(opt_state_ws)),
                               host_state=host,
                               checkpointers=self._snap_writer)
        print(f"Writing snapshot to: {path}")

    def _finish_snapshots(self):
        """Block until any in-flight overlapped snapshot write is durable —
        call before leaving a training loop (a caller may immediately
        --resume from, or evaluate, the final snapshot)."""
        from wssdl_bus_tpu.train.checkpoint import wait_snapshot_writers
        wait_snapshot_writers(self._snap_writer)

    # ------------------------------------------------------------------ #
    def _display(self, it: int, loss_vals):
        print(f"iter: {it + 1} / {self.max_iters}")
        print(f"total_loss: {loss_vals[0]:.4f}")
        print("rpn_loss_cls: {:.4f}, rpn_loss_box: {:.4f}, loss_cls: {:.4f}, "
              "loss_box: {:.4f}, mil_loss_cls: {:.4f}".format(*loss_vals[1:]))

    def _losses_np(self, ls) -> np.ndarray:
        v = [float(x) for x in ls]
        # reference's training_loss[0] excludes the MIL term (:769-771)
        total_wo_mil = v[1] + v[2] + v[3] + v[4]
        return np.array([total_wo_mil, v[1], v[2], v[3], v[4], v[5]])

    def _losses_np_rows(self, ls) -> np.ndarray:
        """Per-image eval losses [B] per field -> [B, 6] with the
        reference's total-excludes-MIL convention."""
        cols = [np.asarray(x, np.float64).reshape(-1) for x in ls]
        total_wo_mil = cols[1] + cols[2] + cols[3] + cols[4]
        return np.stack([total_wo_mil, cols[1], cols[2], cols[3], cols[4],
                         cols[5]], axis=1)

    def _maybe_vis_eval(self, idx, all_boxes, num_classes, test_dir):
        if not self.vis:
            return
        # qualitative overlays like train_bus.py:824-871
        from wssdl_bus_tpu.data.minibatch import _load_gray
        from wssdl_bus_tpu.evaluate.visualize import save_qualitative
        entry = self.roidb_test[idx]
        save_qualitative(
            _load_gray(entry),
            {j: all_boxes[j][idx] for j in range(1, num_classes)},
            test_dir,
            os.path.splitext(os.path.basename(entry["image"]))[0],
            gt_boxes=entry["boxes"], gt_classes=entry["gt_classes"])

    # ------------------------------------------------------------------ #
    def periodic_eval(self, it: int, cur_lr: float, training_loss,
                      test_loss_logs):
        """Full test-set pass with the training pipeline at
        is_training=False; returns averaged test losses (train_bus.py:792-892).
        """
        cfg = self.cfg
        len_test = len(self.roidb_test)
        num_classes = self.imdb_test.num_classes
        all_boxes = [[[] for _ in range(len_test)]
                     for _ in range(num_classes)]
        test_loss = np.zeros((6,))
        test_dir = os.path.join(self.output_dir, "test")
        os.makedirs(test_dir, exist_ok=True)

        from wssdl_bus_tpu.evaluate.detect import unnormalize_bbox_pred
        from wssdl_bus_tpu.ops.boxes import bbox_transform_inv, clip_boxes

        B = self.eval_batch
        r = cfg.TRAIN.BATCH_SIZE
        for start in range(0, len_test, B):
            idxs = list(range(start, min(start + B, len_test)))
            # pad the tail to the compiled batch size; padded rows are
            # dropped below (per-image losses make the padding free)
            entries = [self.roidb_test[i] for i in idxs]
            entries += [entries[-1]] * (B - len(idxs))
            blobs = get_minibatch(entries, self.net_name, cfg,
                                  self.eng.canvas_hw, is_training=False,
                                  is_ws=False, rng=self.eval_rng)
            ls, rois_b, cls_prob_b, bbox_pred_b, labels_b = \
                self.eng.eval_step(
                    self.variables,
                    {k: jnp.asarray(v) for k, v in blobs.items()},
                    self._next_key(), jnp.int32(it))
            rows = self._losses_np_rows(ls)
            test_loss += rows[:len(idxs)].sum(axis=0)

            rois_b = np.asarray(rois_b).reshape(B, r, 5)
            cls_prob_b = np.asarray(cls_prob_b).reshape(B, r, -1)
            bbox_pred_b = np.asarray(bbox_pred_b).reshape(B, r, -1)
            labels_b = np.asarray(labels_b).reshape(B, r)
            for k, idx in enumerate(idxs):
                im_h, im_w = self.roidb_test[idx]["height"], \
                    self.roidb_test[idx]["width"]
                scale = blobs["im_info"][k, 2]
                # drop unfilled sampler slots (label -1): their rows hold
                # arbitrary unselected candidates, and the reference
                # evaluates only the actually-sampled rois
                # (train_bus.py:811-850)
                filled = labels_b[k] >= 0
                rois = rois_b[k][filled]
                cls_prob = cls_prob_b[k][filled]
                bbox_pred = bbox_pred_b[k][filled]
                boxes = rois[:, 1:5] / scale
                bp = unnormalize_bbox_pred(bbox_pred, cfg)
                # explicit column count: reshape(0, -1) raises on images
                # where the sampler filled no slot (e.g. zero-GT normals)
                pred = np.asarray(clip_boxes(
                    np.asarray(bbox_transform_inv(boxes, bp))
                    .reshape(-1, 4), im_h, im_w)).reshape(len(boxes),
                                                          bp.shape[1])
                per_class = apply_nms_per_class(
                    cls_prob, pred, num_classes, 0.05, cfg.TEST.NMS,
                    cls_agnostic=cfg.TEST.CLS_AGNOSTIC_NMS)
                for j in range(1, num_classes):
                    all_boxes[j][idx] = per_class[j]
                self._maybe_vis_eval(idx, all_boxes, num_classes, test_dir)

        with open(os.path.join(test_dir, "detections.pkl"), "wb") as f:
            pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)
        print("Evaluating detections")
        corloc_list = self.imdb_test.evaluate_detections(
            all_boxes, test_dir, f"{it + 1}")

        training_loss /= cfg.TRAIN.TEST_ITERS
        test_loss /= max(len_test, 1)
        test_loss_logs.append(float(test_loss[0]))
        self.schedule.on_val_end(test_loss_logs)

        scalars = {f"training_loss_{n}": training_loss[i]
                   for i, n in enumerate(
                       ("total", "rpn_loss_cls", "rpn_loss_box", "loss_cls",
                        "loss_box", "mil_loss_cls"))}
        scalars.update({f"test_loss_{n}": test_loss[i]
                        for i, n in enumerate(
                            ("total", "rpn_loss_cls", "rpn_loss_box",
                             "loss_cls", "loss_box", "mil_loss_cls"))})
        if len(corloc_list) >= 3:
            scalars["corloc_benign"] = corloc_list[0]
            scalars["corloc_malignant"] = corloc_list[1]
            scalars["corloc"] = corloc_list[2]
        scalars["lr"] = cur_lr
        self.logger.scalars(it + 1, **scalars)
        self.logger.flush()

        self.logger.text(f"iter: {it + 1} / {self.max_iters}")
        self.logger.text(f"training loss\ntotal_loss: {training_loss[0]}")
        self.logger.text(
            f"rpn_loss_cls: {training_loss[1]}\trpn_loss_box: "
            f"{training_loss[2]}\tloss_cls: {training_loss[3]}\tloss_box: "
            f"{training_loss[4]}\nmil_loss_cls: {training_loss[5]}")
        self.logger.text(f"test loss\ntotal_loss: {test_loss[0]}")
        self.logger.text(
            f"rpn_loss_cls: {test_loss[1]}\trpn_loss_box: {test_loss[2]}\t"
            f"loss_cls: {test_loss[3]}\tloss_box: {test_loss[4]}\n"
            f"mil_loss_cls: {test_loss[5]}")
        self.logger.text(f"lr: {cur_lr}")
        return test_loss

    # ------------------------------------------------------------------ #
    def train_combined(self):
        """The combined-minibatch regime (train_model, train_bus.py:595-957)."""
        cfg = self.cfg
        layer = RoIDataLayerJoint(
            self.roidb_train_s, self.roidb_train_ws, self.net_name, cfg,
            self.eng.canvas_hw,
            rng=np.random.RandomState(self.rng.randint(2 ** 31)),
            slots=self.n_slots, device_prep=cfg.TRAIN.DEVICE_PREP)
        training_loss, _ = self._regime_restore("joint", {"joint": layer})
        if self.use_prefetch:
            layer = Prefetcher(layer)
        timer = Timer()
        test_loss_logs = list(self._saved_test_loss_logs)
        last_snapshot_iter = -1

        def snap(it):
            self.snapshot(it, test_loss_logs=test_loss_logs,
                          data_layer_state={"joint": layer.state_dict()},
                          training_loss=training_loss)

        # losses stay ON DEVICE in the hot loop (each host read is a device
        # round trip — ruinous through remote-attached TPUs) and are drained
        # at every DISPLAY boundary.  Draining MUST be bounded: unmaterialized
        # step outputs pin their step's input buffers on the host (observed:
        # a kernel OOM at 116 GB RSS when futures accumulated for 1500 iters)
        pending = []

        def drain(pending):
            nonlocal training_loss
            for p in pending:
                training_loss += self._losses_np(p)
            return []

        for it in range(self.start_iter, self.max_iters):
            self._maybe_trace(it)
            timer.tic()
            blobs = layer.forward()
            cur_lr = self.schedule(it)
            self.variables, self.opt_state, ls = self._train_step(
                self.variables, self.opt_state, self._put_batch(blobs),
                self._next_key(), jnp.float32(cur_lr), jnp.int32(it))
            pending.append(ls)
            if len(pending) >= 25:  # hard cap independent of DISPLAY
                pending = drain(pending)
            self._maybe_trace_stop(it)
            timer.toc()

            if (it + 1) % cfg.TRAIN.DISPLAY == 0:
                pending = drain(pending)
                self._display(it, self._losses_np(ls))
                print(f"speed: {timer.average_time:.3f}s / iter")
            if (it + 1) % cfg.TRAIN.TEST_ITERS == 0:
                pending = drain(pending)
                self.periodic_eval(it, cur_lr, training_loss, test_loss_logs)
                training_loss = np.zeros((6,))
            # snapshot AFTER the in-loop eval (the reference's opposite
            # order doesn't matter there — it cannot resume): the eval at
            # this iter mutates eval_rng and appends the test-loss log that
            # drives 'rop', so resuming from a pre-eval snapshot would
            # diverge from the uninterrupted trajectory
            if (it + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0:
                pending = drain(pending)
                last_snapshot_iter = it
                snap(it)

        # final snapshot — but ONLY if this run actually stepped: resuming
        # an already-finished run must not overwrite the stored snapshot
        # (that would replace its regime-keyed host state with this
        # regime's fresh state and break a later exact resume)
        if (last_snapshot_iter != self.max_iters - 1
                and self.start_iter < self.max_iters):
            pending = drain(pending)
            snap(self.max_iters - 1)
        self._finish_snapshots()
        layer.close()  # Prefetcher or bare layer; releases slot pools too
        self.logger.close()

    # ------------------------------------------------------------------ #
    def train_alternating(self, s_start: int, s_end: int,
                          ws_start: int, ws_end: int,
                          eng_ws: Optional[Engine] = None):
        """The alternating regime (train_model_alter, train_bus.py:175-592):
        a supervised step when s_start <= it <= s_end, plus a weak MIL-only
        step every WS_TRAIN_INTERVAL iters when ws_start <= it <= ws_end,
        each with its OWN optimizer state (two optimizers, :286-301).

        ``eng_ws``: engine compiled for the weak batch shape
        (n_s=0, n_ws=WS_IMS_PER_BATCH); defaults to one built from self.eng
        with the alternating MIL selector pair (:241-247).
        """
        cfg = self.cfg
        if eng_ws is None:
            kw = dict(num_supervised=0, num_ws=cfg.TRAIN.WS_IMS_PER_BATCH,
                      dataset=self.eng.dataset, opt_name=self.eng.opt_name,
                      selector_pair=("mass_max", "mal_max"),
                      freeze_stem=self.eng.freeze_stem)
            if self.mesh is not None:
                from wssdl_bus_tpu.parallel.engine import ParallelEngine
                eng_ws = ParallelEngine(self.eng.model, cfg,
                                        self.eng.canvas_hw, self.mesh, **kw)
            else:
                eng_ws = Engine(self.eng.model, cfg, self.eng.canvas_hw, **kw)
            eng_ws.tx = self.eng.tx
        mil_step = (eng_ws.train_step_mil_parallel_donated
                    if self.mesh is not None
                    else eng_ws.train_step_mil_donated)
        params = {"trunk": self.variables["trunk"]["params"],
                  "head": self.variables["head"]["params"]}
        opt_state_ws = self.eng.tx.init(params)
        if self._resume_ckpt is not None:
            # restore the WS optimizer's moments too — resetting them would
            # make the resumed trajectory diverge from an uninterrupted run
            from wssdl_bus_tpu.train.checkpoint import load_checkpoint
            restored = load_checkpoint(
                self._resume_ckpt, jax.device_get(self.variables),
                opt_state_ws_like=jax.device_get(opt_state_ws))
            if restored[-1] is not None:
                opt_state_ws = restored[-1]
        if self.mesh is not None:
            opt_state_ws = self.eng.replicate(opt_state_ws)

        layer_s = RoIDataLayer(
            self.roidb_train_s, self.net_name, cfg, self.eng.canvas_hw,
            is_training=True, is_ws=False,
            rng=np.random.RandomState(self.rng.randint(2 ** 31)),
            slots=self.n_slots, device_prep=cfg.TRAIN.DEVICE_PREP)
        layer_ws = RoIDataLayer(
            self.roidb_train_ws, self.net_name, cfg, self.eng.canvas_hw,
            is_training=True, is_ws=True,
            rng=np.random.RandomState(self.rng.randint(2 ** 31)),
            slots=self.n_slots, device_prep=cfg.TRAIN.DEVICE_PREP)
        training_loss, carry = self._regime_restore(
            "s", {"s": layer_s, "ws": layer_ws})
        if self.use_prefetch:
            layer_s, layer_ws = Prefetcher(layer_s), Prefetcher(layer_ws)

        timer = Timer()
        test_loss_logs = list(self._saved_test_loss_logs)
        last_snapshot_iter = -1
        # the reference counts WS optimizer steps separately: the adaptive
        # MIL scale decays on the WS-update count, not the loop iteration
        # (train_bus.py:287-301 — global_step increments only on WS
        # apply_gradients, once per WS_TRAIN_INTERVAL iterations).  Restored
        # across --resume so the MIL scale does not jump back.
        ws_step = self._saved_ws_step

        # device-resident loss accumulation, drained at every DISPLAY
        # boundary (see train_combined for why draining must be bounded)
        pending = []

        # `carry` (from _regime_restore): carry-forward logging like the
        # reference (train_bus.py:362-399) — iterations without a
        # supervised step repeat the previous losses; the MIL slot starts
        # at -log(1/3) before the first WS step

        def snap(it):
            self.snapshot(it, opt_state_ws=opt_state_ws,
                          test_loss_logs=test_loss_logs, ws_step=ws_step,
                          data_layer_state={"s": layer_s.state_dict(),
                                            "ws": layer_ws.state_dict()},
                          training_loss=training_loss, carry=carry)

        def to_np(pair):
            ls_i, mil_i = pair
            v = carry.copy()
            if ls_i is not None:
                v[:5] = self._losses_np(ls_i)[:5]
            if mil_i is not None:
                v[5] = float(mil_i)
            carry[:] = v
            return v

        def drain(pending):
            nonlocal training_loss
            for p in pending:
                training_loss += to_np(p)
            return []

        for it in range(self.start_iter, self.max_iters):
            self._maybe_trace(it)
            timer.tic()
            cur_lr = self.schedule(it)
            ls = mil = None
            if s_start <= it <= s_end:
                blobs = layer_s.forward()
                self.variables, self.opt_state, ls = self._train_step(
                    self.variables, self.opt_state, self._put_batch(blobs),
                    self._next_key(), jnp.float32(cur_lr), jnp.int32(it))
            if (ws_start <= it <= ws_end
                    and (it + 1) % cfg.TRAIN.WS_TRAIN_INTERVAL == 0):
                blobs = layer_ws.forward()
                self.variables, opt_state_ws, mil = mil_step(
                    self.variables, opt_state_ws, self._put_batch(blobs),
                    self._next_key(), jnp.float32(cur_lr),
                    jnp.int32(ws_step))
                ws_step += 1
            last = (ls, mil)
            pending.append(last)
            if len(pending) >= 25:  # hard cap independent of DISPLAY
                pending = drain(pending)
            self._maybe_trace_stop(it)
            timer.toc()

            if (it + 1) % cfg.TRAIN.DISPLAY == 0:
                pending = drain(pending)
                self._display(it, to_np(last))
                print(f"speed: {timer.average_time:.3f}s / iter")
            if (it + 1) % cfg.TRAIN.TEST_ITERS == 0:
                pending = drain(pending)
                self.periodic_eval(it, cur_lr, training_loss, test_loss_logs)
                training_loss = np.zeros((6,))
            # snapshot AFTER the in-loop eval — see train_combined
            if (it + 1) % cfg.TRAIN.SNAPSHOT_ITERS == 0:
                pending = drain(pending)
                last_snapshot_iter = it
                snap(it)

        # only if this run actually stepped — see train_combined
        if (last_snapshot_iter != self.max_iters - 1
                and self.start_iter < self.max_iters):
            pending = drain(pending)
            snap(self.max_iters - 1)
        self._finish_snapshots()
        layer_s.close()  # Prefetcher or bare layer; releases slot pools too
        layer_ws.close()
        self.logger.close()


# ---------------------------------------------------------------------- #
# Function-level entry points (reference train_bus.py:1055-1088)
# ---------------------------------------------------------------------- #
def _build_solver(network, roidb_train_s, roidb_train_ws, imdb_test,
                  roidb_test, output_dir, pretrained_model, opt, lr,
                  lr_scheduling, vis, max_iters, cfg, net_depth, norm_type,
                  dataset, canvas_hw, num_ws, selector_pair, use_prefetch,
                  resume, seed=None, mesh_data=1, mesh_model=1, eval_batch=1,
                  compute_dtype=None, remat=None, freeze_stem=True):
    from wssdl_bus_tpu.data.augment import max_canvas
    from wssdl_bus_tpu.models.detector import build_detector

    cfg = (Config() if cfg is None else cfg).with_overrides(
        ["TRAIN.LEARNING_RATE", str(lr)])
    if canvas_hw is None:
        sizes = [(e["height"], e["width"])
                 for e in roidb_train_s + roidb_train_ws + roidb_test]
        canvas_hw = max_canvas(sizes, cfg.TRAIN.SCALES[0], cfg.TRAIN.MAX_SIZE,
                               crop_margin=(cfg.TRAIN.CROPPING_MAX_MARGIN
                                            if cfg.TRAIN.USE_CROPPING
                                            else 0.0))
    model = build_detector(network, net_depth, norm_type, num_classes=3,
                           compute_dtype=compute_dtype, remat=remat,
                           gn_params=(cfg.TRAIN.GN_MIN_NUM_G,
                                      cfg.TRAIN.GN_MIN_CHS_PER_G))
    from wssdl_bus_tpu.parallel import build_engine
    if network.startswith("VGGnet") and pretrained_model is None \
            and freeze_stem:
        print("WARNING: training VGG FROM SCRATCH with conv1/conv2 frozen "
              "at their random init — the trunk cannot develop features "
              "(reference freezing assumes the ImageNet .npy init, "
              "VGGnet_train_bus.py:45-49).  Pass --unfreeze_stem for "
              "from-scratch runs.")
    eng = build_engine(model, cfg, canvas_hw, mesh_data, mesh_model,
                       num_ws=num_ws, dataset=dataset, opt_name=opt,
                       selector_pair=selector_pair, freeze_stem=freeze_stem)
    return Solver(eng, cfg, network, roidb_train_s, roidb_train_ws, imdb_test,
                  roidb_test, output_dir, lr_scheduling=lr_scheduling,
                  max_iters=max_iters, pretrained=pretrained_model,
                  use_prefetch=use_prefetch, vis=vis, resume=resume,
                  seed=seed, eval_batch=eval_batch)


def train_net(network, roidb_train_s, roidb_train_ws, imdb_test, roidb_test,
              output_dir, pretrained_model=None, max_iters=80000,
              s_start_iter=0, s_end_iter=80000, ws_start_iter=0,
              ws_end_iter=80000, opt="adam", lr=5e-4, lr_scheduling="const",
              vis=False, *, cfg=None, net_depth=18, norm_type="BN",
              dataset="SNUBH", canvas_hw=None, use_prefetch=None,
              resume=False, seed=None, mesh_data=1, mesh_model=1,
              eval_batch=1, compute_dtype=None, remat=None,
              freeze_stem=True) -> Solver:
    """Combined-minibatch training (reference ``train_net``,
    train_bus.py:1073-1088).  The s/ws window arguments are accepted for
    signature parity; like the reference's ``train_model`` they are unused in
    the combined regime.  Differences: the network is a factory name (we build
    the model here — no TF session), plus keyword-only extras for config,
    canvas, resume and the device mesh (mesh_data x mesh_model > 1 trains
    SPMD via parallel.ParallelEngine — additive, SURVEY.md §2.8)."""
    del s_start_iter, s_end_iter, ws_start_iter, ws_end_iter  # parity only
    solver = _build_solver(
        network, roidb_train_s, roidb_train_ws, imdb_test, roidb_test,
        output_dir, pretrained_model, opt, lr, lr_scheduling, vis, max_iters,
        cfg, net_depth, norm_type, dataset, canvas_hw,
        num_ws=None, selector_pair=("mal_max", "mal_max"),
        use_prefetch=use_prefetch, resume=resume, seed=seed,
        mesh_data=mesh_data, mesh_model=mesh_model, eval_batch=eval_batch,
        compute_dtype=compute_dtype, remat=remat, freeze_stem=freeze_stem)
    print("Solving...")
    solver.train_combined()
    print("done solving")
    return solver


def train_net_alter(network, roidb_train_s, roidb_train_ws, imdb_test,
                    roidb_test, output_dir, pretrained_model=None,
                    max_iters=80000, s_start_iter=0, s_end_iter=80000,
                    ws_start_iter=0, ws_end_iter=80000, opt="adam", lr=5e-4,
                    lr_scheduling="const", vis=False, *, cfg=None,
                    net_depth=18, norm_type="BN", dataset="SNUBH",
                    canvas_hw=None, use_prefetch=None, resume=False,
                    seed=None, mesh_data=1, mesh_model=1,
                    eval_batch=1, compute_dtype=None, remat=None,
                    freeze_stem=True) -> Solver:
    """Alternating-minibatch training (reference ``train_net_alter``,
    train_bus.py:1055-1070).  Supervised-only training: pass
    ``ws_start_iter > max_iters`` (train_alter.py:3-5)."""
    solver = _build_solver(
        network, roidb_train_s, roidb_train_ws, imdb_test, roidb_test,
        output_dir, pretrained_model, opt, lr, lr_scheduling, vis, max_iters,
        cfg, net_depth, norm_type, dataset, canvas_hw,
        num_ws=0, selector_pair=("mass_max", "mal_max"),
        use_prefetch=use_prefetch, resume=resume, seed=seed,
        mesh_data=mesh_data, mesh_model=mesh_model, eval_batch=eval_batch,
        compute_dtype=compute_dtype, remat=remat, freeze_stem=freeze_stem)
    print("Solving...")
    solver.train_alternating(s_start_iter, s_end_iter, ws_start_iter,
                             ws_end_iter)
    print("done solving")
    return solver
