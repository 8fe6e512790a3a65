"""Sharded train / inference steps over a ("data", "model") mesh.

Batch layout: the GLOBAL joint batch stacks each data-slot's local joint batch
contiguously along axis 0 —

    [slot0: n_s supervised, n_ws weak | slot1: n_s, n_ws | ...]

so sharding axis 0 with PartitionSpec("data") hands every slot exactly the
per-device batch shape the single-device Engine code already handles.  Inside
``jax.shard_map`` each slot computes its own full forward + losses + grads
(the reference's entire ``sess.run`` step, SURVEY.md §3.1) and the gradients
are ``pmean``-ed over the data axis; the RCNN head runs tensor-parallel over
the model axis (``parallel.tp_head``).  The optimizer update happens once,
outside the shard_map but inside the same jit, on the averaged grads.

The reference has no distributed training at all (SURVEY.md §2.8); parity
constraint is only that each data slot reproduces the single-device step
semantics, which is tested in tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.parallel.tp_head import head_pspecs, tp_head_apply
from wssdl_bus_tpu.train import losses as L
from wssdl_bus_tpu.train.engine import Engine


def _shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


class ParallelEngine(Engine):
    """Engine whose train/inference steps run SPMD over a mesh.

    ``mesh`` must have axes ("data", "model").  Tensor parallelism of the
    head activates when the model axis extent > 1 (VGG backbone only — the
    ResNet head is convolutional and scales via the data axis).
    """

    def __init__(self, model: FasterRCNN, cfg: Config, canvas_hw,
                 mesh: Mesh, **kw):
        super().__init__(model, cfg, canvas_hw, **kw)
        self.mesh = mesh
        self.n_model = mesh.shape.get("model", 1)
        self.tp = self.n_model > 1 and model.backbone == "VGGnet"

    def _static_key(self):
        # Mesh participates in trace identity: same config on a different
        # mesh (or device order) is a different SPMD program.
        return super()._static_key() + (self.mesh,)

    # ------------------------------------------------------------------ #
    def _apply_head(self, var, pooled, train, dropout_rng=None):
        if not self.tp:
            return super()._apply_head(var, pooled, train, dropout_rng)
        cls_score, bbox_pred = tp_head_apply(
            var["head"]["params"], pooled, train=train,
            dropout_rng=dropout_rng, axis="model")
        return cls_score, bbox_pred, None

    # ------------------------------------------------------------------ #
    # PartitionSpec trees
    # ------------------------------------------------------------------ #
    def param_specs(self, params):
        specs = jax.tree.map(lambda _: P(), params)
        if self.tp:
            specs["head"] = head_pspecs(params["head"], "model")
        return specs

    def variable_specs(self, variables):
        specs = jax.tree.map(lambda _: P(), variables)
        if self.tp:
            specs["head"]["params"] = head_pspecs(
                variables["head"]["params"], "model")
        return specs

    def _fold_slot_key(self, key):
        """Per-slot RNG stream.  With a single data slot the key passes
        through unchanged so a (1, 1) mesh reproduces the single-device
        Engine trajectory bitwise (tested in tests/test_parallel.py)."""
        if self.mesh.shape.get("data", 1) == 1:
            return key
        return jax.random.fold_in(key, jax.lax.axis_index("data"))

    def _pmean_unsharded(self, grads, specs, axis):
        """pmean over ``axis`` every leaf whose spec does not shard on it.
        Model-sharded leaves hold disjoint gradient shards (already exact);
        everything else differs across model ranks only through the sharded
        dropout masks and must be averaged."""
        def one(g, s):
            sharded = any(axis == a or (isinstance(a, tuple) and axis in a)
                          for a in s if a is not None)
            return g if sharded else jax.lax.pmean(g, axis)
        return jax.tree.map(one, grads, specs,
                            is_leaf=lambda x: isinstance(x, P))

    # ------------------------------------------------------------------ #
    def _train_step_parallel_impl(self, variables, opt_state, batch, key,
                                  lr, step):
        cfg = self.cfg
        var_specs = self.variable_specs(variables)
        p_specs = {"trunk": var_specs["trunk"]["params"],
                   "head": var_specs["head"]["params"]}

        def per_slot(variables, batch, key, step):
            key = self._fold_slot_key(key)

            def loss_fn(params):
                (feat, rpn_score, rpn_bbox, at, props, samples, rois_all,
                 cls_score, bbox_pred, bs_updates) = self._forward_train(
                     params, variables, batch, key, step)
                ls = self._losses(rpn_score, rpn_bbox, at, props, samples,
                                  cls_score, bbox_pred, batch, step)
                wd = L.weight_decay_loss(params, cfg.TRAIN.WEIGHT_DECAY)
                return ls.total + wd + ls.mil_cls, (ls, bs_updates)

            params = {"trunk": variables["trunk"]["params"],
                      "head": variables["head"]["params"]}
            grads, (ls, bs) = jax.grad(loss_fn, has_aux=True)(params)
            grads = jax.lax.pmean(grads, "data")
            if self.tp:
                grads = self._pmean_unsharded(grads, p_specs, "model")
            ls = jax.lax.pmean(ls, "data")
            bs = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), bs)
            return grads, ls, bs

        grads, ls, bs_updates = _shard_map(
            per_slot, self.mesh,
            in_specs=(var_specs, P("data"), P(), P()),
            out_specs=(p_specs, P(), P()),
        )(variables, batch, key, step)

        params = {"trunk": variables["trunk"]["params"],
                  "head": variables["head"]["params"]}
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {}
        for part in ("trunk", "head"):
            v = dict(variables[part])
            v["params"] = params[part]
            if bs_updates.get(part):
                v["batch_stats"] = bs_updates[part]
            new_vars[part] = v
        return new_vars, opt_state, ls

    @partial(jax.jit, static_argnums=(0,))
    def train_step_parallel(self, variables, opt_state, batch, key, lr, step):
        """Combined train step, SPMD: grads pmean'd over data, head TP over
        model, one replicated optimizer update."""
        return self._train_step_parallel_impl(variables, opt_state, batch,
                                              key, lr, step)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def train_step_parallel_donated(self, variables, opt_state, batch, key,
                                    lr, step):
        """``train_step_parallel`` with donated (variables, opt_state)
        buffers — the Solver hot-loop variant (inputs invalid after)."""
        return self._train_step_parallel_impl(variables, opt_state, batch,
                                              key, lr, step)

    # ------------------------------------------------------------------ #
    def _train_step_mil_parallel_impl(self, variables, opt_state, batch,
                                      key, lr, step):
        var_specs = self.variable_specs(variables)
        p_specs = {"trunk": var_specs["trunk"]["params"],
                   "head": var_specs["head"]["params"]}

        def per_slot(variables, batch, key, step):
            key = self._fold_slot_key(key)
            params = {"trunk": variables["trunk"]["params"],
                      "head": variables["head"]["params"]}

            def loss_fn(params):
                return self._mil_loss(params, variables, batch, key, step)

            mil, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.pmean(grads, "data")
            if self.tp:
                grads = self._pmean_unsharded(grads, p_specs, "model")
            return grads, jax.lax.pmean(mil, "data")

        grads, mil = _shard_map(
            per_slot, self.mesh,
            in_specs=(var_specs, P("data"), P(), P()),
            out_specs=(p_specs, P()),
        )(variables, batch, key, step)

        params = {"trunk": variables["trunk"]["params"],
                  "head": variables["head"]["params"]}
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {}
        for part in ("trunk", "head"):
            v = dict(variables[part])
            v["params"] = params[part]
            new_vars[part] = v
        return new_vars, opt_state, mil

    @partial(jax.jit, static_argnums=(0,))
    def train_step_mil_parallel(self, variables, opt_state, batch, key, lr,
                                step):
        """Weak (MIL-only) step of the ALTERNATING regime, SPMD: each data
        slot holds its own weak minibatch, grads pmean over data, head TP
        over model.  Like Engine.train_step_mil, BN running stats are NOT
        updated (train_bus.py:357-361 vs :391-394)."""
        return self._train_step_mil_parallel_impl(variables, opt_state,
                                                  batch, key, lr, step)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def train_step_mil_parallel_donated(self, variables, opt_state, batch,
                                        key, lr, step):
        """``train_step_mil_parallel`` with donated (variables, opt_state)
        buffers (inputs invalid after)."""
        return self._train_step_mil_parallel_impl(variables, opt_state,
                                                  batch, key, lr, step)

    # ------------------------------------------------------------------ #
    @partial(jax.jit, static_argnums=(0,))
    def inference_step_parallel(self, variables, data, im_info):
        """Batch-parallel inference: each data slot detects its own images
        (per-image semantics identical to Engine.inference_step)."""
        var_specs = self.variable_specs(variables)

        def per_slot(variables, data, im_info):
            return self._inference_impl(variables, data, im_info)

        rois, valid, cls_score, cls_prob, bbox_pred = _shard_map(
            per_slot, self.mesh,
            in_specs=(var_specs, P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        )(variables, data, im_info)
        # per_slot numbers its rois5 batch column locally; rewrite it with
        # the GLOBAL image index so the output is indistinguishable from the
        # single-device batched step's
        n = data.shape[0]
        p = rois.shape[0] // n
        gidx = jnp.repeat(jnp.arange(n, dtype=rois.dtype), p)
        rois = rois.at[:, 0].set(gidx)
        return rois, valid, cls_score, cls_prob, bbox_pred

    # ------------------------------------------------------------------ #
    def inference_step(self, variables, data, im_info):
        """Serving dispatch: shard the image batch over the data axis when
        it divides evenly (the padded serving batches from test_net always
        do); otherwise fall back to the replicated single-program step (not
        available with a TP head — its collectives need the mesh axes)."""
        n_data = self.mesh.shape.get("data", 1)
        if data.shape[0] % n_data == 0:
            return self.inference_step_parallel(variables, data, im_info)
        if self.tp:
            raise ValueError(
                f"batch {data.shape[0]} not divisible by mesh data axis "
                f"{n_data}; required with a tensor-parallel head")
        return super().inference_step(variables, data, im_info)

    def eval_step(self, variables, batch, key, step=0):
        """In-training eval on a mesh.  When the eval batch divides the
        data axis (and the head is not TP, whose collectives need the full
        mesh in scope on a replicated batch), images are SHARDED over the
        data slots — n_data images per dispatch for the cost of one;
        otherwise the batch is replicated and every slot computes it."""
        n_data = self.mesh.shape.get("data", 1)
        if (not self.tp and n_data > 1
                and batch["data"].shape[0] % n_data == 0):
            return self._eval_step_sharded(variables, batch, key, step)
        return self._eval_step_replicated(variables, batch, key, step)

    @partial(jax.jit, static_argnums=(0,))
    def _eval_step_replicated(self, variables, batch, key, step=0):
        var_specs = self.variable_specs(variables)

        def per_slot(variables, batch, key, step):
            return self._eval_impl(variables, batch, key, step)

        return _shard_map(
            per_slot, self.mesh,
            in_specs=(var_specs, P(), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
        )(variables, batch, key, step)

    @partial(jax.jit, static_argnums=(0,))
    def _eval_step_sharded(self, variables, batch, key, step=0):
        var_specs = self.variable_specs(variables)

        def per_slot(variables, batch, key, step):
            # per-slot key stream, like the train steps: without the fold
            # every slot would draw the SAME anchor/ROI sampling subkeys
            # for its local image indices
            key = self._fold_slot_key(key)
            return self._eval_impl(variables, batch, key, step)

        ls, rois, cls_prob, bbox_pred, labels = _shard_map(
            per_slot, self.mesh,
            in_specs=(var_specs, P("data"), P(), P()),
            out_specs=(P("data"), P("data"), P("data"), P("data"),
                       P("data")),
        )(variables, batch, key, step)
        # slot-local rois batch indices -> global image indices (same
        # post-pass as inference_step_parallel)
        n = batch["data"].shape[0]
        p = rois.shape[0] // n
        rois = rois.at[:, 0].set(
            jnp.repeat(jnp.arange(n, dtype=rois.dtype), p))
        return ls, rois, cls_prob, bbox_pred, labels

    # ------------------------------------------------------------------ #
    def shard_batch(self, batch):
        """Place a global joint batch with the data-axis layout."""
        sh = NamedSharding(self.mesh, P("data"))
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    def replicate(self, tree):
        """Place params/opt state replicated (TP shards resolve inside jit)."""
        sh = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
