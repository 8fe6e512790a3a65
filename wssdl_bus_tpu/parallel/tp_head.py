"""Megatron-style tensor-parallel VGG RCNN head.

The single-device head is fc6(512) -> dropout -> fc7(512) -> dropout ->
cls_score / bbox_pred (``models/vgg.py``, mirroring the reference
``VGGnet_train_bus.py:91-101``).  Sharded over a mesh axis ``model`` of size m:

  fc6  — COLUMN-parallel: kernel [C, 512] sharded to [C, 512/m]; every rank
         holds the full flattened ROI features and produces a 512/m activation
         shard.  ReLU + dropout act locally on the shard.
  fc7  — ROW-parallel: kernel [512, 512] sharded to [512/m, 512]; each rank
         contributes a partial product, summed with ``psum`` over ``model``
         BEFORE bias + ReLU (the Megatron "g" operator).
  cls_score / bbox_pred — tiny (3 / 12 outputs), replicated.

Backward correctness: the input is wrapped in an identity-forward /
psum-backward custom_vjp (the Megatron "f" operator) so the cotangent flowing
into the shared trunk sums each rank's contribution through its fc6 shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _f_operator(x, axis_name):
    return x


def _f_fwd(x, axis_name):
    return x, None


def _f_bwd(axis_name, _res, g):
    return (jax.lax.psum(g, axis_name),)


_f_operator.defvjp(_f_fwd, _f_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _g_operator(x, axis_name):
    return jax.lax.psum(x, axis_name)


def _g_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _g_bwd(axis_name, _res, g):
    # The cotangent of the summed activation is replicated across ranks;
    # each rank's partial product receives it unchanged.  A raw lax.psum
    # here would transpose to ANOTHER psum, scaling every upstream gradient
    # (fc6/fc7 kernels, the trunk) by the model-axis size while leaving the
    # downstream head gradients unscaled — silently-wrong TP training
    # (caught by tests/test_parallel.py:test_tp_head_backward_matches_flax).
    return (g,)


_g_operator.defvjp(_g_fwd, _g_bwd)


def _dropout(x, rate, key):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def tp_head_apply(head_params: dict, roi_feats: jnp.ndarray, *,
                  train: bool, dropout_rng=None, axis: str = "model"):
    """Apply the tensor-parallel head inside a shard_map over ``axis``.

    ``head_params`` is the flax param subtree with fc6/fc7 already sharded
    per ``head_pspecs``.  Returns (cls_score, bbox_pred).
    """
    # Flatten 4-D ROI features in natural NHWC order — must match
    # models.layers.Fc so fc6 kernels are interchangeable between the flax
    # head and this TP head.
    x = roi_feats
    if x.ndim == 4:
        x = x.reshape(x.shape[0], -1)
    x = _f_operator(x, axis)

    k6 = head_params["fc6"]["dense"]["kernel"]
    b6 = head_params["fc6"]["dense"]["bias"]
    h = jax.nn.relu(jnp.dot(x, k6, preferred_element_type=jnp.float32) + b6)
    if train and dropout_rng is not None:
        k_shard = jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis))
        h = _dropout(h, 0.5, k_shard)

    k7 = head_params["fc7"]["dense"]["kernel"]
    b7 = head_params["fc7"]["dense"]["bias"]
    part = jnp.dot(h, k7, preferred_element_type=jnp.float32)
    y = jax.nn.relu(_g_operator(part, axis) + b7)
    if train and dropout_rng is not None:
        # replicated activations -> identical mask on every model rank
        y = _dropout(y, 0.5, jax.random.fold_in(dropout_rng, 7))

    kc = head_params["cls_score"]["dense"]["kernel"]
    bc = head_params["cls_score"]["dense"]["bias"]
    kb = head_params["bbox_pred"]["dense"]["kernel"]
    bb = head_params["bbox_pred"]["dense"]["bias"]
    cls_score = jnp.dot(y, kc, preferred_element_type=jnp.float32) + bc
    bbox_pred = jnp.dot(y, kb, preferred_element_type=jnp.float32) + bb
    return cls_score, bbox_pred


def head_pspecs(head_params: dict, axis: str = "model") -> dict:
    """PartitionSpec tree for the VGG head params under TP."""
    specs = jax.tree.map(lambda _: P(), head_params)
    specs["fc6"]["dense"]["kernel"] = P(None, axis)
    specs["fc6"]["dense"]["bias"] = P(axis)
    specs["fc7"]["dense"]["kernel"] = P(axis, None)
    return specs
