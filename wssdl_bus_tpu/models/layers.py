"""Layer primitives with the reference's exact normalization semantics.

Re-implements the pieces of the reference's layer DSL
(``/root/reference/code/lib/networks/network.py``) that carry semantics:

  * conv / fc initialisation: truncated normal std 0.01 (0.001 for the
    ``bbox_pred`` head), zero biases (network.py:109-111,330-335);
  * ``fc`` flattens 4-D inputs in **(C, H, W)** order — the TF code transposes
    NHWC -> NCHW before reshaping (network.py:326).  This ordering is baked
    into the pretrained Caffe-lineage VGG fc6 weights, so we reproduce it;
  * batch norm with **renorm** (TF ``batch_normalization(renorm=True)`` with
    default, i.e. unclipped, correction; network.py:123, config USE_BRN);
  * the hand-rolled group norm whose grouping interleaves channels
    (``c % G`` is the group index — reshape [..., C] -> [..., C//G, G] with
    moments over (H, W, C//G); network.py:528-545).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def trunc_init(std: float):
    return nn.initializers.truncated_normal(stddev=std)


# --------------------------------------------------------------------- #
# Mixed precision: a trace-time compute-dtype scope.  When set (e.g.
# bfloat16), convs and dense layers run their matmuls in that dtype on the
# MXU with float32 params (flax dtype/param_dtype), and cast back to float32
# immediately after — normalization, losses, and detection geometry always
# stay float32.  The scope is read at TRACE time; Engine fixes it per
# instance so jit caches stay coherent.
# --------------------------------------------------------------------- #
import contextlib
import threading

_DTYPE_SCOPE = threading.local()


def get_compute_dtype():
    return getattr(_DTYPE_SCOPE, "dtype", None)


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    """dtype: None | 'bfloat16' | jnp dtype."""
    prev = get_compute_dtype()
    _DTYPE_SCOPE.dtype = jnp.dtype(dtype) if dtype is not None else None
    try:
        yield
    finally:
        _DTYPE_SCOPE.dtype = prev


class BatchRenorm(nn.Module):
    """Batch normalization with renorm correction, matching
    ``tf.layers.batch_normalization(training=…, renorm=True)`` defaults:
    momentum 0.99, epsilon 1e-3, no renorm clipping (r, d unclipped)."""

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)  # norm statistics always f32
        feat_shape = (x.shape[-1],)
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat_shape, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat_shape, jnp.float32))
        gamma = self.param("gamma", nn.initializers.ones, feat_shape)
        beta = self.param("beta", nn.initializers.zeros, feat_shape)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon)
            return (x - mean) * inv * gamma + beta

        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.var(x, axis=reduce_axes)
        sigma_b = jnp.sqrt(var + self.epsilon)
        sigma_m = jnp.sqrt(ra_var.value + self.epsilon)
        # renorm correction, gradients stopped (TF semantics)
        r = jax.lax.stop_gradient(sigma_b / sigma_m)
        d = jax.lax.stop_gradient((mean - ra_mean.value) / sigma_m)
        xhat = (x - mean) / sigma_b * r + d
        out = xhat * gamma + beta

        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return out


class GroupNormRef(nn.Module):
    """The reference's hand-rolled group norm (network.py:528-545).

    Grouping is *interleaved*: reshape [..., C] -> [..., C//G, G], so channel
    ``c`` belongs to group ``c % G``; moments are over (spatial dims, C//G)
    per (batch, group); eps 1e-5; affine via [C] gamma/beta.
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)  # norm statistics always f32
        c = x.shape[-1]
        g = min(self.num_groups, c)
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        shape = x.shape[:-1] + (c // g, g)
        xg = x.reshape(shape)
        axes = tuple(range(1, xg.ndim - 1))  # spatial dims + C//G
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        xg = (xg - mean) / jnp.sqrt(var + self.epsilon)
        return xg.reshape(x.shape) * gamma + beta


_GN_SCOPE = threading.local()


@contextlib.contextmanager
def gn_config_scope(min_num_g: int, min_chs_per_g: int):
    """Trace-time override for the GN group heuristic — threads
    cfg.TRAIN.GN_MIN_NUM_G / GN_MIN_CHS_PER_G into every GroupNormRef
    without plumbing fields through each module (same idiom as
    compute_dtype_scope; entered by FasterRCNN.apply_*)."""
    prev = getattr(_GN_SCOPE, "cfg", None)
    _GN_SCOPE.cfg = (min_num_g, min_chs_per_g)
    try:
        yield
    finally:
        _GN_SCOPE.cfg = prev


def gn_groups(channels: int, min_num_g: int = None,
              min_chs_per_g: int = None) -> int:
    """Reference group count: min(GN_MIN_NUM_G, C // GN_MIN_CHS_PER_G)
    (network.py:126).  Defaults come from the active gn_config_scope
    (falling back to the reference's 8 / 4)."""
    scope = getattr(_GN_SCOPE, "cfg", None) or (8, 4)
    if min_num_g is None:
        min_num_g = scope[0]
    if min_chs_per_g is None:
        min_chs_per_g = scope[1]
    return max(1, min(min_num_g, channels // min_chs_per_g))


class ConvBlock(nn.Module):
    """conv (+ optional norm) (+ optional relu), the reference's ``conv`` op
    (network.py:100-135).  With a norm the conv has no bias."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: str = "SAME"
    norm: Optional[str] = None     # None | 'BN' | 'GN'
    relu: bool = True
    train: bool = True
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x):
        dt = get_compute_dtype()
        # under a compute-dtype scope the activation CHAIN stays in dt (the
        # trunk is bandwidth-bound: casting back to f32 after every conv
        # keeps the HBM traffic f32 and erases the win); normalization
        # internals stay f32 and boundaries cast back in detector.apply_*
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=self.padding,
                    use_bias=(self.norm is None),
                    kernel_init=trunc_init(self.init_std),
                    bias_init=nn.initializers.zeros,
                    dtype=dt, param_dtype=jnp.float32,
                    name="conv")(x if dt is None else x.astype(dt))
        if self.norm == "BN":
            y = BatchRenorm(use_running_average=not self.train, name="bn")(y)
        elif self.norm == "GN":
            y = GroupNormRef(gn_groups(self.features), name="gn")(y)
        if self.relu:
            y = nn.relu(y)
        return y


class Fc(nn.Module):
    """Dense layer flattening 4-D inputs, optional norm, optional relu
    (network.py:315-354).

    Flatten order: natural NHWC, NOT the reference's NCHW transpose
    (network.py:326).  The transpose there exists only so Caffe-lineage
    pretrained fc weights line up; the BUS heads are 512-wide while the
    ImageNet fc6/fc7 are 4096-wide, so those weights are never loadable
    anyway (network.load skips them) and the flatten order is just an input
    permutation of a trained-from-scratch layer.  NHWC avoids a layout
    change in front of every head matmul on TPU; ``models.pretrained``
    permutes kernel rows in the (never-hit) case of a shape match.
    """

    features: int
    norm: Optional[str] = None
    relu: bool = True
    train: bool = True
    init_std: float = 0.01

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:
            x = x.reshape(x.shape[0], -1)
        dt = get_compute_dtype()
        y = nn.Dense(self.features, use_bias=(self.norm is None),
                     kernel_init=trunc_init(self.init_std),
                     bias_init=nn.initializers.zeros,
                     dtype=dt, param_dtype=jnp.float32,
                     name="dense")(x if dt is None else x.astype(dt))
        if self.norm == "BN":
            y = BatchRenorm(use_running_average=not self.train, name="bn")(y)
        elif self.norm == "GN":
            y = GroupNormRef(gn_groups(self.features), name="gn")(y)
        if self.relu:
            y = nn.relu(y)
        return y


def max_pool(x, k: int, s: int, padding: str = "SAME"):
    return nn.max_pool(x, (k, k), strides=(s, s), padding=padding)
