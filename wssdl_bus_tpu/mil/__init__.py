"""Multiple-instance-learning bag logits — the paper's core novelty.

Re-implements ``/root/reference/code/lib/mil/core.py`` for fixed-shape ROI
blocks.  The reference walks a ragged concatenation of per-image ROI rows
with static python loops over the batch (core.py:24-44); here each weak image
owns a fixed [P] block of instance logits plus a validity mask, so every
selector is one masked argmax/argmin — no loops, no dynamic slices.

Selector semantics (column indices hard-coded to the 3-class
bg/benign/malignant layout, like the reference):
  * ``mal_max``  — instance with the max malignant logit (core.py:60-68);
  * ``ben_max``  — instance with the max benign logit (core.py:49-57);
  * ``mass_max`` — instance with the MIN background logit, i.e. the most
    mass-like instance (core.py:88-96);
  * ``disc_max`` — instance with the max non-background logit (core.py:77-85);
  * ``mean_ben`` — [0, mean benign logit, 0] (core.py:71-74).

``get_bag_logits`` picks selector[0] for bags labeled benign (label == 1) and
selector[1] otherwise (core.py:40-42).  The combined trainer uses
(mal_max, mal_max) (train_bus.py:656); the alternating trainer uses
(mass_max, mal_max) (train_bus.py:241).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain Python floats: they promote to the operand's f32 dtype inside jit,
# and a module-level jnp constant would initialize the JAX backend at import
# time (breaking the test harness's collection-time device-count decision)
_NEG = -1e30
_POS = 1e30


def _select_row(logits, score, valid):
    """Row of ``logits`` at the argmax of masked ``score``."""
    idx = jnp.argmax(jnp.where(valid, score, _NEG))
    return logits[idx]


def mal_max(logits, valid):
    return _select_row(logits, logits[:, 2], valid)


def ben_max(logits, valid):
    return _select_row(logits, logits[:, 1], valid)


def mass_max(logits, valid):
    idx = jnp.argmin(jnp.where(valid, logits[:, 0], _POS))
    return logits[idx]


def disc_max(logits, valid):
    return _select_row(logits, jnp.max(logits[:, 1:], axis=1), valid)


def mean_ben(logits, valid):
    cnt = jnp.maximum(jnp.sum(valid), 1)
    m = jnp.sum(jnp.where(valid, logits[:, 1], 0.0)) / cnt
    return jnp.stack([0.0, m, 0.0])


SELECTORS = {
    "mal_max": mal_max,
    "ben_max": ben_max,
    "mass_max": mass_max,
    "disc_max": disc_max,
    "mean_ben": mean_ben,
}


def get_bag_logits(instance_logits: jnp.ndarray,  # [B, P, C]
                   valid: jnp.ndarray,            # [B, P] bool
                   bag_labels: jnp.ndarray,       # [B] int (1=benign, 2=mal)
                   selector_pair=("mal_max", "mal_max")) -> jnp.ndarray:
    """Per-bag [B, C] logits via the label-dependent selector pair."""
    f0 = SELECTORS[selector_pair[0]]
    f1 = SELECTORS[selector_pair[1]]

    def one(logits, v, label):
        return jax.lax.cond(label == 1,
                            lambda: f0(logits, v),
                            lambda: f1(logits, v))

    return jax.vmap(one)(instance_logits, valid, bag_labels)
