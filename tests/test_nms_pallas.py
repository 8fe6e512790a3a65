"""Oracle tests for the Pallas greedy-NMS kernel (interpret mode on CPU).

The TPU-compiled path is exercised by the proposal layer end-to-end on real
hardware; here the same kernel runs under the Pallas interpreter so the
sequential-block + Jacobi formulation is verified bit-exact against the
pure-numpy greedy oracle and the XLA bitmask implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests import oracles
from wssdl_bus_tpu.ops.nms import nms_mask
from wssdl_bus_tpu.ops.nms_pallas import nms_keep_pallas


def _rand_boxes(rng, n, scale=400.0):
    xy = rng.uniform(0, scale, (n, 2))
    wh = rng.uniform(5, scale / 2, (n, 2))
    return np.hstack([xy, xy + wh]).astype(np.float32)


@pytest.mark.parametrize("n,thresh", [(130, 0.7), (400, 0.5), (1111, 0.7)])
def test_pallas_nms_matches_oracle(n, thresh):
    rng = np.random.RandomState(n)
    boxes = _rand_boxes(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sb = boxes[order]
    valid = np.ones(n, bool)
    if n > 200:  # knock out a random tenth: invalid rows must be inert
        valid[rng.choice(n, n // 10, replace=False)] = False

    vi = np.where(valid)[0]
    dets = np.hstack([sb[vi], scores[order][vi, None]])
    keep_idx = oracles.nms_oracle(dets, thresh)
    want = np.zeros(n, bool)
    want[vi[keep_idx]] = True

    got = np.asarray(nms_keep_pallas(
        jnp.asarray(sb.T), jnp.asarray(valid), thresh, interpret=True))
    np.testing.assert_array_equal(got, want)

    ref = np.asarray(nms_mask(jnp.asarray(sb), jnp.asarray(valid), thresh))
    np.testing.assert_array_equal(ref, want)


def test_pallas_nms_all_invalid():
    rng = np.random.RandomState(0)
    sb = _rand_boxes(rng, 64)
    got = np.asarray(nms_keep_pallas(
        jnp.asarray(sb.T), jnp.zeros(64, bool), 0.7, interpret=True))
    assert not got.any()
