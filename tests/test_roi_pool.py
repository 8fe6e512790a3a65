"""ROI pooling vs the C++-kernel-semantics oracle + gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.ops.roi_pool import roi_pool
from tests.oracles import roi_pool_oracle


def _rand_rois(rng, r, batch, im_h, im_w):
    b = rng.randint(0, batch, r).astype(np.float32)
    x1 = rng.uniform(0, im_w * 0.7, r)
    y1 = rng.uniform(0, im_h * 0.7, r)
    x2 = np.minimum(x1 + rng.uniform(4, im_w * 0.5, r), im_w - 1)
    y2 = np.minimum(y1 + rng.uniform(4, im_h * 0.5, r), im_h - 1)
    return np.stack([b, x1, y1, x2, y2], axis=1).astype(np.float32)


def test_roi_pool_matches_reference_kernel(rng):
    feat = rng.randn(2, 19, 25, 8).astype(np.float32)
    rois = _rand_rois(rng, 40, 2, 19 * 16, 25 * 16)
    got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 7, 1 / 16.0,
                              chunk=16))
    want = roi_pool_oracle(feat, rois, 7, 7, 1 / 16.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_roi_pool_tiny_and_malformed_rois(rng):
    feat = rng.randn(1, 10, 10, 4).astype(np.float32)
    rois = np.array([
        [0, 0, 0, 0, 0],          # 1x1 after quantization
        [0, 50, 50, 40, 40],      # malformed (end < start) -> forced 1x1
        [0, 0, 0, 159, 159],      # whole feature map
        [0, 155, 155, 159, 159],  # hugs the bottom-right corner
    ], np.float32)
    got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 7, 1 / 16.0,
                              chunk=4))
    want = roi_pool_oracle(feat, rois, 7, 7, 1 / 16.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_roi_pool_gradient_scatters_to_argmax(rng):
    """The VJP must place gradient only at each bin's max position, matching
    the reference backward (roi_pooling_op.cc argmax scatter)."""
    feat = rng.randn(1, 8, 8, 2).astype(np.float32)
    # quantizes to an 8x8 roi (round(111/16)=7, size 8): 2x2 bins divide
    # exactly, so they are disjoint under BOTH bin-edge flavors and every
    # input cell belongs to at most one bin
    rois = np.array([[0, 0, 0, 111, 111]], np.float32)

    def f(x):
        return roi_pool(x, jnp.array(rois), 4, 4, 1 / 16.0, chunk=1).sum()

    g = np.asarray(jax.grad(f)(jnp.array(feat)))
    # forward output equals the max of each 2x2 bin; each bin contributes
    # gradient 1 to exactly one input position
    assert g.sum() == 4 * 4 * 2
    assert ((g == 0) | (g == 1)).all()


def test_roi_pool_cpu_flavor_matches_truncation_oracle(rng):
    """Both reference bin-edge flavors are supported: 'cpu' (truncated
    edges) must match the truncation oracle, and for an ROI whose quantized
    side is not a multiple of 7 the two flavors genuinely differ (the GPU
    kernel's ceil makes bins overlap)."""
    import jax.numpy as jnp

    from wssdl_bus_tpu.ops.roi_pool import roi_pool

    feat = rng.randn(1, 24, 30, 8).astype(np.float32)
    rois = np.array([[0, 0, 0, 159, 159],       # 10x10 quantized (not /7)
                     [0, 16, 16, 300, 250]], np.float32)
    got_cpu = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 7,
                                  1 / 16.0, flavor="cpu"))
    want_cpu = roi_pool_oracle(feat, rois, 7, 7, 1 / 16.0, flavor="cpu")
    np.testing.assert_array_equal(got_cpu, want_cpu)

    got_gpu = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 7, 7,
                                  1 / 16.0, flavor="gpu"))
    want_gpu = roi_pool_oracle(feat, rois, 7, 7, 1 / 16.0, flavor="gpu")
    np.testing.assert_array_equal(got_gpu, want_gpu)
    assert not np.array_equal(got_cpu, got_gpu)
