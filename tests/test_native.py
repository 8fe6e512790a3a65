"""Native C++ host kernels vs their numpy/PIL/scipy oracles."""

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage

from tests.oracles import iou_oracle, iou_ui_oracle, nms_oracle
from wssdl_bus_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def rand_dets(rng, n):
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 200, n)
    dets = np.stack([x1, y1, x1 + rng.uniform(5, 120, n),
                     y1 + rng.uniform(5, 120, n),
                     rng.uniform(0, 1, n)], axis=1).astype(np.float32)
    return dets[dets[:, 4].argsort()[::-1]]


def test_native_nms_matches_oracle(rng):
    for n in (1, 17, 300):
        dets = rand_dets(rng, n)
        for thr in (0.3, 0.5, 0.7):
            assert native.nms(dets, thr) == nms_oracle(dets, thr)


def test_native_overlaps_match_oracle(rng):
    boxes = rand_dets(rng, 50)[:, :4]
    query = rand_dets(rng, 7)[:, :4]
    np.testing.assert_allclose(native.bbox_overlaps(boxes, query),
                               iou_oracle(boxes, query), rtol=1e-5)
    np.testing.assert_allclose(
        native.bbox_overlaps(boxes, query, unidirectional=True),
        iou_ui_oracle(boxes, query), rtol=1e-5)


def test_native_resize_matches_pil(rng):
    im = rng.rand(57, 83).astype(np.float32)
    for oh, ow in ((120, 160), (23, 31)):
        ref = np.asarray(Image.fromarray(im, mode="F")
                         .resize((ow, oh), Image.BILINEAR))
        got = native.resize_bilinear(im, oh, ow)
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_native_rotate_matches_scipy(rng):
    im = rng.rand(64, 80).astype(np.float32)
    for angle in (-4.3, 2.0):
        ref = ndimage.rotate(im, angle, reshape=False, order=1,
                             mode="constant", cval=0.25)
        got = native.rotate_bilinear(im, angle, 0.25)
        # interior pixels must agree to float tolerance; boundary pixels can
        # differ by fill handling, so compare away from the border
        np.testing.assert_allclose(got[3:-3, 3:-3], ref[3:-3, 3:-3],
                                   atol=1e-4)


def test_native_brightness_contrast(rng):
    im = rng.rand(40, 40).astype(np.float32)
    ref = np.clip(im + 0.1, 0, 1)
    m = ref.mean()
    ref = np.clip((ref - m) * 1.5 + m, 0, 1)
    got = native.brightness_contrast(im.copy(), 0.1, 1.5, True, True)
    np.testing.assert_allclose(got, ref, atol=1e-5)
