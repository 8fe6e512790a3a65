"""Order correctness of test_net's double-buffered batched serving path.

Uses a fake engine whose detections encode each image's identity (via its
distinct resized width), so any emission reordering, dropped/duplicated
tail batch, or slot/batch index mix-up in the dispatch-ahead pipeline
(evaluate/detect.py detections()) shows up as a score mismatch in
all_boxes — something the e2e CLI runs cannot detect."""

import numpy as np
import pytest

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.evaluate.detect import pack_image_batch
from wssdl_bus_tpu.evaluate.detect import test_net as run_test_net

CFG = Config().with_overrides([
    "TEST.SCALES", "(150,)", "TEST.MAX_SIZE", "250",
    "TEST.RPN_POST_NMS_TOP_N", "8",
    "TEST.BBOX_REG", "False",   # decode = tiled proposal boxes, no deltas
])
CANVAS = (160, 256)
N_IMAGES = 5


class FakeEngine:
    """inference_step stamps each image's single detection with a score
    derived from its im_info width — unique per image by construction."""

    cfg = CFG

    def inference_step(self, variables, blob, infos):
        n = blob.shape[0]
        p = self.cfg.TEST.RPN_POST_NMS_TOP_N
        rois = np.zeros((n * p, 5), np.float32)
        valid = np.zeros((n * p,), bool)
        cls_prob = np.zeros((n * p, 3), np.float32)
        bbox_pred = np.zeros((n * p, 12), np.float32)
        for i in range(n):
            r = i * p
            rois[r] = [i, 15, 15, 90, 75]
            valid[r] = True
            cls_prob[r, 1] = float(infos[i, 1]) / 1000.0  # width -> score
        return rois, valid, np.zeros((n * p, 3), np.float32), cls_prob, \
            bbox_pred


class FakeImdb:
    name = "fake"
    num_images = N_IMAGES
    num_classes = 3
    classes = ("__background__", "benign", "malignant")
    image_index = [f"im{i}" for i in range(N_IMAGES)]
    roidb = None

    def read_image(self, i):
        # distinct widths -> distinct resized widths -> distinct scores
        return np.full((100, 120 + 10 * i), 128, np.uint8)

    def evaluate_detections(self, all_boxes, output_dir, *a):
        return []


@pytest.mark.parametrize("batch_size", [2, 3, 5])
def test_batched_pipeline_preserves_image_order(tmp_path, batch_size):
    eng, imdb = FakeEngine(), FakeImdb()
    all_boxes, _ = run_test_net(eng, None, imdb, str(tmp_path),
                                "VGGnet_test", CANVAS, verbose=False,
                                batch_size=batch_size)
    for i in range(N_IMAGES):
        # expected score: the image's own resized width (from the same
        # packing code the serving path uses)
        _, infos, _ = pack_image_batch(eng, [imdb.read_image(i)],
                                       "VGGnet_test", CANVAS)
        expected = float(infos[0, 1]) / 1000.0
        dets = all_boxes[1][i]
        assert dets.shape == (1, 5), (i, dets)
        assert dets[0, 4] == pytest.approx(expected, abs=1e-6), \
            (i, dets[0, 4], expected)
        # benign-only fake: malignant table stays empty
        assert len(all_boxes[2][i]) == 0