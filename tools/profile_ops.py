"""Per-op decomposition of the non-trunk training forward on the current
backend (chained-dispatch protocol; run from the repo root).

Reference measurement (one v5e chip, canvas 608x800, full TRAIN budgets):
proposal_layer (3 img, 12000 pre-NMS -> 2000) 2.2 ms, anchor_target (3 img)
1.15 ms (was 1.31 with full argsort subsampling; now lax.top_k),
proposal_target (1 img) 0.9 ms, roi_pool (128 + 2x2000 rois) 5.8 ms
(VPU-bound: ~5.2G window elements through add+max per step — see
ops/roi_pool_pallas.py), heads over 4032 rois 0.7 ms.  Together ~10.9 ms of
the 15.5 ms non-trunk forward; the rest is RPN softmax + glue + dispatch.
Each remaining item is 1-4%% of the 49 ms step, which is why further
kernel work targets none of them.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import build_detector
from wssdl_bus_tpu.ops.anchor_target import anchor_target_layer_joint
from wssdl_bus_tpu.ops.proposal import proposal_layer
from wssdl_bus_tpu.ops.proposal_target import proposal_target_layer
from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_grouped
from wssdl_bus_tpu.train.engine import Engine


def main():
    cfg = Config()
    canvas = (608, 800)
    model = build_detector("VGGnet_train", num_classes=3)
    eng = Engine(model, cfg, canvas)
    variables, _ = eng.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    fh, fw = canvas[0] // 16, canvas[1] // 16
    a = eng.num_anchors

    feat = jax.device_put(rng.randn(3, fh, fw, 512).astype(np.float32))
    rpn_prob = jax.device_put(
        jax.nn.softmax(rng.randn(3, fh, fw, 2 * a).astype(np.float32), -1))
    rpn_bbox = jax.device_put(
        (rng.randn(3, fh, fw, 4 * a) * 0.1).astype(np.float32))
    gt = np.zeros((3, 20, 5), np.float32)
    gt[0, :3] = [[100, 100, 400, 300, 1], [300, 200, 600, 500, 2],
                 [10, 10, 90, 90, 0]]
    gt_j = jax.device_put(gt)
    num_gt = jax.device_put(np.array([3, 0, 0], np.int32))
    im_info = jax.device_put(np.array(
        [[canvas[0], canvas[1], 1.33, d] for d in (0, 1, 2)], np.float32))
    boxes2k = jax.device_put(
        np.abs(rng.randn(3, cfg.TRAIN.RPN_POST_NMS_TOP_N, 4))
        .astype(np.float32) * 100)
    key = jax.random.PRNGKey(0)

    t = cfg.TRAIN

    @jax.jit
    def p_proposal(c, rp):
        props = proposal_layer(rp + c * 1e-9, rpn_bbox, im_info, eng.anchors,
                               num_anchors=a,
                               pre_nms_top_n=t.RPN_PRE_NMS_TOP_N,
                               post_nms_top_n=t.RPN_POST_NMS_TOP_N,
                               nms_thresh=t.RPN_NMS_THRESH,
                               min_size=float(t.RPN_MIN_SIZE))
        return c + props.boxes[0, 0, 0] * 1e-9

    @jax.jit
    def p_anchor_target(c, g):
        at = anchor_target_layer_joint(
            key, g + c * 1e-9, num_gt, im_info, eng.anchors,
            num_supervised=1, **eng._at_kwargs)
        return c + at.bbox_targets[0, 0, 0] * 1e-9

    @jax.jit
    def p_proposal_target(c, b):
        s = proposal_target_layer(
            key, b[:1] + c * 1e-9, jnp.ones((1, b.shape[1]), bool),
            gt_j[:1], num_gt[:1], include_gt=True, **eng._pt_kwargs)
        return c + s.rois[0, 0, 0] * 1e-9

    @jax.jit
    def p_roi_pool(c, f):
        sup = roi_pool_grouped(f[:1] + c * 1e-9, boxes2k[:1, :t.BATCH_SIZE])
        ws = roi_pool_grouped(f[1:] + c * 1e-9, boxes2k[1:])
        return c + (sup[0, 0, 0, 0, 0] + ws[0, 0, 0, 0, 0]) * 1e-9

    @jax.jit
    def p_head(c, f):
        pooled = jnp.broadcast_to(
            f[:1, :7, :7, :], (1, 7, 7, 512)) + c * 1e-9
        pooled = jnp.tile(pooled, (4032, 1, 1, 1))
        cls, box, _ = eng.model.apply_head(
            eng._split_vars(variables, {
                "trunk": variables["trunk"]["params"],
                "head": variables["head"]["params"]}), pooled, train=True,
            dropout_rng=key)
        return c + cls[0, 0] * 1e-9

    @jax.jit
    def trivial(c):
        return c + 1.0

    def measure(fn, arg, iters=40):
        c = jnp.float32(0.0)
        for _ in range(6):
            c = fn(c, arg)
        float(c)
        rtts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(trivial(jnp.float32(time.perf_counter())))
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(c, arg)
        float(c)
        return (time.perf_counter() - t0 - rtt) / iters * 1e3

    for name, fn, arg in [
            ("proposal_layer(3img,12000->2000)", p_proposal, rpn_prob),
            ("anchor_target(3img)", p_anchor_target, gt_j),
            ("proposal_target(1img)", p_proposal_target, boxes2k),
            ("roi_pool(128+2x2000)", p_roi_pool, feat),
            ("head(4032 rois)", p_head, feat)]:
        print(json.dumps({name: round(measure(fn, arg), 2)}))


if __name__ == "__main__":
    main()
