"""Decompose the R50 serving step's non-trunk, non-head residual.

profile_resnet_head.py (v5e, batch 8, 608x800, norm=None) measured:
full step 34.5 ms, trunk 13.2 ms, head(2400 ROIs) 10.2 ms -> residual
~11.1 ms (1.39 ms/img) in the RPN softmax, proposal layer (top-k + NMS),
ROI pool (C=1024) and decode.  This tool times each piece alone, plus the
bf16 variants of trunk/head (cheap compiles; run after the head profiler):

    python tools/profile_resnet_residual.py [--depth 50] [--batch 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_timed(step, datas, iters=20, warmup=3):
    c = jnp.float32(0.0)
    for i in range(warmup):
        c = step(c, datas[i % len(datas)])
    float(c)
    t0 = time.perf_counter()
    for i in range(iters):
        c = step(c, datas[i % len(datas)])
    float(c)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 800))
    args = ap.parse_args()

    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.models.detector import build_detector, rpn_softmax
    from wssdl_bus_tpu.models.layers import compute_dtype_scope
    from wssdl_bus_tpu.models.resnet import ResNetBackbone, ResNetRCNNHead
    from wssdl_bus_tpu.ops.proposal import proposal_layer
    from wssdl_bus_tpu.ops.roi_pool_pallas import roi_pool_grouped
    from wssdl_bus_tpu.train.engine import Engine

    cfg = Config()
    canvas = tuple(args.canvas)
    nb = args.batch
    rng = np.random.RandomState(0)
    print("backend:", jax.default_backend(), "depth:", args.depth,
          "batch:", nb)

    model = build_detector("Resnet_train", args.depth, num_classes=3)
    eng = Engine(model, cfg, canvas)
    na = eng.num_anchors
    fh, fw = canvas[0] // cfg.FEAT_STRIDE, canvas[1] // cfg.FEAT_STRIDE
    c_feat = 256 if args.depth in (18, 34) else 1024

    im_info = jax.device_put(
        np.tile(np.array([[canvas[0], canvas[1], 1.0, 0.0]], np.float32),
                (nb, 1)))
    probs = [jax.device_put(rng.rand(nb, fh, fw, 2 * na).astype(np.float32))
             for _ in range(2)]
    bboxes = [jax.device_put(
        (rng.rand(nb, fh, fw, 4 * na).astype(np.float32) - 0.5))
        for _ in range(2)]
    feats = [jax.device_put(rng.rand(nb, fh, fw, c_feat).astype(np.float32))
             for _ in range(2)]
    p = cfg.TEST.RPN_POST_NMS_TOP_N

    def rand_boxes():
        x1 = rng.rand(nb, p) * (canvas[1] - 64)
        y1 = rng.rand(nb, p) * (canvas[0] - 64)
        w = rng.rand(nb, p) * 200 + 16
        h = rng.rand(nb, p) * 200 + 16
        return np.stack([x1, y1, np.minimum(x1 + w, canvas[1] - 1),
                         np.minimum(y1 + h, canvas[0] - 1)],
                        axis=-1).astype(np.float32)

    boxes = [jax.device_put(rand_boxes()) for _ in range(2)]

    # 1. proposal layer (softmax + topk + decode + NMS)
    @jax.jit
    def s_prop(c, prob):
        pr = proposal_layer(
            prob + c * 1e-9, bboxes[0], im_info, eng.anchors,
            num_anchors=na,
            pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
            nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            min_size=float(cfg.TEST.RPN_MIN_SIZE))
        return c + pr.boxes[0, 0, 0] * 1e-9

    dt = chain_timed(s_prop, probs, args.iters)
    print(f"proposal_layer      {dt * 1e3:8.2f} ms ({dt / nb * 1e3:6.3f} "
          f"ms/img)")

    # 2. ROI pool (grouped) at C=c_feat, 300 boxes/img
    @jax.jit
    def s_pool(c, feat):
        pooled = roi_pool_grouped(feat + c * 1e-9, boxes[0], 7, 7,
                                  1.0 / cfg.FEAT_STRIDE)
        return c + pooled.reshape(-1)[0] * 1e-9

    dt = chain_timed(s_pool, feats, args.iters)
    print(f"roi_pool_grouped    {dt * 1e3:8.2f} ms ({dt / nb * 1e3:6.3f} "
          f"ms/img)")

    # 3. rpn softmax alone
    scores = [jax.device_put(
        rng.rand(nb, fh, fw, 2 * na).astype(np.float32)) for _ in range(2)]

    @jax.jit
    def s_soft(c, s):
        return c + rpn_softmax(s + c * 1e-9, na)[0, 0, 0, 0] * 1e-9

    dt = chain_timed(s_soft, scores, args.iters)
    print(f"rpn_softmax         {dt * 1e3:8.2f} ms ({dt / nb * 1e3:6.3f} "
          f"ms/img)")

    # 4. trunk / head in bf16 compute
    variables = eng.init(jax.random.PRNGKey(0))[0]
    datas = [jax.device_put(rng.rand(nb, *canvas, 3).astype(np.float32))
             for _ in range(2)]
    trunk = ResNetBackbone(depth=args.depth, norm=None, train=False)
    tvars = {"params": variables["trunk"]["params"]["backbone"]}
    head = ResNetRCNNHead(depth=args.depth, norm=None, num_classes=3,
                          train=False)
    hvars = variables["head"]
    roif = [jax.device_put(rng.rand(300 * nb, 7, 7, c_feat)
                           .astype(np.float32)) for _ in range(2)]

    for dtype in ("bfloat16",):
        @jax.jit
        def s_trunk(c, d):
            with compute_dtype_scope(dtype):
                f = trunk.apply(tvars, d + c * 1e-9)
            return c + f[0, 0, 0, 0].astype(jnp.float32) * 1e-9

        dt = chain_timed(s_trunk, datas, args.iters)
        print(f"trunk {dtype:9s}     {dt * 1e3:8.2f} ms "
              f"({dt / nb * 1e3:6.3f} ms/img)")

        @jax.jit
        def s_head(c, f):
            with compute_dtype_scope(dtype):
                s, b = head.apply(hvars, f + c * 1e-9)
            return c + s[0, 0].astype(jnp.float32) * 1e-9

        dt = chain_timed(s_head, roif, args.iters)
        print(f"head {dtype:9s} {300 * nb:5d} ROIs {dt * 1e3:8.2f} ms "
              f"({dt / nb * 1e3:6.3f} ms/img)")


if __name__ == "__main__":
    main()
