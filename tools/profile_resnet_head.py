"""Decompose the ResNet batched serving step: trunk vs per-ROI group3 head.

VERDICT r02 weak #4: R50 serves 249 img/s single-image vs 251 at batch 32 —
the per-ROI head (group3 over 300 ROIs/image, Resnet_train_bus.py:91-101)
flattens the batch curve.  This tool measures, with the chained-dispatch
protocol (bench.py methodology notes):

  * the trunk alone at the serving canvas;
  * the head alone on (300*B, 7, 7, C) ROI features, sweeping the ROI
    count, to get the head's own batch-scaling curve;
  * the full inference step, for the residual (RPN/proposal/NMS/pool).

Run from the repo root on the TPU-attached host:

    python tools/profile_resnet_head.py [--depth 50] [--batch 8]
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
    ap.add_argument("--norm", default=None, choices=[None, "BN", "GN"],
                    help="match bench.py: norm=None at serving (BN folds "
                         "to scale/shift at inference anyway)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip_full", action="store_true",
                    help="skip the full-step measurement (big axon compile)")
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 800))
    args = ap.parse_args()

    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.models.resnet import ResNetBackbone, ResNetRCNNHead
    from wssdl_bus_tpu.train.engine import Engine

    print("backend:", jax.default_backend(), "depth:", args.depth,
          "batch:", args.batch)
    cfg = Config()
    canvas = tuple(args.canvas)
    nb = args.batch
    rng = np.random.RandomState(0)

    model = build_detector("Resnet_train", args.depth, norm=args.norm,
                           num_classes=3)
    eng = Engine(model, cfg, canvas)
    variables, _ = eng.init(jax.random.PRNGKey(0))

    datas = [jax.device_put(rng.rand(nb, canvas[0], canvas[1], 3)
                            .astype(np.float32)) for _ in range(4)]
    im_info = jax.device_put(
        np.tile(np.array([[canvas[0], canvas[1], 1.0, 0.0]], np.float32),
                (nb, 1)))

    # 1. full inference step (axon compiles are NOT persistently cached and
    # this graph takes ~15 min to build; --skip_full when it is already known)
    if not args.skip_full:
        @jax.jit
        def full_step(c, data):
            outs = eng._inference_impl(variables, data + c * 1e-9, im_info)
            return c + outs[2][0, 0] * 1e-9

        t_full = chain_timed(full_step, datas, args.iters)
        print(f"full step   {t_full * 1e3:8.2f} ms  "
              f"({t_full / nb * 1e3:6.3f} ms/img, {nb / t_full:6.1f} img/s)")

    # 2. trunk alone (engine variables: {'trunk': vars, 'head': vars},
    # trunk params nest the backbone under 'backbone')
    trunk = ResNetBackbone(depth=args.depth, norm=args.norm, train=False)
    tvars = {"params": variables["trunk"]["params"]["backbone"]}
    bs = variables["trunk"].get("batch_stats", {}).get("backbone")
    if bs:
        tvars["batch_stats"] = bs

    @jax.jit
    def trunk_step(c, data):
        f = trunk.apply(tvars, data + c * 1e-9)
        return c + f[0, 0, 0, 0] * 1e-9

    t_trunk = chain_timed(trunk_step, datas, args.iters)
    print(f"trunk alone {t_trunk * 1e3:8.2f} ms  "
          f"({t_trunk / nb * 1e3:6.3f} ms/img)")

    # 3. head alone, sweeping the ROI count
    c_in = 256 if args.depth in (18, 34) else 1024
    head = ResNetRCNNHead(depth=args.depth, norm=args.norm, num_classes=3,
                          train=False)
    hvars = variables["head"]
    for n_roi in (300, 300 * nb):
        feats = [jax.device_put(
            rng.rand(n_roi, 7, 7, c_in).astype(np.float32))
            for _ in range(2)]

        @jax.jit
        def head_step(c, f):
            s, b = head.apply(hvars, f + c * 1e-9)
            return c + s[0, 0] * 1e-9

        t_head = chain_timed(head_step, feats, args.iters)
        per_img = t_head / (n_roi / 300)
        print(f"head {n_roi:5d} ROIs {t_head * 1e3:8.2f} ms  "
              f"({per_img * 1e3:6.3f} ms/img-equiv)")


if __name__ == "__main__":
    main()
