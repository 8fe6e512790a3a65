"""Benchmark: detection throughput of the flagship VGG16 Faster R-CNN on the
default accelerator (one TPU chip under the driver).

Invoked with NO flags (the driver's invocation) it emits the FULL
recommended-config matrix — one JSON line per config (VGG f32 b1/int8,
R18 f32/int8, R50 f32/bf16, the train step, the sustained e2e train
loop), HEADLINE (VGG f32 b32) LAST so the driver's last-line parser sees
the stable metric while the whole matrix lands in BENCH_r*.json for
round-over-round regression visibility (r04 review, Missing #2).
``--train --e2e`` measures the SUSTAINED rate of the real hot loop (data
layer on the bundled SNUBH images + prefetch + transfer + donated step)
— r05 closed the 14x host-bound gap found in r04 with the device-side
prep feed (ops/device_prep.py): **24.08 it/s sustained = 99.1% of the
24.3 it/s device-resident rate** through the axon relay (r05 matrix,
with the train compiler options; tools/PROBES.md "Train-feed
decomposition").

Matches the reference's inference configuration (test_bus.py im_detect:
shortest side 600, TEST proposal budgets 6000 pre-NMS / 300 post-NMS, NMS
0.7 — reference config.py:231,257-265).  The default is the BATCHED serving
path (32 images per device step, ``evaluate/detect.py:im_detect_batch``) —
the configuration a TPU deployment actually serves with; ``--batch 1``
reproduces the reference's strictly per-image ``im_detect`` loop
(test_bus.py:404-406).

Baseline: the reference publishes no numbers (BASELINE.md).  The recorded
baselines below are OUR measured CPU throughput of the same jitted pipeline
on this host (single-image 0.18 img/s; batched 0.17 img/s, measured at
batch 8 and used for every batch >= 2 — the CPU is compute-bound, so its
per-image throughput is batch-insensitive), pinned so TPU runs report a
stable ratio.  Target from BASELINE.json: vs_baseline >= 10.

Measured v5e numbers (canvas 608x800; the full matrix re-pinned
2026-08-21 in the r05 matrix with the measured per-program compiler
options integrated — serving jits get scoped-vmem 64 MiB, train jits get
multi-level nested loop fusion; utils/tpu_opts.py, tools/PROBES.md "XLA
compiler-option sweep"): VGG16 single-image 211.1 img/s, batch-32
**289.3** f32 / **314.8 int8** (before the options: 207 / 278.6 / 312;
batch-48 was saturated at 279 pre-options and batch-64 exhausts HBM —
conv1 activations alone are ~160 MB/image — hence the batch-32 default,
near-peak with memory headroom); ResNet-50 batch-32 **258.8 f32 /
295.8 bf16** (285.5 int8 trunk+head, r04); the group3 per-ROI head
(154 GF/img at 300 test ROIs) scales with the ROI count, not the image
count, so batching buys only 1.16x and ~360 is the practical
architecture floor (tools/PROBES.md "ResNet-50 batched serving");
ResNet-18 batch-32 **662.2 f32 / 802.1 int8** (710.9 bf16, r04) — its
light trunk dominates so quantization pays off where R50's per-ROI head
does not (and it is dispatch-bound at batch 1); ResNet-34 489.2 and
ResNet-101 195.0 f32 at b32 complete the measured depth table (r04,
pre-options).  For VGG, bf16 compute is throughput-neutral at every
batch size because XLA already lowers f32 convs to single-pass bf16 MXU
ops under the default precision (confirmed by the sweep:
xla_jf_conv_full_precision is 3x slower); for R50 an explicit bf16
chain is +14% (the head/trunk activation chain stays bf16 in HBM).
Combined train step (1 supervised + 2 weak images): **24.1 it/s** f32
(was 23.2 pre-options, 20.7 before the r04 kernel wins: the
anchor-target one-hot matmul (HIGHEST-precision, exact), the
select-reduce CE (exact), the fused pool+flatten kernel (bit-identical
operand), and the split VGG head application — the last draws the two
groups' dropout masks from split keys and changes grad-reduction order,
so it is a different-but-equally-valid sampling of the same stochastic
step, not a bitwise match of the concatenated form), 21.3 it/s bf16
(r04), with donated train state; alternating-regime weak (MIL-only)
step: 32.1 it/s (--alter, r04); ResNet train (conv head over the same
~4.1k ROIs, remat on for bottlenecks): R18 17.6 it/s, R50 7.6 it/s
(r04).
r04 train-step decomposition (tools/profile_train.py + exact-shape
probes, 42.27 ms): full forward 20.53 ms (was 25.9 before the split
head + fused pool+flatten), backward+optimizer 21.7; convs ~10 fwd +
~18-19 bwd at ~45% MXU (conv-schedule-limited; conv1/2 backward DCE'd
by the frozen mask), ROI pool ~7.5 fwd / +1 bwd (MIL-sparse argmax
backward), Pallas NMS ~3 (3 x 12288 boxes), targets/losses/optimizer
the rest.  The r05 compiler-option sweep recovered the in-framework
share of that gap (+2% train via multi-level nested loop fusion, +3.8%
serving via the 64 MiB scoped-vmem raise — tools/PROBES.md "XLA
compiler-option sweep"); the residual to 26 it/s is ~7%, in the conv
schedule itself, which no swept option touches — further gains need
conv-schedule changes or halving a pool kernel already 23x the XLA
fallback (PROBES.md "Combined train step"); see
wssdl_bus_tpu/ops/roi_pool_pallas.py for the Mosaic constraints that
bound the pool path.
"""

import argparse
import json
import os
import subprocess
import sys
import time
from functools import partial

# The recommended-config matrix (VERDICT r04 #2): one JSON line per config,
# HEADLINE LAST (the driver parses the final line; its metric name must stay
# stable round-over-round).  A plain `python bench.py` — the driver's
# invocation — runs this matrix; any explicit config flag runs just that
# config.  Each entry runs as a subprocess so models/caches are isolated;
# with the persistent XLA compile cache warm, each is seconds.
MATRIX = [
    (["--batch", "1"], "vgg16 f32 b1 (reference per-image loop)"),
    (["--int8"], "vgg16 int8 b32"),
    (["--network", "Resnet_train", "--net_depth", "18"], "resnet18 f32 b32"),
    (["--network", "Resnet_train", "--net_depth", "18", "--int8"],
     "resnet18 int8 b32 (recommended R18 serving)"),
    (["--network", "Resnet_train", "--net_depth", "50"], "resnet50 f32 b32"),
    (["--network", "Resnet_train", "--net_depth", "50", "--bf16"],
     "resnet50 bf16 b32 (recommended R50 serving)"),
    (["--train"], "combined train step (device rate)"),
    (["--train", "--e2e"], "combined train loop (sustained, real data layer)"),
    ([], "vgg16 f32 b32 — HEADLINE"),
]


def run_matrix():
    lines = []
    for flags, label in MATRIX:
        print(f"# matrix: {label} ...", file=sys.stderr, flush=True)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", *flags],
            capture_output=True, text=True)
        out = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if p.returncode != 0 or not out:
            # a broken config must not hide the rest of the matrix (nor the
            # headline): record the failure on stderr and keep going
            print(f"# matrix FAILED [{label}] rc={p.returncode}:\n"
                  f"{p.stderr.strip()[-2000:]}", file=sys.stderr, flush=True)
            continue
        lines.append(out[-1])
        print(out[-1], flush=True)
    if not lines:
        sys.exit("matrix: every config failed")

# Measured on this host with `python bench.py --cpu [--batch 8]` (single
# process, default threading): jitted full-pipeline inference, 608x800.
CPU_BASELINE_IMAGES_PER_SEC = 0.18       # --batch 1
CPU_BASELINE_IMAGES_PER_SEC_BATCHED = 0.17  # --batch >= 2 (measured at 8)
CPU_ALTER_BASELINE_ITERS_PER_SEC = 0.002    # --alter --cpu (455 s/iter)
CPU_SUP_TRAIN_BASELINE_ITERS_PER_SEC = 0.064  # --train --sup_only --cpu


def main():
    if len(sys.argv) == 1:
        # the driver's invocation: emit the full recommended-config matrix,
        # headline last (see MATRIX)
        return run_matrix()
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", action="store_true",
                    help="run the full recommended-config matrix (one JSON "
                         "line per config, headline last) — also the "
                         "default when invoked with no flags")
    ap.add_argument("--single", action="store_true",
                    help="(internal) force single-config mode")
    ap.add_argument("--cpu", action="store_true",
                    help="measure the CPU baseline instead of the accelerator")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 conv/dense compute (f32 params/geometry)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 post-training-quantized serving path (VGG "
                         "trunk; ResNet trunk + group3 ROI head; "
                         "models/quantize.py)")
    ap.add_argument("--batch", type=int, default=32,
                    help="images per inference step (the batched serving "
                         "path, evaluate/detect.py:im_detect_batch); "
                         "--batch 1 = the reference's per-image loop")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the combined TRAIN step instead "
                         "(1 supervised + 2 weak images, full budgets)")
    ap.add_argument("--e2e", action="store_true",
                    help="with --train: SUSTAINED end-to-end rate of the "
                         "real hot loop (RoIDataLayerJoint on the bundled "
                         "SNUBH data + prefetch + host->device transfer + "
                         "donated step) instead of the device-resident step")
    ap.add_argument("--alter", action="store_true",
                    help="benchmark the ALTERNATING regime's weak MIL-only "
                         "step instead (2 weak images, full budgets)")
    ap.add_argument("--sup_only", action="store_true",
                    help="with --train: the alternating regime's SUPERVISED "
                         "step (1 supervised image, no weak block — "
                         "train_bus.py:334-361)")
    ap.add_argument("--network", default="VGGnet_train",
                    help="VGGnet_train or Resnet_train (see --net_depth)")
    ap.add_argument("--net_depth", type=int, default=18,
                    help="ResNet depth (18/34/50/101)")
    ap.add_argument("--remat", default=None,
                    choices=["true", "false", "head", "trunk"],
                    help="override the backbone's remat default "
                         "(models/detector.py:build_detector)")
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 800),
                    metavar=("H", "W"),
                    help="static canvas (default 608x800, the SNUBH "
                         "serving canvas; smaller = quick smoke runs)")
    args = ap.parse_args()
    if args.matrix:
        return run_matrix()
    if args.sup_only and (args.alter or not args.train):
        ap.error("--sup_only modifies --train (and excludes --alter)")
    if args.e2e and not args.train:
        ap.error("--e2e modifies --train")

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # Persistent XLA compilation cache: the fused inference/train programs
    # take minutes to compile cold on the remote-attached TPU; cached, a
    # bench rerun starts in seconds.
    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.engine import Engine

    cfg = Config()
    canvas = tuple(args.canvas)
    remat = {None: None, "true": True, "false": False}.get(args.remat,
                                                           args.remat)
    model = build_detector(args.network, args.net_depth, num_classes=3,
                           compute_dtype="bfloat16" if args.bf16 else None,
                           remat=remat)
    net_tag = ("vgg16" if args.network.startswith("VGGnet")
               else f"resnet{args.net_depth}")
    if args.bf16:
        net_tag += "_bf16"
    eng = Engine(model, cfg, canvas)
    rng = np.random.RandomState(3)

    if args.train and args.e2e:
        # SUSTAINED end-to-end training rate: the real hot loop — joint
        # data layer on the bundled SNUBH images (decode/augment/pack on
        # host), prefetch thread, host->device transfer, donated device
        # step — exactly Solver.train_combined's per-iteration work minus
        # display/snapshot/eval (solver.py:457-487; reference hot loop:
        # train_bus.py:732-764).  Also measures the device-resident step at
        # the SAME canvas in the same process so the JSON carries the feed
        # efficiency (sustained / device-resident).
        import jax.numpy as jnp

        from wssdl_bus_tpu.data.augment import max_canvas
        from wssdl_bus_tpu.data.dataset import get_imdb, get_training_roidb
        from wssdl_bus_tpu.data.loader import Prefetcher, RoIDataLayerJoint

        # pin the serving-canvas config the recorded overfit run used
        # (tools/overfit_regression.py: TRAIN.MAX_SIZE 800 -> canvas 608x816,
        # within 2% of the 608x800 device-step benchmark canvas)
        cfg = cfg._set_dotted("TRAIN.MAX_SIZE", 800)
        data_dir = "/root/reference/SNUBH_BUS"
        imdb = get_imdb("bus_test", data_dir)
        roidb = get_training_roidb(imdb, use_flipped=cfg.TRAIN.USE_FLIPPED)
        sizes = [(e["height"], e["width"]) for e in roidb]
        canvas = max_canvas(sizes, cfg.TRAIN.SCALES[0], cfg.TRAIN.MAX_SIZE,
                            crop_margin=cfg.TRAIN.CROPPING_MAX_MARGIN)
        eng = Engine(model, cfg, canvas)
        variables, opt_state = eng.init(jax.random.PRNGKey(0))
        key, lr = jax.random.PRNGKey(1), jnp.float32(5e-4)

        def mk_layer():
            return RoIDataLayerJoint(
                roidb, roidb, args.network, cfg, canvas,
                rng=np.random.RandomState(3),
                device_prep=cfg.TRAIN.DEVICE_PREP)

        iters = max(10, args.iters)

        def measure(layer):
            nonlocal variables, opt_state

            def one_step(i):
                nonlocal variables, opt_state
                blobs = layer.forward()
                dev = {k: jnp.asarray(v) for k, v in blobs.items()}
                variables, opt_state, ls = eng.train_step_donated(
                    variables, opt_state, dev, key, lr, jnp.int32(i))
                return ls

            float(one_step(0).total)  # compile/warm
            t0 = time.perf_counter()
            for i in range(iters):
                ls = one_step(i)
            float(ls.total)
            return (time.perf_counter() - t0) / iters

        # A/B the prefetch thread: it overlaps host augmentation with the
        # device step on multi-core hosts but CONTENDS with dispatch on a
        # 1-CPU host (measured both ways; the better one is the headline)
        dt_plain = measure(mk_layer())
        pf = Prefetcher(mk_layer())
        dt_pf = measure(pf)
        dt_e2e = min(dt_plain, dt_pf)

        # device-resident rate at the same canvas (the r04-style number)
        dev = {k: jnp.asarray(v) for k, v in pf.forward().items()}
        pf.close()
        variables, opt_state, ls = eng.train_step_donated(
            variables, opt_state, dev, key, lr, jnp.int32(0))
        float(ls.total)
        t0 = time.perf_counter()
        for i in range(iters):
            variables, opt_state, ls = eng.train_step_donated(
                variables, opt_state, dev, key, lr, jnp.int32(i))
        float(ls.total)
        dt_dev = (time.perf_counter() - t0) / iters

        print(json.dumps({
            "metric": f"{net_tag}_frcnn_train_e2e_sustained_iters_per_sec_"
                      f"{jax.devices()[0].platform}",
            "value": round(1.0 / dt_e2e, 3),
            "unit": "iters/sec",
            "vs_baseline": round((1.0 / dt_e2e) / 0.003, 3),
            "device_resident_iters_per_sec": round(1.0 / dt_dev, 3),
            "feed_efficiency": round(dt_dev / dt_e2e, 3),
            "iters_per_sec_prefetch": round(1.0 / dt_pf, 3),
            "iters_per_sec_no_prefetch": round(1.0 / dt_plain, 3),
        }))
        return

    if args.alter:
        import jax.numpy as jnp

        # the alternating regime's weak step: MIL bag loss only over
        # WS_IMS_PER_BATCH weak images (train_bus.py:368-394)
        eng_ws = Engine(model, cfg, canvas, num_supervised=0,
                        num_ws=cfg.TRAIN.WS_IMS_PER_BATCH,
                        selector_pair=("mass_max", "mal_max"))
        variables, opt_state = eng_ws.init(jax.random.PRNGKey(0))
        n = cfg.TRAIN.WS_IMS_PER_BATCH
        batch = {
            "data": jax.device_put(
                rng.rand(n, canvas[0], canvas[1], 3).astype(np.float32)),
            "gt_boxes": jax.device_put(np.zeros((n, 20, 5), np.float32)),
            "num_gt_boxes": jax.device_put(np.zeros((n,), np.int32)),
            "im_info": jax.device_put(np.array(
                [[canvas[0], canvas[1], 1.33, 1 + d % 2] for d in range(n)],
                np.float32)),
        }
        key, lr = jax.random.PRNGKey(1), jnp.float32(5e-4)
        variables, opt_state, mil = eng_ws.train_step_mil_donated(
            variables, opt_state, batch, key, lr, jnp.int32(0))
        float(mil)  # hard sync
        iters = max(1, args.iters)
        t0 = time.perf_counter()
        for i in range(iters):
            variables, opt_state, mil = eng_ws.train_step_mil_donated(
                variables, opt_state, batch, key, lr, jnp.int32(i))
        float(mil)
        dt = (time.perf_counter() - t0) / iters
        # measured on this host with `python bench.py --alter --cpu
        # --iters 1`: the identical jitted MIL step
        cpu_alter_baseline = CPU_ALTER_BASELINE_ITERS_PER_SEC
        print(json.dumps({
            "metric": f"{net_tag}_frcnn_alter_ws_iters_per_sec_"
                      f"{jax.devices()[0].platform}",
            "value": round(1.0 / dt, 3),
            "unit": "iters/sec",
            "vs_baseline": round((1.0 / dt) / cpu_alter_baseline, 3),
        }))
        return

    if args.train:
        import jax.numpy as jnp

        n = 1 if args.sup_only else 3  # 1 supervised [+ 2 weak]
        if args.sup_only:
            # the alternating regime's supervised step: same pipeline, no
            # weak block (Solver.train_alternating builds num_ws=0)
            eng = Engine(model, cfg, canvas, num_ws=0,
                         selector_pair=("mass_max", "mal_max"))
            net_tag += "_sup"
        variables, opt_state = eng.init(jax.random.PRNGKey(0))
        gt = np.zeros((n, 20, 5), np.float32)
        gt[0, :3] = [[100, 100, 400, 300, 1], [300, 200, 600, 500, 2],
                     [10, 10, 90, 90, 0]]
        num_gt = np.zeros((n,), np.int32)
        num_gt[0] = 3
        batch = {
            "data": jax.device_put(
                rng.rand(n, canvas[0], canvas[1], 3).astype(np.float32)),
            "gt_boxes": jax.device_put(gt),
            "num_gt_boxes": jax.device_put(num_gt),
            "im_info": jax.device_put(np.array(
                [[canvas[0], canvas[1], 1.33, d] for d in range(n)],
                np.float32)),
        }
        key, lr = jax.random.PRNGKey(1), jnp.float32(5e-4)
        # the donated hot-loop variant, as Solver's training loop uses
        variables, opt_state, ls = eng.train_step_donated(
            variables, opt_state, batch, key, lr, jnp.int32(0))
        float(ls.total)  # hard sync (see the inference methodology notes)
        iters = max(5, args.iters)
        t0 = time.perf_counter()
        for i in range(iters):
            variables, opt_state, ls = eng.train_step_donated(
                variables, opt_state, batch, key, lr, jnp.int32(i))
        float(ls.total)  # the chain runs through variables/opt_state
        dt = (time.perf_counter() - t0) / iters
        # measured on this host with `python bench.py --train --cpu
        # [--sup_only]` for the identical jitted step: 0.003 iters/sec
        # (338 s/iter) combined, 0.064 supervised-only
        cpu_train_baseline = (CPU_SUP_TRAIN_BASELINE_ITERS_PER_SEC
                              if args.sup_only else 0.003)
        print(json.dumps({
            "metric": f"{net_tag}_frcnn_train_iters_per_sec_"
                      f"{jax.devices()[0].platform}",
            "value": round(1.0 / dt, 3),
            "unit": "iters/sec",
            "vs_baseline": round((1.0 / dt) / cpu_train_baseline, 3),
        }))
        return

    variables, _ = eng.init(jax.random.PRNGKey(0))
    qtrunk = None
    if args.int8:
        net_tag += "_int8"

    # device-resident inputs: a real serving pipeline double-buffers the
    # host->device copy behind the previous step, so steady-state throughput
    # is the device step time, which is what we measure.
    # Methodology notes (hard-won, for the remote-attached TPU relay):
    #   * identical dispatches can be deduped and block_until_ready does not
    #     reliably wait, so each step PERTURBS its input with a genuinely
    #     data-dependent scalar from the previous step (a real chain — a
    #     `c * 0` term gets constant-folded and severs it), and the only
    #     trustworthy sync is a device->host value fetch;
    #   * a fetch costs a ~30-50 ms round trip, so we run a long chain with
    #     ONE final fetch and subtract the separately measured fetch RTT.
    import jax.numpy as jnp

    nb = max(1, args.batch)
    datas = [jax.device_put(rng.rand(nb, canvas[0], canvas[1], 3)
                            .astype(np.float32)) for _ in range(8)]
    im_info = jax.device_put(
        np.tile(np.array([[canvas[0], canvas[1], 1.0, 0.0]], np.float32),
                (nb, 1)))

    if args.int8:
        # calibrate on the bench inputs themselves (range-representative:
        # same distribution as every timed batch)
        qtrunk = eng.quantize_for_serving(variables, [datas[0]])

    # the measured serving compiler options apply to this OUTER jit — the
    # program a deployment actually runs (utils/tpu_opts.py: scoped-vmem
    # 64 MiB, +3.8% on the b32 headline; tools/PROBES.md "XLA
    # compiler-option sweep")
    from wssdl_bus_tpu.utils.tpu_opts import serving_compiler_options

    @partial(jax.jit, compiler_options=serving_compiler_options())
    def chained_step(c, data):
        if qtrunk is not None:
            outs = eng.inference_step_quant(qtrunk, variables,
                                            data + c * 1e-9, im_info)
        else:
            outs = eng._inference_impl(variables, data + c * 1e-9, im_info)
        return c + outs[2][0, 0] * 1e-9

    @jax.jit
    def trivial(c):
        return c + 1.0

    iters = max(1, (args.iters if not args.cpu
                    else max(3, args.iters // 6)))
    c = jnp.float32(0.0)
    for i in range(args.warmup + len(datas)):
        c = chained_step(c, datas[i % len(datas)])
    float(c)  # hard sync
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(time.perf_counter())))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    c = jnp.float32(0.0)
    t0 = time.perf_counter()
    for i in range(iters):
        c = chained_step(c, datas[i % len(datas)])
    float(c)  # hard sync
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)

    ips = iters * nb / dt
    platform = jax.devices()[0].platform
    if args.cpu:
        print(f"# CPU baseline: {ips:.3f} images/sec "
              f"({dt / (iters * nb) * 1e3:.1f} ms/image) — pin this into "
              f"CPU_BASELINE_IMAGES_PER_SEC[_BATCHED]", file=sys.stderr)
    tag = net_tag if nb == 1 else f"{net_tag}_b{nb}"
    baseline = (CPU_BASELINE_IMAGES_PER_SEC if nb == 1
                else CPU_BASELINE_IMAGES_PER_SEC_BATCHED)
    result = {
        "metric": f"{tag}_frcnn_inference_images_per_sec_{platform}",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
