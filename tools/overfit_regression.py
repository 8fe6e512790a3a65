"""Pinned end-metric regression: seeded overfit on the 5 bundled SNUBH
images, then eval — the only artifact that catches whole-system LEARNING
regressions (a kernel/optimizer/target-layer change that silently breaks
training passes every unit oracle; it cannot pass this).

Runs the real train CLI (combined regime, deterministic seed) on the
bundled `bus_test` split — the reference's own overfit-run defaults
(``/root/reference/code/main/train.py:40-42`` trains on the same 5
sample images; ``README.md:36-37`` calls them the only ground-truth
pairs available) — snapshots, evaluates with the test CLI, and asserts
the end metrics against pinned floors.

Scale-to-backend: on TPU the full recipe (default 600-px scale, 2000
iters) takes a few minutes of device time; on CPU use ``--iters 300
--small`` for a smoke run (no floor assertion — 300 iters is far from
convergence; the reference trajectory reaches loss ~0.9 only around
5000 iters).

    python tools/overfit_regression.py                  # TPU, asserts
    python tools/overfit_regression.py --iters 300 --small --no_assert

RECORDED RUN (v5e via axon relay, 2026-08-21, the run that pinned the
floors)::

    python tools/overfit_regression.py --out /tmp/wssdl_overfit4 \
        --iters 4000 --set_cfgs TRAIN.MAX_SIZE 800 TEST.MAX_SIZE 800
    loaded 26 pretrained arrays from .../he_init_vgg.npy
    static canvas: (608, 816)
    iter: 100 / 4000   total_loss: 1.0390  (rpn_cls 0.1958, rpn_box
        0.4409, cls 0.4015, box 0.0008, mil 0.0101)
    iter: 4000 / 4000  total_loss: 0.3945  (rpn_cls 0.0011, rpn_box
        0.2550, cls 0.0901, box 0.0484, mil 0.0189)
    speed: ~0.6 s/iter (host-data-bound on a 1-CPU driver host; the
        device step itself is ~43 ms)
    evaluation result: [1. 1. 1.]
    AP for benign = 1.0000      CorLoc for benign = 1.0000
    AP for malignant = 1.0000   CorLoc for malignant = 1.0000
    Mean AP = 1.0000            CorLoc = 1.0000
    OVERFIT REGRESSION OK: Mean AP 1.0000 >= 0.5, CorLoc 1.0000 >= 0.5

The floors (0.5/0.5) are deliberately far below the recorded 1.0/1.0:
they fail on any systemic learning regression while tolerating
seed/backend drift.  Two negative results from the same recipe are
recorded in the module history: (a) frozen-stem from-scratch and
(b) unfrozen trunc-normal(0.01) from-scratch BOTH converge in loss yet
evaluate to ZERO detections (constant-background head) — exactly the
silent failure class this tool exists to catch.

Reference: train defaults ``code/main/train.py:40-42``; eval
``code/lib/datasets/bus.py:263-392``.
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/SNUBH_BUS"

SMALL_CFGS = [
    "TRAIN.SCALES", "(150,)", "TRAIN.MAX_SIZE", "250",
    "TEST.SCALES", "(150,)", "TEST.MAX_SIZE", "250",
    "ANCHOR_SCALES", "(2,4,8)",
    "TRAIN.RPN_PRE_NMS_TOP_N", "300", "TRAIN.RPN_POST_NMS_TOP_N", "64",
    "TRAIN.BATCH_SIZE", "32", "TRAIN.RPN_BATCHSIZE", "64",
    "TEST.RPN_PRE_NMS_TOP_N", "200", "TEST.RPN_POST_NMS_TOP_N", "32",
]

# Floors pinned from the recorded TPU run (bottom of docstring), with
# margin for cross-backend f32 drift: the run must demonstrably LEARN.
FLOOR_MEAN_AP = 0.5
FLOOR_CORLOC = 0.5
CEIL_FINAL_LOSS = 1.6


def run_cli(main_fn, argv):
    old = sys.argv
    sys.argv = argv
    try:
        main_fn()
    finally:
        sys.argv = old


VGG_CONV_CHANNELS = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
]


def make_he_init_npy(path, seed=0):
    """Write a He-init VGG trunk in the reference's pretrained ``.npy``
    layout ({scope: {'weights': [3,3,ci,co], 'biases': [co]}}).

    Why this exists: no ImageNet weights ship in this environment, and the
    reference's trunc-normal(0.01) init CANNOT train from scratch under
    its own optimizer — activations decay ~100x per conv, trunk gradients
    come out ~1e-6, and reference-parity adam eps=0.1 (train_bus.py:
    694-699) then moves deep convs by ~1e-6 over 4000 iters (measured:
    conv3_1 moved <= 2e-6 across two independent 4k-iter runs).  The
    reference sidesteps this by REQUIRING an ImageNet .npy; a He-scaled
    random init restores O(1) activations/gradients the same way, through
    the very same --pretrained_model import path."""
    import numpy as np
    rng = np.random.RandomState(seed)
    data = {}
    for name, ci, co in VGG_CONV_CHANNELS:
        std = np.sqrt(2.0 / (9 * ci))
        data[name] = {
            "weights": (rng.randn(3, 3, ci, co) * std).astype(np.float32),
            "biases": np.zeros(co, np.float32),
        }
    np.save(path, data, allow_pickle=True)
    return path


def parse_eval(path):
    txt = open(path).read()
    m_ap = re.search(r"Mean AP = (-?[0-9.]+)", txt)
    m_cl = re.search(r"CorLoc = (-?[0-9.]+)", txt)
    if not (m_ap and m_cl):
        raise SystemExit(
            f"eval.txt has no Mean AP/CorLoc lines — eval produced no "
            f"usable metrics.  Contents:\n{txt}")
    return float(m_ap.group(1)), float(m_cl.group(1)), txt


def run_overfit(out, iters=2000, small=False, lr=None, set_cfgs=(),
                network="VGGnet_train", net_depth=18):
    """Train the seeded overfit recipe + evaluate it; -> (ckpt, eval_dir,
    mean_ap, corloc).  Importable so the on-hardware pytest lane
    (tests/tpu/) can share one trained snapshot across its tests."""
    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    cfgs = list(SMALL_CFGS) if small else []
    cfgs += ["TRAIN.SNAPSHOT_ITERS", str(iters),
             "TRAIN.TEST_ITERS", str(iters + 1),  # eval via test CLI
             "TRAIN.DISPLAY", "100"]
    if lr is not None:
        cfgs += ["TRAIN.LEARNING_RATE", str(lr)]
    cfgs += list(set_cfgs)

    out = os.path.abspath(out)
    from wssdl_bus_tpu.main.train import main as train_main
    # --unfreeze_stem: this is a FROM-SCRATCH run (no ImageNet weights in
    # the image) — with the reference's frozen conv1/conv2 the stem stays
    # at its random std-0.01 init and conv5_3 comes out nearly featureless
    # (measured 2026-08-21: spatial std ~12% of mean after 4k iters; the
    # RCNN head then collapses to the class prior and eval finds ZERO
    # detections despite loss_cls ~0.1 — the low CE is the 120:8 bg:fg
    # sampling ratio, not learning).  The reference never runs from
    # scratch (train.py requires the .npy init), so unfreezing here tests
    # the same learning machinery without contradicting parity defaults.
    # ResNet needs neither: nothing is frozen and BN keeps a from-scratch
    # init trainable, so the flax default init is used as-is.
    os.makedirs(out, exist_ok=True)
    net_args = ["--network", network, "--net_depth", str(net_depth)]
    if network.startswith("VGGnet"):
        he_npy = make_he_init_npy(os.path.join(out, "he_init_vgg.npy"))
        net_args += ["--unfreeze_stem", "--pretrained_model", he_npy]
    run_cli(train_main, [
        "train.py", "--max_iters", str(iters), "--output_dir", out,
        # prefetch measured +17% sustained it/s with the device-prep feed
        # (tools/PROBES.md "Train-feed decomposition")
        *net_args, "--prefetch", "--data_dir", DATA, "--set_cfgs", *cfgs])

    snaps = sorted(d for d in os.listdir(out) if "_iter_" in d)
    assert snaps, f"no snapshot written in {out}"
    ckpt = os.path.join(out, snaps[-1])
    print(f"snapshot: {ckpt}")

    eval_dir = os.path.join(out, "final_eval")
    mean_ap, corloc = run_eval(ckpt, eval_dir, set_cfgs=cfgs,
                               network=network.replace("_train", "_test"),
                               net_depth=net_depth)
    print(f"iters={iters} small={small}")
    return ckpt, eval_dir, mean_ap, corloc


def run_eval(ckpt, eval_dir, set_cfgs=(), network="VGGnet_test",
             net_depth=18, extra_args=()):
    """Evaluate a snapshot with the test CLI -> (mean_ap, corloc)."""
    from wssdl_bus_tpu.main.test import main as test_main
    run_cli(test_main, [
        "test.py", "--model", ckpt, "--output_dir", eval_dir,
        "--network", network, "--net_depth", str(net_depth),
        *extra_args, "--data_dir", DATA, "--set_cfgs", *set_cfgs])
    mean_ap, corloc, txt = parse_eval(os.path.join(eval_dir, "eval.txt"))
    print("\n===== overfit regression metrics =====")
    print("\n".join(l for l in txt.splitlines()[:6]))
    return mean_ap, corloc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--out", default="/tmp/wssdl_overfit")
    ap.add_argument("--small", action="store_true",
                    help="150-px canvas + (2,4,8) anchors (CPU smoke)")
    ap.add_argument("--no_assert", action="store_true")
    ap.add_argument("--network", default="VGGnet_train")
    ap.add_argument("--net_depth", type=int, default=18)
    ap.add_argument("--lr", type=float, default=None,
                    help="override TRAIN.LEARNING_RATE")
    ap.add_argument("--set_cfgs", nargs="*", default=[],
                    help="extra KEY VALUE config overrides appended last "
                         "(e.g. TRAIN.MAX_SIZE 800 TEST.MAX_SIZE 800 to pin "
                         "the 608x800 serving canvas, which reuses the "
                         "persistent-cache train/eval programs)")
    args = ap.parse_args()

    _, _, mean_ap, corloc = run_overfit(
        args.out, iters=args.iters, small=args.small, lr=args.lr,
        set_cfgs=args.set_cfgs, network=args.network,
        net_depth=args.net_depth)
    if args.no_assert:
        return
    assert mean_ap >= FLOOR_MEAN_AP, (
        f"LEARNING REGRESSION: Mean AP {mean_ap:.4f} < pinned floor "
        f"{FLOOR_MEAN_AP} (recorded run: docstring)")
    assert corloc >= FLOOR_CORLOC, (
        f"LEARNING REGRESSION: CorLoc {corloc:.4f} < pinned floor "
        f"{FLOOR_CORLOC}")
    print(f"OVERFIT REGRESSION OK: Mean AP {mean_ap:.4f} >= "
          f"{FLOOR_MEAN_AP}, CorLoc {corloc:.4f} >= {FLOOR_CORLOC}")


if __name__ == "__main__":
    main()
