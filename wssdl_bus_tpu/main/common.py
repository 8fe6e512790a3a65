"""Shared CLI plumbing for the train / train_alter / test entry points
(mirrors ``/root/reference/code/main/train.py:18-48`` arguments)."""

from __future__ import annotations

import argparse

import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.data.augment import max_canvas
from wssdl_bus_tpu.data.dataset import get_imdb, get_training_roidb, \
    prepare_roidb


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--network", default="VGGnet_train", type=str,
                        help="name of the network "
                             "(VGGnet_train / Resnet_train / *_test)")
    parser.add_argument("--net_depth", default=18, type=int,
                        help="ResNet depth (18, 34, 50, 101)")
    parser.add_argument("--dataset", default="SNUBH", type=str,
                        help="dataset mode (SNUBH / SNUBH_FG / UDIAT)")
    parser.add_argument("--norm_type", default="BN", type=str,
                        help="normalization type (BN / GN)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 conv/dense compute (f32 params, "
                             "losses and detection geometry)")
    parser.add_argument("--remat", default=None,
                        choices=["true", "false", "head", "trunk"],
                        help="override the backbone's activation-remat "
                             "default (models/detector.py:build_detector)")
    parser.add_argument("--data_dir", default="/root/reference/SNUBH_BUS",
                        type=str, help="SNUBH_BUS dataset root")
    parser.add_argument("--set_cfgs", default=None, nargs=argparse.REMAINDER,
                        help="override config keys, e.g. "
                             "TRAIN.SNAPSHOT_ITERS 100")
    parser.add_argument("--cfg", default=None, type=str,
                        help="optional YAML config override file")
    parser.add_argument("--randomize", action="store_true",
                        help="do not fix the random seed")
    parser.add_argument("--output_dir", default="./trained_model/run",
                        type=str)
    parser.add_argument("--mesh_data", default=1, type=int,
                        help="data-parallel mesh extent (devices on the "
                             "batch axis); mesh_data*mesh_model > 1 runs "
                             "SPMD via parallel.ParallelEngine")
    parser.add_argument("--mesh_model", default=1, type=int,
                        help="tensor-parallel mesh extent for the RCNN head "
                             "(VGG only)")


def build_model(args, cfg: Config):
    """The one CLI -> detector construction (shared by test / export /
    predict so num_classes and the GN params cannot drift between them)."""
    from wssdl_bus_tpu.models.detector import build_detector

    remat = {None: None, "true": True, "false": False}.get(
        getattr(args, "remat", None), getattr(args, "remat", None))
    return build_detector(args.network, args.net_depth, args.norm_type,
                          num_classes=3,
                          compute_dtype=("bfloat16"
                                         if getattr(args, "bf16", False)
                                         else None),
                          remat=remat,
                          gn_params=(cfg.TRAIN.GN_MIN_NUM_G,
                                     cfg.TRAIN.GN_MIN_CHS_PER_G))


def add_train_args(parser: argparse.ArgumentParser):
    parser.add_argument("--max_iters", default=60000, type=int)
    parser.add_argument("--s_start_iter", default=0, type=int)
    parser.add_argument("--s_end_iter", default=60000, type=int)
    parser.add_argument("--ws_start_iter", default=0, type=int)
    parser.add_argument("--ws_end_iter", default=60000, type=int)
    parser.add_argument("--pretrained_model", default=None, type=str,
                        help="path to an ImageNet .npy weight dict")
    parser.add_argument("--unfreeze_stem", action="store_true",
                        help="let VGG conv1/conv2 train (the reference "
                             "freezes them, VGGnet_train_bus.py:45-49 — "
                             "correct with ImageNet weights, catastrophic "
                             "from scratch: a frozen random stem leaves the "
                             "trunk featureless)")
    parser.add_argument("--opt", default="adam", type=str,
                        help="adam / amsgrad / sgd")
    parser.add_argument("--lr", default=5e-4, type=float)
    parser.add_argument("--lr_scheduling", default="const", type=str,
                        help="const / pc / rop")
    parser.add_argument("--imdb_train_s", default="bus_test", type=str)
    parser.add_argument("--imdb_train_ws", default="bus_test", type=str)
    parser.add_argument("--imdb_test", default="bus_test", type=str)
    # tri-state prefetch: --prefetch forces on, --no_prefetch forces off,
    # neither defers to cfg.TRAIN.USE_PREFETCH (reference config.py:172)
    parser.add_argument("--prefetch", action="store_true",
                        help="overlap host-side augmentation with the device "
                             "step on a background thread")
    parser.add_argument("--no_prefetch", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest snapshot in output_dir "
                             "(a capability the reference lacks)")
    parser.add_argument("--qual_res", action="store_true",
                        help="save qualitative overlays during in-loop eval "
                             "(the reference's qual_res, train.py:44-45)")
    parser.add_argument("--eval_batch", default=1, type=int,
                        help="test images per device step during in-loop "
                             "eval (1 = the reference's per-image cadence)")


def prefetch_choice(args):
    """-> True / False / None (None = honor cfg.TRAIN.USE_PREFETCH)."""
    if args.no_prefetch:
        return False
    if args.prefetch:
        return True
    return None


def build_config(args) -> Config:
    cfg = Config.from_yaml(args.cfg) if args.cfg else Config()
    if args.set_cfgs:
        cfg = cfg.with_overrides(args.set_cfgs)
    if hasattr(args, "lr"):
        cfg = cfg.with_overrides(["TRAIN.LEARNING_RATE", str(args.lr)])
    return cfg


def load_train_data(args, cfg: Config):
    """-> (roidb_s, roidb_ws, imdb_test, roidb_test, canvas_hw)."""
    imdb_s = get_imdb(args.imdb_train_s, args.data_dir)
    roidb_s = get_training_roidb(imdb_s, use_flipped=cfg.TRAIN.USE_FLIPPED)
    imdb_ws = get_imdb(args.imdb_train_ws, args.data_dir)
    roidb_ws = get_training_roidb(imdb_ws, use_flipped=cfg.TRAIN.USE_FLIPPED)
    imdb_test = get_imdb(args.imdb_test, args.data_dir)
    roidb_test = prepare_roidb(imdb_test)

    sizes = [(e["height"], e["width"])
             for e in roidb_s + roidb_ws + roidb_test]
    canvas = max_canvas(sizes, cfg.TRAIN.SCALES[0], cfg.TRAIN.MAX_SIZE,
                        crop_margin=(cfg.TRAIN.CROPPING_MAX_MARGIN
                                     if cfg.TRAIN.USE_CROPPING else 0.0))
    return roidb_s, roidb_ws, imdb_test, roidb_test, canvas


def seed_all(args, cfg: Config):
    if not args.randomize:
        np.random.seed(cfg.RNG_SEED)
    enable_compilation_cache()


# Re-exported for backwards compatibility; the implementation lives in the
# leaf module utils/xla_cache.py so bench/entry scripts can enable the cache
# without importing the CLI plumbing (numpy, PIL, dataset layer).
from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache  # noqa: E402,F401
