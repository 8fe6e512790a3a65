"""Alternating-minibatch training CLI (reference ``code/main/train_alter.py``).

Supervised-only training: set --ws_start_iter > --max_iters
(train_alter.py:3-5).
"""

from __future__ import annotations

import argparse
import pprint

from wssdl_bus_tpu.main.common import (add_common_args, add_train_args,
                                       build_config, load_train_data,
                                       seed_all)


def main():
    parser = argparse.ArgumentParser(
        description="Train a Faster R-CNN network (alternating minibatches)")
    add_train_args(parser)
    add_common_args(parser)
    args = parser.parse_args()
    print("Called with args:")
    print(args)

    cfg = build_config(args)
    print("Using config:")
    pprint.pprint(cfg)
    seed_all(args, cfg)

    roidb_s, roidb_ws, imdb_test, roidb_test, canvas = \
        load_train_data(args, cfg)
    print(f"static canvas: {canvas}")

    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.engine import Engine
    from wssdl_bus_tpu.train.solver import Solver

    model = build_detector(args.network, args.net_depth, args.norm_type,
                           num_classes=3)
    # supervised steps carry batch IMS_PER_BATCH with no weak images
    eng = Engine(model, cfg, canvas, num_ws=0, dataset=args.dataset,
                 opt_name=args.opt,
                 selector_pair=("mass_max", "mal_max"))
    solver = Solver(eng, cfg, args.network, roidb_s, roidb_ws, imdb_test,
                    roidb_test, args.output_dir,
                    lr_scheduling=args.lr_scheduling,
                    max_iters=args.max_iters,
                    pretrained=args.pretrained_model,
                    use_prefetch=not args.no_prefetch, vis=args.qual_res,
                    resume=args.resume)
    solver.train_alternating(args.s_start_iter, args.s_end_iter,
                             args.ws_start_iter, args.ws_end_iter)
    print("done solving")


if __name__ == "__main__":
    main()
