"""Combined-minibatch training CLI (reference ``code/main/train.py``).

Example (overfit run on the 5 bundled sample images, like the reference's
own defaults):

    python -m wssdl_bus_tpu.main.train --max_iters 200 \
        --output_dir /tmp/vgg_overfit \
        --set_cfgs TRAIN.SNAPSHOT_ITERS 100 TRAIN.TEST_ITERS 100
"""

from __future__ import annotations

import argparse
import pprint

from wssdl_bus_tpu.main.common import (add_common_args, add_train_args,
                                       build_config, load_train_data,
                                       seed_all)


def main():
    parser = argparse.ArgumentParser(
        description="Train a Faster R-CNN network (combined minibatches)")
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
    # combined regime selector pair: [mal_max, mal_max] (train_bus.py:656)
    eng = Engine(model, cfg, canvas, dataset=args.dataset, opt_name=args.opt,
                 selector_pair=("mal_max", "mal_max"))
    solver = Solver(eng, cfg, args.network, roidb_s, roidb_ws, imdb_test,
                    roidb_test, args.output_dir,
                    lr_scheduling=args.lr_scheduling,
                    max_iters=args.max_iters,
                    pretrained=args.pretrained_model,
                    use_prefetch=not args.no_prefetch, vis=args.qual_res,
                    resume=args.resume)
    solver.train_combined()
    print("done solving")


if __name__ == "__main__":
    main()
