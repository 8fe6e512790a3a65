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

import numpy as np

from wssdl_bus_tpu.main.common import (add_common_args, add_train_args,
                                       build_config, load_train_data,
                                       prefetch_choice, seed_all)


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

    from wssdl_bus_tpu.train.solver import train_net

    train_net(args.network, roidb_s, roidb_ws, imdb_test, roidb_test,
              args.output_dir, pretrained_model=args.pretrained_model,
              max_iters=args.max_iters, opt=args.opt, lr=args.lr,
              lr_scheduling=args.lr_scheduling, vis=args.qual_res,
              cfg=cfg, net_depth=args.net_depth, norm_type=args.norm_type,
              dataset=args.dataset, canvas_hw=canvas,
              use_prefetch=prefetch_choice(args), resume=args.resume,
              seed=(int(np.random.randint(2 ** 31))
                    if args.randomize else None),
              mesh_data=args.mesh_data, mesh_model=args.mesh_model,
              eval_batch=args.eval_batch,
              compute_dtype=('bfloat16' if args.bf16 else None),
              remat={None: None, 'true': True,
                     'false': False}.get(args.remat, args.remat),
              freeze_stem=not args.unfreeze_stem)


if __name__ == "__main__":
    main()
