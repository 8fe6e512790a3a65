"""Alternating-minibatch training CLI (reference ``code/main/train_alter.py``).

Supervised-only training: set --ws_start_iter > --max_iters
(train_alter.py:3-5).
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

    from wssdl_bus_tpu.train.solver import train_net_alter

    train_net_alter(args.network, roidb_s, roidb_ws, imdb_test, roidb_test,
                    args.output_dir, pretrained_model=args.pretrained_model,
                    max_iters=args.max_iters,
                    s_start_iter=args.s_start_iter,
                    s_end_iter=args.s_end_iter,
                    ws_start_iter=args.ws_start_iter,
                    ws_end_iter=args.ws_end_iter,
                    opt=args.opt, lr=args.lr,
                    lr_scheduling=args.lr_scheduling, vis=args.qual_res,
                    cfg=cfg, net_depth=args.net_depth,
                    norm_type=args.norm_type, dataset=args.dataset,
                    canvas_hw=canvas, use_prefetch=prefetch_choice(args),
                    resume=args.resume,
                    seed=(int(np.random.randint(2 ** 31))
                          if args.randomize else None),
                    mesh_data=args.mesh_data, mesh_model=args.mesh_model,
                    eval_batch=args.eval_batch,
                    compute_dtype=('bfloat16' if args.bf16
                                   else None),
                    remat={None: None, 'true': True,
                           'false': False}.get(args.remat,
                                               args.remat),
                    freeze_stem=not args.unfreeze_stem)


if __name__ == "__main__":
    main()
