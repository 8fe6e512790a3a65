"""Export a trained snapshot to a portable serving artifact.

No reference analog — the reference "deploys" by re-running its TF1 graph
builder against a ``.ckpt`` (``/root/reference/code/main/test.py:40-74``).
Here the compiled inference program (StableHLO via :mod:`jax.export`), the
weights, and the config are bundled into one directory that a serving
process restores without any model-building code::

    python -m wssdl_bus_tpu.main.export --model trained_model/run/..._iter_100 \
        --out artifact/ --batch_sizes 1,32
"""

from __future__ import annotations

import argparse
import pprint


def main():
    parser = argparse.ArgumentParser(
        description="Export a snapshot to a serving artifact")
    parser.add_argument("--model", required=True, type=str,
                        help="snapshot directory written by training")
    parser.add_argument("--out", required=True, type=str,
                        help="artifact output directory")
    parser.add_argument("--batch_sizes", default="1", type=str,
                        help="comma-separated device batch sizes to export")
    parser.add_argument("--canvas", default=None, type=int, nargs=2,
                        metavar=("H", "W"),
                        help="static canvas; default derives from "
                             "--imdb_test like main/test.py")
    parser.add_argument("--imdb_test", default="bus_test", type=str)
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantize (VGG trunk; ResNet trunk + "
                             "group3 head, norm None/BN): calibrate "
                             "activation ranges on --imdb_test images and "
                             "ship int8 weights (models/quantize.py)")
    parser.add_argument("--calib_images", default=16, type=int,
                        help="number of --imdb_test images used for int8 "
                             "activation-range calibration")
    from wssdl_bus_tpu.main.common import add_common_args, build_config, \
        seed_all
    add_common_args(parser)
    args = parser.parse_args()
    print("Called with args:")
    print(args)

    cfg = build_config(args)
    print("Using config:")
    pprint.pprint(cfg)
    seed_all(args, cfg)

    roidb = None
    if args.canvas is None or args.int8:
        from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb
        imdb = get_imdb(args.imdb_test, args.data_dir)
        roidb = prepare_roidb(imdb)
    if args.canvas is not None:
        canvas = tuple(args.canvas)
    else:
        from wssdl_bus_tpu.data.augment import max_canvas
        sizes = [(e["height"], e["width"]) for e in roidb]
        canvas = max_canvas(sizes, cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
    print(f"static canvas: {canvas}")

    import jax

    from wssdl_bus_tpu.main.common import build_model
    from wssdl_bus_tpu.serve import export_serving
    from wssdl_bus_tpu.train.checkpoint import load_checkpoint
    from wssdl_bus_tpu.train.engine import Engine

    model = build_model(args, cfg)
    eng = Engine(model, cfg, canvas, dataset=args.dataset)
    variables, _ = eng.init(jax.random.PRNGKey(cfg.RNG_SEED))
    variables, step = load_checkpoint(args.model, variables)
    print(f"restored snapshot at iter {step} from {args.model}")

    calib = None
    if args.int8:
        import numpy as np
        from PIL import Image

        from wssdl_bus_tpu.evaluate.detect import pack_image_batch
        images = [np.asarray(Image.open(e["image"]))
                  for e in roidb[:args.calib_images]]
        blob, _, _ = pack_image_batch(eng, images, args.network, canvas)
        calib = [blob]
        print(f"int8 calibration on {len(images)} {args.imdb_test} images")

    batch_sizes = sorted({int(b) for b in args.batch_sizes.split(",")})
    meta = export_serving(eng, variables, args.out, args.network,
                          batch_sizes=batch_sizes, calib_batches=calib)
    print(f"exported {meta['net_name']} (canvas {meta['canvas_hw']}, "
          f"batches {meta['batch_sizes']}, platform {meta['platform']}, "
          f"quantized {meta['quantized']}) to {args.out}")


if __name__ == "__main__":
    main()
