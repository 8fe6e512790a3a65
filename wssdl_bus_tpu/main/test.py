"""Inference / evaluation CLI (reference ``code/main/test.py``)."""

from __future__ import annotations

import argparse
import pprint

import numpy as np

from wssdl_bus_tpu.main.common import add_common_args, build_config, seed_all


def main():
    parser = argparse.ArgumentParser(
        description="Test a Faster R-CNN network")
    parser.add_argument("--model", required=True, type=str,
                        help="snapshot directory written by training")
    parser.add_argument("--imdb_test", default="bus_test", type=str)
    parser.add_argument("--comp_mode", action="store_true",
                        help="competition mode (kept for CLI parity)")
    parser.add_argument("--qual_res", action="store_true",
                        help="save qualitative detection overlays")
    parser.add_argument("--batch_size", default=1, type=int,
                        help="images per device step (batched serving path)")
    parser.add_argument("--int8", action="store_true",
                        help="evaluate the int8-quantized model instead "
                             "(VGG trunk; ResNet trunk + group3 head, norm "
                             "None/BN; models/quantize.py) — measures "
                             "quantized-vs-f32 mAP/CorLoc directly")
    parser.add_argument("--calib_imdb", default=None, type=str,
                        help="imdb whose images calibrate int8 activation "
                             "ranges (default: the evaluated --imdb_test)")
    parser.add_argument("--calib_images", default=16, type=int)
    add_common_args(parser)
    args = parser.parse_args()
    print("Called with args:")
    print(args)

    cfg = build_config(args)
    print("Using config:")
    pprint.pprint(cfg)
    seed_all(args, cfg)

    from wssdl_bus_tpu.data.augment import max_canvas
    from wssdl_bus_tpu.data.dataset import get_imdb, prepare_roidb
    from wssdl_bus_tpu.evaluate.detect import test_net
    from wssdl_bus_tpu.main.common import build_model
    from wssdl_bus_tpu.train.checkpoint import load_checkpoint

    imdb = get_imdb(args.imdb_test, args.data_dir)
    imdb.competition_mode(args.comp_mode)  # reference test.py:50
    roidb = prepare_roidb(imdb)
    sizes = [(e["height"], e["width"]) for e in roidb]
    canvas = max_canvas(sizes, cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
    print(f"static canvas: {canvas}")

    import jax

    model = build_model(args, cfg)
    batch_size = args.batch_size
    from wssdl_bus_tpu.parallel import build_engine
    eng = build_engine(model, cfg, canvas, args.mesh_data, args.mesh_model,
                       dataset=args.dataset)
    if args.mesh_data > 1 and batch_size % args.mesh_data:
        batch_size = args.mesh_data * (
            (batch_size + args.mesh_data - 1) // args.mesh_data)
        print(f"batch_size rounded up to {batch_size} "
              f"(a multiple of mesh_data={args.mesh_data})")
    variables, _ = eng.init(jax.random.PRNGKey(cfg.RNG_SEED))
    variables, step = load_checkpoint(args.model, variables)
    print(f"restored snapshot at iter {step} from {args.model}")
    if args.mesh_data * args.mesh_model > 1:
        variables = eng.replicate(variables)

    if args.int8:
        if args.mesh_data * args.mesh_model > 1:
            raise NotImplementedError("--int8 is single-device serving")
        from PIL import Image

        from wssdl_bus_tpu.evaluate.detect import pack_image_batch
        from wssdl_bus_tpu.models.quantize import QuantServingEngine
        calib_roidb = roidb
        if args.calib_imdb:
            calib_roidb = prepare_roidb(get_imdb(args.calib_imdb,
                                                 args.data_dir))
        else:
            print("int8 NOTE: calibrating on the evaluated split itself — "
                  "the reported delta excludes calibration-set shift; pass "
                  "--calib_imdb <train split> for deployment-honest numbers")
        images = [np.asarray(Image.open(e["image"]))
                  for e in calib_roidb[:args.calib_images]]
        blob, _, _ = pack_image_batch(eng, images, args.network, canvas)
        qtrunk = eng.quantize_for_serving(variables, [blob])
        print(f"int8: calibrated on {len(images)} images from "
              f"{args.calib_imdb or args.imdb_test}")
        eng = QuantServingEngine(eng, qtrunk)

    _, result = test_net(eng, variables, imdb, args.output_dir, args.network,
                         canvas, vis=args.qual_res,
                         batch_size=batch_size)
    print("evaluation result:", np.asarray(result))


if __name__ == "__main__":
    main()
