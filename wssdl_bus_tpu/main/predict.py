"""Detect lesions in raw image files — the direct serving / demo CLI.

No reference analog: the reference can only evaluate registered imdb splits
(``/root/reference/code/main/test.py``); a deployed framework needs
image-in / boxes-out serving.  Works from EITHER a serving artifact
(written by ``main/export.py``) or a training snapshot::

    python -m wssdl_bus_tpu.main.predict --artifact /tmp/artifact a.png b.png
    python -m wssdl_bus_tpu.main.predict --model trained_model/run/..._iter_100 \
        --out preds/ --vis *.png

Writes ``predictions.json`` (per image: class / score / [x1,y1,x2,y2] in
original pixel coordinates, reference detection post-processing: per-class
score floor 0.05 + NMS ``cfg.TEST.NMS``) and, with ``--vis``, overlay PNGs.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_gray(path: str) -> np.ndarray:
    from PIL import Image
    im = Image.open(path)
    if im.mode != "L":  # RGB, paletted, 16-bit, ... -> the dataset's
        im = im.convert("L")  # 8-bit grayscale convention
    return np.asarray(im)


def main():
    parser = argparse.ArgumentParser(
        description="Run detection on raw image files")
    parser.add_argument("images", nargs="+", help="image file paths")
    parser.add_argument("--artifact", default=None, type=str,
                        help="serving artifact directory (main/export.py)")
    parser.add_argument("--model", default=None, type=str,
                        help="snapshot directory written by training")
    parser.add_argument("--out", default="./predictions", type=str)
    parser.add_argument("--thresh", default=0.5, type=float,
                        help="minimum score for a reported detection")
    parser.add_argument("--vis", action="store_true",
                        help="save overlay PNGs next to predictions.json")
    parser.add_argument("--batch", default=1, type=int,
                        help="images per device step (snapshot mode; "
                             "artifact mode uses the exported batch sizes)")
    from wssdl_bus_tpu.main.common import add_common_args, build_config
    add_common_args(parser)
    args = parser.parse_args()
    if (args.artifact is None) == (args.model is None):
        parser.error("exactly one of --artifact / --model is required")

    images = [_load_gray(p) for p in args.images]
    os.makedirs(args.out, exist_ok=True)

    if args.artifact:
        if args.cfg:
            parser.error("--cfg applies to --model mode; an artifact carries "
                         "its own config (host-side keys can still be "
                         "adjusted with --set_cfgs)")
        from wssdl_bus_tpu.serve import load_serving
        served = load_serving(args.artifact)
        # device-side keys (proposal budgets, canvas) are baked into the
        # exported program; overrides adjust the host-side post-processing
        # (e.g. TEST.NMS, TEST.CLS_AGNOSTIC_NMS)
        cfg = served.cfg.with_overrides(args.set_cfgs) if args.set_cfgs \
            else served.cfg
        step = max(served.batch_sizes)
        results = []
        for i in range(0, len(images), step):
            results.extend(served.detect(images[i:i + step]))
    else:
        cfg = build_config(args)
        import jax

        from wssdl_bus_tpu.data.augment import max_canvas
        from wssdl_bus_tpu.evaluate.detect import im_detect_batch
        from wssdl_bus_tpu.main.common import build_model
        from wssdl_bus_tpu.train.checkpoint import load_checkpoint
        from wssdl_bus_tpu.train.engine import Engine

        sizes = [im.shape[:2] for im in images]
        canvas = max_canvas(sizes, cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
        print(f"static canvas: {canvas}")
        model = build_model(args, cfg)
        eng = Engine(model, cfg, canvas, dataset=args.dataset)
        variables, _ = eng.init(jax.random.PRNGKey(cfg.RNG_SEED))
        variables, step = load_checkpoint(args.model, variables)
        print(f"restored snapshot at iter {step} from {args.model}")
        results = []
        for i in range(0, len(images), args.batch):
            chunk = images[i:i + args.batch]
            results.extend(im_detect_batch(eng, variables, chunk,
                                           args.network, canvas))

    from wssdl_bus_tpu.serve import CLASS_NAMES, report_detections
    class_names = CLASS_NAMES
    report = []
    for path, im, (scores, boxes) in zip(args.images, images, results):
        detections, kept = report_detections(scores, boxes, cfg,
                                             thresh=args.thresh)
        entry = {"image": path, "detections": detections}
        report.append(entry)
        if args.vis:
            from wssdl_bus_tpu.evaluate.visualize import draw_detections
            # draw exactly the reported set (already thresholded above)
            img = draw_detections(im, kept, class_names=class_names,
                                  thresh=-1.0,
                                  max_dets=max(1, len(entry["detections"])))
            stem = os.path.splitext(os.path.basename(path))[0]
            img.save(os.path.join(args.out, f"{stem}_pred.png"))

    out_json = os.path.join(args.out, "predictions.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    n_det = sum(len(e["detections"]) for e in report)
    print(f"{len(report)} images, {n_det} detections >= {args.thresh} "
          f"-> {out_json}")


if __name__ == "__main__":
    main()
