"""On-TPU whole-pipeline detection parity of the stem-dispatch variants.

The serving trunk's default is the plain XLA stem (fastest, r04 bench
matrix); ``WSSDL_STEM_TAIL=1`` opts into XLA conv1_1 (bf16 store) + the
Pallas stem-tail kernel (models/detector.py:apply_trunk).  The CPU e2e
oracle (tests/test_e2e_parity.py) can never see the kernel path — its
gate returns False off-TPU — so this tool checks what the reference's
``test_bus.py:146-240`` output contract actually cares about: the FINAL
detections, identical between the two dispatches (so the opt-in kernel
is safe to enable, and any future re-promotion is parity-backed).

It runs ``im_detect`` (per-image, the reference loop) and
``im_detect_batch`` (the serving path) over the 5 bundled SNUBH images
TWICE — in two subprocesses, ``WSSDL_STEM_TAIL=1`` vs ``0`` (the gate is
read at trace time, and value-identical Engines share one jit cache, so
an in-process flip would silently reuse the first trace) — and compares:

  * post-NMS detection COUNT per (image, class) must be IDENTICAL;
  * matched detection boxes within --box_tol px (default 0.1);
  * matched detection scores within --score_tol (default 2e-2, the bf16
    rounding of the conv1_1 activation propagated through the trunk).

Use ``--model <snapshot_dir>`` for trained weights (peaked, stable
detections — e.g. the snapshot ``tools/overfit_regression.py`` writes);
default is the deterministic PRNGKey(0) init.  NOTE: with random-init
weights the check is NOT meaningful — RPN scores are near-uniform, so
the bf16 rounding of conv1_1 activations (~1e-6 on matched scores)
flips which of thousands of near-tied proposals survive NMS, and the
survivor SETS diverge wholesale (measured 2026-08-21: max matched score
diff 6.6e-07 but count mismatches on every image).  Run it against a
trained snapshot, where proposals are peaked and the set is stable.

RECORDED RUN: see the bottom of this docstring — appended from the
actual on-TPU run output (kept verbatim).

Reference semantics: /root/reference/code/lib/fast_rcnn/test_bus.py:146-240
(im_detect output contract), 404-406 (the per-image loop).
"""
import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/SNUBH_BUS"


def child(args):
    import numpy as np

    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.data.dataset import get_imdb
    from wssdl_bus_tpu.evaluate.detect import (apply_nms_per_class,
                                               im_detect, im_detect_batch)
    from wssdl_bus_tpu.models.detector import FasterRCNN
    from wssdl_bus_tpu.train.engine import Engine

    assert jax.default_backend() == "tpu", "run this on the TPU host"
    cfg = Config()
    canvas = tuple(args.canvas)
    eng = Engine(FasterRCNN(backbone="VGGnet"), cfg, canvas)
    variables, _ = eng.init(jax.random.PRNGKey(0))
    if args.model:
        from wssdl_bus_tpu.train.checkpoint import load_checkpoint
        variables, _ = load_checkpoint(args.model, variables)

    imdb = get_imdb("bus_test", DATA)
    images = [imdb.read_image(i) for i in range(imdb.num_images)]

    out = {}
    for i, im in enumerate(images):
        scores, boxes = im_detect(eng, variables, im, "VGGnet_test", canvas)
        dets = apply_nms_per_class(
            np.asarray(scores), np.asarray(boxes), imdb.num_classes,
            0.05, cfg.TEST.NMS, cfg.TEST.CLS_AGNOSTIC_NMS)
        out[f"single_{i}_scores"] = np.asarray(scores)
        out[f"single_{i}_boxes"] = np.asarray(boxes)
        for c, d in enumerate(dets):
            out[f"single_{i}_det_{c}"] = np.asarray(d, np.float32)
    for i, (scores, boxes) in enumerate(
            im_detect_batch(eng, variables, images, "VGGnet_test", canvas)):
        out[f"batch_{i}_scores"] = np.asarray(scores)
        out[f"batch_{i}_boxes"] = np.asarray(boxes)
        dets = apply_nms_per_class(
            np.asarray(scores), np.asarray(boxes), imdb.num_classes,
            0.05, cfg.TEST.NMS, cfg.TEST.CLS_AGNOSTIC_NMS)
        for c, d in enumerate(dets):
            out[f"batch_{i}_det_{c}"] = np.asarray(d, np.float32)
    np.savez(args.emit, **out)
    print(f"[tail={os.environ.get('WSSDL_STEM_TAIL', '0')}] wrote "
          f"{len(out)} arrays -> {args.emit}")


def compare(path1, path0, box_tol, score_tol):
    import numpy as np

    a, b = np.load(path1), np.load(path0)
    assert set(a.files) == set(b.files), (
        f"output sets differ: {sorted(set(a.files) ^ set(b.files))[:8]}")
    worst_box = worst_score = 0.0
    failures = []
    for k in sorted(a.files):
        x, y = a[k], b[k]
        if "_det_" in k:
            if x.shape[0] != y.shape[0]:
                failures.append(f"{k}: detection count {x.shape[0]} vs "
                                f"{y.shape[0]}")
                continue
            if x.shape[0]:
                x = x[np.lexsort(x.T[::-1])]
                y = y[np.lexsort(y.T[::-1])]
                worst_box = max(worst_box,
                                float(np.abs(x[:, :4] - y[:, :4]).max()))
                worst_score = max(worst_score,
                                  float(np.abs(x[:, 4] - y[:, 4]).max()))
                if np.abs(x[:, :4] - y[:, :4]).max() > box_tol:
                    failures.append(f"{k}: box diff "
                                    f"{np.abs(x[:, :4] - y[:, :4]).max():.4f}")
                if np.abs(x[:, 4] - y[:, 4]).max() > score_tol:
                    failures.append(f"{k}: score diff "
                                    f"{np.abs(x[:, 4] - y[:, 4]).max():.5f}")
        else:
            d = float(np.abs(x - y).max())
            lim = score_tol if "scores" in k else max(box_tol, 1.0)
            if d > lim:
                failures.append(f"{k}: raw diff {d:.5f} > {lim}")
    print(f"max matched |box| diff {worst_box:.4f} px, "
          f"max matched score diff {worst_score:.2e}")
    if failures:
        print("PARITY FAILED:")
        for f in failures[:20]:
            print("  " + f)
        sys.exit(1)
    print("PARITY OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="snapshot dir (default: PRNGKey(0) init)")
    ap.add_argument("--canvas", type=int, nargs=2, default=(608, 800))
    ap.add_argument("--box_tol", type=float, default=0.1)
    ap.add_argument("--score_tol", type=float, default=2e-2)
    ap.add_argument("--emit", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.emit:  # child mode
        child(args)
        return

    with tempfile.TemporaryDirectory() as td:
        outs = {}
        for tail in ("1", "0"):
            outs[tail] = os.path.join(td, f"tail{tail}.npz")
            env = dict(os.environ, WSSDL_STEM_TAIL=tail)
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--emit", outs[tail],
                   "--canvas", str(args.canvas[0]), str(args.canvas[1])]
            if args.model:
                cmd += ["--model", args.model]
            subprocess.run(cmd, check=True, env=env, cwd="/root/repo")
        compare(outs["1"], outs["0"], args.box_tol, args.score_tol)


if __name__ == "__main__":
    main()
