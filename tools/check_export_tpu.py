"""Real-TPU spot check: serving-artifact export/restore with the Pallas
kernels (Mosaic custom calls) in the program.  Exports a tiny engine's
inference step, restores it, and compares against the live Engine bitwise.
Run from the repo root (no PYTHONPATH — it breaks the TPU plugin)."""
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.serve import export_serving, load_serving
from wssdl_bus_tpu.train.engine import Engine

CANVAS = (96, 128)
cfg = Config().with_overrides([
    "TEST.RPN_PRE_NMS_TOP_N", "200", "TEST.RPN_POST_NMS_TOP_N", "32",
    "TEST.SCALES", "(90,)", "TEST.MAX_SIZE", "128",
])
model = FasterRCNN(backbone="VGGnet")
eng = Engine(model, cfg, CANVAS)
variables, _ = eng.init(jax.random.PRNGKey(0))
print("platform:", jax.default_backend())

with tempfile.TemporaryDirectory() as out:
    export_serving(eng, variables, out, "VGGnet_test", batch_sizes=(1,))
    served = load_serving(out)
    rng = np.random.RandomState(0)
    data = rng.rand(1, *CANVAS, 3).astype(np.float32)
    infos = np.array([[CANVAS[0], CANVAS[1], 1.5, 0.0]], np.float32)
    want = eng.inference_step(variables, data, infos)
    got = served.inference_step(served.variables, data, infos)
    for w, g, name in zip(want, got, ("rois", "valid", "cls_score",
                                      "cls_prob", "bbox_pred")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), name)
    print("export/restore OK (bitwise vs live engine)")
