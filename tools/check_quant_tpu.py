"""Real-TPU spot check for the int8 serving path: the quantized trunk's
integer codes must be exact on TPU (int conv arithmetic), and the
dequantized features must track a float64 numpy oracle.  Run from the
repo root on the TPU-attached host."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.models.quantize import (calibrate_vgg_trunk,
                                           quant_trunk_apply,
                                           quantize_vgg_trunk)

print("devices:", jax.devices())
rng = np.random.RandomState(0)
model = FasterRCNN(backbone="VGGnet")
CAL = (96, 128)
variables = model.init_variables(jax.random.PRNGKey(0), CAL)


def rand_like(a):
    if a.ndim == 4:
        return jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.05)
    return a


variables["trunk"] = dict(variables["trunk"])
variables["trunk"]["params"] = jax.tree.map(
    rand_like, variables["trunk"]["params"])

data = rng.randn(1, *CAL, 3).astype(np.float32) * 20.0
scales = calibrate_vgg_trunk(model, variables, [data])
qtrunk = quantize_vgg_trunk(variables, scales)

feat_tpu, cls_tpu, _ = jax.jit(quant_trunk_apply)(qtrunk, jnp.asarray(data))
feat_tpu = np.asarray(feat_tpu)

# float64 numpy oracle of the same quantized chain
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_quantize import quant_trunk_oracle  # noqa: E402

feat_np = quant_trunk_oracle(qtrunk, data)
rel = np.abs(feat_tpu - feat_np) / np.maximum(np.abs(feat_np), 1e-6)
print(f"feat maxdiff {np.abs(feat_tpu - feat_np).max():.3e} "
      f"relmax {rel.max():.3e}")
# integer conv results are exact; only the f32 dequant chain can differ
# by ulps between TPU and numpy
np.testing.assert_allclose(feat_tpu, feat_np, rtol=1e-4, atol=1e-5)
f32_feat = np.asarray(model.apply_trunk(variables, jnp.asarray(data),
                                        train=False)[0])
rms = np.sqrt(((feat_tpu - f32_feat) ** 2).mean()) \
    / max(np.sqrt((f32_feat ** 2).mean()), 1e-12)
print(f"rel-RMS vs f32 trunk: {rms:.4f}")
assert rms < 0.05
print("check_quant_tpu OK")
