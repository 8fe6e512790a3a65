"""Mixed-precision (bfloat16 conv/dense compute) sanity: outputs stay close
to float32 and everything emitted from the model boundary is float32."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_engine import CANVAS, synth_batch, tiny_cfg
from wssdl_bus_tpu.models.detector import build_detector
from wssdl_bus_tpu.train.engine import Engine


def test_bf16_engine_close_to_f32(rng):
    cfg = tiny_cfg()
    e32 = Engine(build_detector("VGGnet_train"), cfg, CANVAS, num_ws=0)
    e16 = Engine(build_detector("VGGnet_train", compute_dtype="bfloat16"),
                 cfg, CANVAS, num_ws=0)
    variables, opt_state = e32.init(jax.random.PRNGKey(0))
    e16.tx = e32.tx  # share the optimizer (init builds it)
    batch = synth_batch(rng, 1, 0)

    r32 = e32.inference_step(variables, batch["data"], batch["im_info"])
    r16 = e16.inference_step(variables, batch["data"], batch["im_info"])
    # boundary outputs are f32
    assert r16[2].dtype == jnp.float32 and r16[4].dtype == jnp.float32
    # class probabilities agree to bf16 tolerance
    np.testing.assert_allclose(np.asarray(r16[3]), np.asarray(r32[3]),
                               atol=0.05)

    # a bf16 train step runs and keeps f32 params
    v2, _, ls = e16.train_step(variables, opt_state, batch,
                               jax.random.PRNGKey(1), jnp.float32(1e-3),
                               jnp.int32(0))
    for l in ls:
        assert np.isfinite(np.asarray(l))
    leaf = v2["trunk"]["params"]["backbone"]["conv3_1"]["conv"]["kernel"]
    assert leaf.dtype == jnp.float32
