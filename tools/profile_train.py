"""Decompose the combined train step's device time on the current backend.

Measures, with bench.py's chained-dispatch protocol (one hard sync, fetch-RTT
subtracted — required on remote-attached TPUs):

  * ``trunk_fwd_3img`` — VGG trunk forward on the 3-image joint batch;
  * ``full_fwd``       — the whole training forward + all losses;
  * ``full_grad``      — forward + complete backward (every gradient leaf is
    folded into the chain scalar so XLA cannot dead-code-eliminate any of the
    backward — consuming a single element would let it drop most of it);
  * ``train_step``     — the full jitted step incl. optimizer update.

Run from the repo root: ``python tools/profile_train.py``.

Reference measurement (one v5e chip, canvas 608x800, full budgets):
trunk_fwd_3img 10.2 ms, full_fwd 25.9 ms (=> detection ops + ROI pool +
heads ~15.5 ms), train_step 48.6 ms (=> backward + optimizer ~23 ms),
full_grad 99 ms.  full_grad >> train_step because it forces EVERY gradient
leaf to materialize; in the real step the optimizer's frozen-layer mask
never reads the conv1/conv2 gradients, so XLA dead-code-eliminates the
most expensive (full-resolution) part of the backward — the reference's
trainable=False freezing (VGGnet_train_bus.py:45-49) falls out of the
functional formulation for free.
Roofline: the trunk runs ~890 GFLOP fwd at ~87 TF/s effective (~45% of the
197 TF/s bf16 MXU peak; explicitly casting activations to bf16 is
throughput-neutral, so the limit is the conv schedule, not HBM bandwidth).
"""

import json
import os
import sys
import time

# runnable as `python tools/profile_train.py` without installing the package
# (PYTHONPATH must stay unset for real-TPU runs — it breaks the plugin
# registration; see .claude/skills/verify/SKILL.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import build_detector
from wssdl_bus_tpu.train.engine import Engine


def main():
    cfg = Config()
    canvas = (608, 800)
    model = build_detector("VGGnet_train", num_classes=3)
    eng = Engine(model, cfg, canvas)
    variables, opt_state = eng.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    gt = np.zeros((3, 20, 5), np.float32)
    gt[0, :3] = [[100, 100, 400, 300, 1], [300, 200, 600, 500, 2],
                 [10, 10, 90, 90, 0]]
    batch = {
        "data": jax.device_put(rng.rand(3, *canvas, 3).astype(np.float32)),
        "gt_boxes": jax.device_put(gt),
        "num_gt_boxes": jax.device_put(np.array([3, 0, 0], np.int32)),
        "im_info": jax.device_put(np.array(
            [[canvas[0], canvas[1], 1.33, d] for d in (0, 1, 2)],
            np.float32)),
    }
    key = jax.random.PRNGKey(1)
    params = {"trunk": variables["trunk"]["params"],
              "head": variables["head"]["params"]}

    def loss_of(p, data, c):
        b = dict(batch)
        b["data"] = data + c * 1e-9
        out = eng._forward_train(p, variables, b, key, jnp.int32(0))
        ls = eng._losses(out[1], out[2], out[3], out[4], out[5], out[7],
                         out[8], b, jnp.int32(0))
        return ls.total + ls.mil_cls

    @jax.jit
    def trunk_fwd(c, data):
        var = eng._split_vars(variables, params)
        feat, _, _, _ = eng.model.apply_trunk(var, data + c * 1e-9,
                                              train=True)
        return c + feat[0, 0, 0, 0] * 1e-9

    @jax.jit
    def full_fwd(c, data):
        return c + loss_of(params, data, c) * 1e-9

    @jax.jit
    def full_grad(c, data):
        g = jax.grad(loss_of)(params, data, c)
        # consume EVERY leaf so no part of the backward is DCE'd
        tot = sum(jnp.sum(x * x) for x in jax.tree.leaves(g))
        return c + tot * 1e-12

    @jax.jit
    def trivial(c):
        return c + 1.0

    state = {"v": variables, "o": opt_state}

    def train_step(c, data):
        b = dict(batch)
        b["data"] = data + c * 1e-9
        state["v"], state["o"], ls = eng.train_step(
            state["v"], state["o"], b, key, jnp.float32(5e-4), jnp.int32(0))
        return c + ls.total * 1e-9

    def measure(fn, iters=40):
        c = jnp.float32(0.0)
        for _ in range(6):
            c = fn(c, batch["data"])
        float(c)
        rtts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(trivial(jnp.float32(time.perf_counter())))
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(c, batch["data"])
        float(c)
        return (time.perf_counter() - t0 - rtt) / iters * 1e3

    for name, fn in [("trunk_fwd_3img", trunk_fwd), ("full_fwd", full_fwd),
                     ("full_grad", full_grad), ("train_step", train_step)]:
        print(json.dumps({name: round(measure(fn), 2)}))


if __name__ == "__main__":
    main()
