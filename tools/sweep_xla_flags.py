"""XLA compiler-option sweep over the serving and train hot programs
(r04 review, Weak #5): the conv-schedule "floor" claims (serving ~45-53%
MXU, train 23.2 it/s) blamed XLA conv scheduling; XLA's own knobs ARE in
the framework's control, so this tool measures them and the outcome is
recorded in tools/PROBES.md — either a faster configuration gets
re-pinned or the floor is finally proven.

Channel note (measured 2026-08-21): this client's XLA build is CPU-only
— every ``--xla_tpu_*`` flag in ``XLA_FLAGS`` is "Unknown flag" and
aborts the process; the TPU compiler lives behind the axon relay and is
reached via PJRT compile options
(``jax.jit(f).lower(...).compile(compiler_options=...)``), which the
relay forwards (verified: a bogus option name fails the REMOTE compile
with HTTP 500, a real TPU option compiles).  So the sweep AOT-compiles
each program per option set in-process; every new option set is one cold
remote compile, and results append to --out as they arrive.

Second verified channel: ``LIBTPU_INIT_ARGS="--xla_tpu_..."`` in the
environment ALSO reaches the remote compiler (same "No such compile
option" rejection for a bogus name; never parsed by the local OSS XLA,
so TPU-only names are safe there, unlike ``XLA_FLAGS``) and is hashed
into the axon cassette env key, so cached binaries can't leak across
flag configs.  That is the no-code-change vehicle for applying a winning
option process-wide; per-program application uses
``jax.jit(f, compiler_options=...)`` (supported in this jax).

    python tools/sweep_xla_flags.py --benches serve_b32 train
    python tools/sweep_xla_flags.py --only base lhs vmem96
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPTION_SETS = {
    "base": {},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vmem48": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem56": {"xla_tpu_scoped_vmem_limit_kib": "57344"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem72": {"xla_tpu_scoped_vmem_limit_kib": "73728"},
    "vmem80": {"xla_tpu_scoped_vmem_limit_kib": "81920"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "vmem128": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "lhs+vmem96": {"xla_tpu_enable_latency_hiding_scheduler": "true",
                   "xla_tpu_scoped_vmem_limit_kib": "98304"},
    # speculative names — a server-side rejection is itself a recorded
    # result (the option does not exist in this TPU compiler)
    "licm": {"xla_tpu_enable_while_loop_invariant_code_motion": "true"},
    "flm": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    # round 2: combos on top of the flm train win + more speculative names
    "flm+licm_ratio": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true",
                       "xla_tpu_licm_size_inflation_ratio": "2.0"},
    "flm+dotdot": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true",
                   "xla_tpu_dot_dot_fusion": "true"},
    "flm+nodsr": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true",
                  "xla_tpu_enable_dot_strength_reduction": "false"},
    "flm+fcm": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true",
                "xla_tpu_enable_experimental_fusion_cost_model": "true"},
    "vmem_prefetch": {"xla_tpu_enable_vmem_prefetching": "true"},
    "opt_barrier": {"xla_tpu_aggressive_opt_barrier_removal": "true"},
    "mof": {"xla_tpu_enable_multi_output_fusion": "true"},
    "cmerge": {"xla_tpu_enable_copy_fusion": "true"},
}

CANVAS = (608, 800)


def _engine(train):
    import jax
    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.engine import Engine
    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()
    cfg = Config()
    model = build_detector("VGGnet_train", 18, num_classes=3)
    eng = Engine(model, cfg, CANVAS)
    variables, opt_state = eng.init(jax.random.PRNGKey(0))
    return eng, variables, opt_state


def bench_serve_b32(opts, iters):
    """The b32 serving step under ``opts`` — the driver-headline program
    (bench.py's chained-dispatch protocol, minus the matrix plumbing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    eng, variables, _ = _engine(train=False)
    rng = np.random.RandomState(3)
    nb = 32
    datas = [jax.device_put(rng.rand(nb, *CANVAS, 3).astype(np.float32))
             for _ in range(8)]
    im_info = jax.device_put(np.tile(
        np.array([[CANVAS[0], CANVAS[1], 1.0, 0.0]], np.float32), (nb, 1)))

    def chained(c, data):
        outs = eng._inference_impl(variables, data + c * 1e-9, im_info)
        return c + outs[2][0, 0] * 1e-9

    step = jax.jit(chained).lower(jnp.float32(0.0), datas[0]) \
        .compile(compiler_options=opts or None)
    c = jnp.float32(0.0)
    for i in range(3 + len(datas)):
        c = step(c, datas[i % len(datas)])
    float(c)
    c = jnp.float32(0.0)
    t0 = time.perf_counter()
    for i in range(iters):
        c = step(c, datas[i % len(datas)])
    float(c)
    dt = time.perf_counter() - t0
    return {"metric": "serve_b32_images_per_sec",
            "value": round(iters * nb / dt, 3)}


def bench_train(opts, iters):
    """The combined device-resident train step under ``opts``."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    eng, variables, opt_state = _engine(train=True)
    rng = np.random.RandomState(3)
    n = 3
    gt = np.zeros((n, 20, 5), np.float32)
    gt[0, :3] = [[100, 100, 400, 300, 1], [300, 200, 600, 500, 2],
                 [10, 10, 90, 90, 0]]
    num_gt = np.zeros((n,), np.int32)
    num_gt[0] = 3
    batch = {
        "data": jax.device_put(rng.rand(n, *CANVAS, 3).astype(np.float32)),
        "gt_boxes": jax.device_put(gt),
        "num_gt_boxes": jax.device_put(num_gt),
        "im_info": jax.device_put(np.array(
            [[CANVAS[0], CANVAS[1], 1.33, d] for d in range(n)],
            np.float32)),
    }
    key, lr = jax.random.PRNGKey(1), jnp.float32(5e-4)

    step = jax.jit(
        lambda v, o, b, k, r, s: eng._train_step_impl(v, o, b, k, r, s),
        donate_argnums=(0, 1),
    ).lower(variables, opt_state, batch, key, lr, jnp.int32(0)) \
        .compile(compiler_options=opts or None)
    variables, opt_state, ls = step(variables, opt_state, batch, key, lr,
                                    jnp.int32(0))
    float(ls.total)
    t0 = time.perf_counter()
    for i in range(iters):
        variables, opt_state, ls = step(variables, opt_state, batch, key,
                                        lr, jnp.int32(i))
    float(ls.total)
    dt = (time.perf_counter() - t0) / iters
    return {"metric": "train_iters_per_sec", "value": round(1.0 / dt, 3)}


BENCHES = {"serve_b32": bench_serve_b32, "train": bench_train}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/xla_flag_sweep.jsonl")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--benches", nargs="*", default=list(BENCHES),
                    choices=list(BENCHES))
    args = ap.parse_args()
    names = args.only or list(OPTION_SETS)
    for bench in args.benches:
        for name in names:
            rec = {"opts_name": name, "opts": OPTION_SETS[name],
                   "bench": bench}
            t0 = time.time()
            try:
                rec.update(BENCHES[bench](OPTION_SETS[name], args.iters))
            except Exception as e:  # noqa: BLE001 — rejected option = result
                rec["error"] = str(e)[:400]
            rec["wall_s"] = round(time.time() - t0, 1)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
