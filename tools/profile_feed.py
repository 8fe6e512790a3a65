"""Host data-path profiler: where does the end-to-end train feed time go?

The r04 verdict's top finding: every recorded train number times the
DEVICE step on a device-resident batch (23.2 it/s), while the one real
training run fed at ~0.6 s/iter — 14x slower, host-bound.  This probe
decomposes one combined-regime feed iteration on the bundled SNUBH data
into its cost centers so the fix targets the real bottleneck:

  decode      PIL TIFF open + flip            (data/minibatch.py:_load_gray)
  augment     rotate/crop/photometric/resize  (data/augment.py:prep_image)
  pack        static-canvas blob assembly     (data/minibatch.py:_pack)
  put         host->device transfer           (solver.py:_put_batch — through
                                               the axon relay this is a real
                                               network copy, ~18 MB/step f32)
  step        the donated device train step   (train/engine.py)

plus the overlapped configurations a real run uses (Prefetcher on/off).

Usage:  python tools/profile_feed.py [--iters 20] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/SNUBH_BUS"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no_step", action="store_true",
                    help="host-side only (no device step timing)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import numpy as np

    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.data.augment import max_canvas, prep_image
    from wssdl_bus_tpu.data.dataset import get_imdb, get_training_roidb
    from wssdl_bus_tpu.data.loader import Prefetcher, RoIDataLayerJoint
    from wssdl_bus_tpu.data.minibatch import _load_gray, _pack

    cfg = Config()
    imdb = get_imdb("bus_test", DATA)
    roidb = get_training_roidb(imdb, use_flipped=cfg.TRAIN.USE_FLIPPED)
    sizes = [(e["height"], e["width"]) for e in roidb]
    canvas = max_canvas(sizes, cfg.TRAIN.SCALES[0], cfg.TRAIN.MAX_SIZE,
                        crop_margin=cfg.TRAIN.CROPPING_MAX_MARGIN)
    print(f"canvas: {canvas}, roidb: {len(roidb)} entries")
    rng = np.random.RandomState(3)

    def t(fn, n=None, label=""):
        n = n or args.iters
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        print(f"  {label:<28s} {dt * 1e3:9.1f} ms")
        return dt

    # --- micro pieces (3 images, the combined-batch shape 1 sup + 2 ws) ---
    entries = [roidb[i % len(roidb)] for i in range(3)]
    print(f"[micro] per combined batch (3 images):")
    t(lambda: [_load_gray(e) for e in entries], label="decode (PIL TIFF x3)")
    ims = [_load_gray(e) for e in entries]
    t(lambda: [prep_image(im, "VGGnet_train", cfg, True, i > 0, rng)
               for i, im in enumerate(ims)], label="augment+resize x3")
    preps = [prep_image(im, "VGGnet_train", cfg, True, i > 0, rng)[0]
             for i, im in enumerate(ims)]
    t(lambda: _pack(preps, canvas), label="pack (canvas blob)")

    # --- the real joint layer ---
    layer = RoIDataLayerJoint(roidb, roidb, "VGGnet_train", cfg, canvas,
                              rng=np.random.RandomState(3))
    dt_fwd = t(layer.forward, label="layer.forward() total")

    blobs = layer.forward()
    nbytes = sum(v.nbytes for v in blobs.values())
    print(f"  batch payload: {nbytes / 1e6:.1f} MB "
          f"(data {blobs['data'].nbytes / 1e6:.1f} MB "
          f"{blobs['data'].shape} {blobs['data'].dtype})")

    if args.no_step:
        return

    import jax
    import jax.numpy as jnp

    from wssdl_bus_tpu.models.detector import build_detector
    from wssdl_bus_tpu.train.engine import Engine
    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"[device] backend: {jax.default_backend()}")
    model = build_detector("VGGnet_train", 18, num_classes=3)
    eng = Engine(model, cfg, canvas)
    variables, opt_state = eng.init(jax.random.PRNGKey(0))

    def put():
        out = {k: jnp.asarray(v) for k, v in blobs.items()}
        jax.block_until_ready(out)
        return out

    t(put, label="device_put (blocked)")
    key, lr = jax.random.PRNGKey(1), jnp.float32(5e-4)

    dev = put()
    variables, opt_state, ls = eng.train_step_donated(
        variables, opt_state, dev, key, lr, jnp.int32(0))
    float(ls.total)

    def step_resident():
        nonlocal variables, opt_state
        variables, opt_state, ls = eng.train_step_donated(
            variables, opt_state, dev, key, lr, jnp.int32(1))
        return ls

    ls = None
    t(step_resident, label="device step (resident, async)")
    float(step_resident().total)

    # --- staged loop variants: isolate the e2e overhead source ---
    # pre-draw real blobs so 'put'/'step' variants see fresh host arrays
    pre = [layer.forward() for _ in range(6)]

    def timed_loop(body, label, sync=None):
        body(0)  # warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            body(i)
        if sync is not None:
            sync()
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {label:<28s} {dt * 1e3:9.1f} ms")
        return dt

    timed_loop(lambda i: layer.forward(), "loop: forward only")
    timed_loop(lambda i: jax.block_until_ready(
        {k: jnp.asarray(v) for k, v in pre[i % 6].items()}),
        "loop: put fresh (blocked)")
    puts = [None]
    timed_loop(lambda i: puts.__setitem__(
        0, {k: jnp.asarray(v) for k, v in pre[i % 6].items()}),
        "loop: put fresh (async)",
        sync=lambda: jax.block_until_ready(puts[0]))

    def step_body(i):
        nonlocal variables, opt_state
        variables, opt_state, ls[0] = eng.train_step_donated(
            variables, opt_state, dev, key, lr, jnp.int32(i))
    ls = [None]
    timed_loop(step_body, "loop: step resident (synced)",
               sync=lambda: float(ls[0].total))

    def putstep_body(i):
        nonlocal variables, opt_state
        d = {k: jnp.asarray(v) for k, v in pre[i % 6].items()}
        variables, opt_state, ls[0] = eng.train_step_donated(
            variables, opt_state, d, key, lr, jnp.int32(i))
    timed_loop(putstep_body, "loop: put + step (synced)",
               sync=lambda: float(ls[0].total))

    # --- end-to-end loop variants ---
    def loop(layer_obj, label):
        nonlocal variables, opt_state
        last = None
        # warm
        variables, opt_state, last = eng.train_step_donated(
            variables, opt_state,
            {k: jnp.asarray(v) for k, v in layer_obj.forward().items()},
            key, lr, jnp.int32(0))
        float(last.total)
        t0 = time.perf_counter()
        for i in range(args.iters):
            blobs = layer_obj.forward()
            dev = {k: jnp.asarray(v) for k, v in blobs.items()}
            variables, opt_state, last = eng.train_step_donated(
                variables, opt_state, dev, key, lr, jnp.int32(i))
        float(last.total)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {label:<28s} {dt * 1e3:9.1f} ms  ({1.0 / dt:.1f} it/s)")
        return dt

    loop(layer, "e2e loop, no prefetch")
    pf = Prefetcher(RoIDataLayerJoint(roidb, roidb, "VGGnet_train", cfg,
                                      canvas, rng=np.random.RandomState(3)))
    loop(pf, "e2e loop, prefetch depth 2")
    pf.close()


if __name__ == "__main__":
    main()
