"""On-hardware evidence lane (r04 review, Weak #6).

One documented command re-validates HEAD on the attached TPU:

    WSSDL_TPU_LANE=1 python -m pytest tests/tpu -q

Without ``WSSDL_TPU_LANE=1`` the top-level tests/conftest.py forces the
CPU backend (so the default lanes stay off the tunnel) and every test
here skips; with it, the ambient axon/TPU backend is left alone.

The expensive shared state — a trained overfit snapshot per backbone —
is produced ONCE per snapshot directory and reused across invocations:
the session fixtures look for an existing snapshot at the pinned iter
count under ``WSSDL_TPU_EVIDENCE_DIR`` (default /tmp/wssdl_tpu_evidence)
and train only if it is missing (``WSSDL_TPU_FRESH=1`` forces a
retrain).  Budget: a fresh VGG snapshot is ~2000 iters of real training
(tools/overfit_regression.py's recipe), minutes of device time plus
host-feed time; the quant/export/pallas spot checks are seconds each.

Tests are auto-marked ``tpu`` AND ``slow`` so no CPU lane ever selects
them by accident.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tools"))

EVIDENCE_DIR = os.environ.get("WSSDL_TPU_EVIDENCE_DIR",
                              "/tmp/wssdl_tpu_evidence")
# the serving-canvas pin from the recorded overfit run (608x816 canvas,
# within 2% of the 608x800 bench canvas; reuses persistent-cache programs)
CANVAS_CFGS = ["TRAIN.MAX_SIZE", "800", "TEST.MAX_SIZE", "800"]
# the recorded asserting recipe used 4000 iters (tools/overfit_regression
# docstring); with the r05 device-prep feed that is ~3-10 min of training
# per backbone on one v5e, so the lane defaults to the full recipe
VGG_ITERS = int(os.environ.get("WSSDL_TPU_OVERFIT_ITERS", "4000"))
RESNET_ITERS = int(os.environ.get("WSSDL_TPU_RESNET_ITERS", "4000"))


_HERE = os.path.dirname(os.path.abspath(__file__))


def pytest_collection_modifyitems(config, items):
    # NOTE: this hook sees the WHOLE session's items (pytest does not scope
    # it to this conftest's directory) — mark only tests that live here
    for item in items:
        if str(item.fspath).startswith(_HERE):
            item.add_marker(pytest.mark.tpu)
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def tpu():
    if os.environ.get("WSSDL_TPU_LANE") != "1":
        pytest.skip("TPU lane is opt-in: WSSDL_TPU_LANE=1 python -m "
                    "pytest tests/tpu -q")
    import jax
    if jax.devices()[0].platform != "tpu":
        pytest.skip(f"no TPU attached (platform: "
                    f"{jax.devices()[0].platform})")
    from wssdl_bus_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()
    return jax.devices()[0]


def _overfit_snapshot(network, net_depth, iters, subdir):
    """Train-or-reuse one overfit snapshot; -> (ckpt, mean_ap, corloc).

    Reuse only checks the pinned iter count in the snapshot name — the
    recipe is deterministic (seeded), so a snapshot at the right iters
    from ANY run of HEAD is the same snapshot.  The paired eval metrics
    are re-read from the fixture-written metrics file; a reused snapshot
    without one is re-evaluated."""
    from overfit_regression import run_eval, run_overfit

    out = os.path.join(EVIDENCE_DIR, subdir)
    # the snapshot prefix is cfg.TRAIN.SNAPSHOT_PREFIX (reference-parity
    # "VGGnet_fast_rcnn" for EVERY backbone, reference config.py) — match
    # on the iter suffix, not the prefix
    ckpt = os.path.join(out, f"VGGnet_fast_rcnn_iter_{iters}")
    metrics = os.path.join(out, "fixture_metrics.txt")
    if (os.path.isdir(ckpt) and os.path.exists(metrics)
            and os.environ.get("WSSDL_TPU_FRESH") != "1"):
        mean_ap, corloc = [float(x) for x in
                           open(metrics).read().split()]
        print(f"[tpu lane] reusing snapshot {ckpt} "
              f"(mean_ap={mean_ap}, corloc={corloc})")
        return ckpt, mean_ap, corloc
    if os.path.isdir(ckpt) and os.environ.get("WSSDL_TPU_FRESH") != "1":
        mean_ap, corloc = run_eval(
            ckpt, os.path.join(out, "final_eval"), set_cfgs=CANVAS_CFGS,
            network=network.replace("_train", "_test"), net_depth=net_depth)
    else:
        _, _, mean_ap, corloc = run_overfit(
            out, iters=iters, set_cfgs=CANVAS_CFGS, network=network,
            net_depth=net_depth)
    with open(metrics, "w") as f:
        f.write(f"{mean_ap} {corloc}")
    return ckpt, mean_ap, corloc


@pytest.fixture(scope="session")
def vgg_snapshot(tpu):
    """The pinned VGG overfit snapshot (+ its f32 eval metrics)."""
    return _overfit_snapshot("VGGnet_train", 18, VGG_ITERS, "vgg")


@pytest.fixture(scope="session")
def r18_snapshot(tpu):
    return _overfit_snapshot("Resnet_train", 18, RESNET_ITERS, "r18")


@pytest.fixture(scope="session")
def r50_snapshot(tpu):
    return _overfit_snapshot("Resnet_train", 50, RESNET_ITERS, "r50")
