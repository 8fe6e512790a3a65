"""The on-TPU evidence suite: every hardware claim a CPU lane cannot
check, re-runnable against HEAD with one command (see conftest.py).

Wraps the recorded-run tools (tools/overfit_regression.py,
check_dispatch_parity_tpu.py, check_quant_tpu.py, check_export_tpu.py,
check_pallas_tpu.py) and adds the serving accuracy halves for the
recommended quantized/bf16 configs (r04 review, Missing #3): every
recommended throughput number gets its AP/CorLoc delta measured on a
trained snapshot, through the full VOC eval pipeline
(reference metric surface: /root/reference/code/lib/datasets/bus.py:263-392).
"""

import os
import subprocess
import sys

import pytest

from tests.tpu.conftest import CANVAS_CFGS, EVIDENCE_DIR, REPO

# pinned floors from tools/overfit_regression.py's recorded run
FLOOR = 0.5
# the quantization/precision accuracy contract on the overfit snapshot:
# the recommended serving configs must not destroy the end metrics the
# f32 model reaches (recorded deltas live in accuracy_deltas.txt and the
# README perf table)
DELTA_FLOOR = -0.25


def _tool(name, *args):
    p = subprocess.run([sys.executable, os.path.join(REPO, "tools", name),
                        *args], cwd=REPO, capture_output=True, text=True)
    return p


# ------------------------------------------------------------------ #
# whole-system learning regression (the only artifact that catches it)
# ------------------------------------------------------------------ #
def test_overfit_regression_vgg(vgg_snapshot):
    _, mean_ap, corloc = vgg_snapshot
    assert mean_ap >= FLOOR, f"LEARNING REGRESSION: Mean AP {mean_ap}"
    assert corloc >= FLOOR, f"LEARNING REGRESSION: CorLoc {corloc}"


def test_overfit_regression_r18(r18_snapshot):
    _, mean_ap, corloc = r18_snapshot
    assert mean_ap >= FLOOR and corloc >= FLOOR, (mean_ap, corloc)


def test_overfit_regression_r50(r50_snapshot):
    _, mean_ap, corloc = r50_snapshot
    assert mean_ap >= FLOOR and corloc >= FLOOR, (mean_ap, corloc)


# ------------------------------------------------------------------ #
# stem-dispatch detection parity (recorded r04 verdict: primary
# detections agree, one secondary mode diverges -> kernel stays opt-in)
# ------------------------------------------------------------------ #
def test_dispatch_parity(vgg_snapshot):
    ckpt, _, _ = vgg_snapshot
    p = _tool("check_dispatch_parity_tpu.py", "--model", ckpt)
    out = p.stdout + p.stderr
    if p.returncode == 0:
        return  # full parity — would support re-promoting the kernel
    if "0-only detection score" in out or "1-only detection score" in out:
        pytest.xfail(
            "recorded r04 partial parity failure reproduced (secondary-"
            "detection divergence keeps WSSDL_STEM_TAIL opt-in): "
            + out.splitlines()[-2])
    pytest.fail(f"dispatch parity failed in an UNRECORDED way:\n{out[-3000:]}")


# ------------------------------------------------------------------ #
# kernel / quant / export spot checks (Mosaic lowering + int arithmetic
# + StableHLO round trip on real hardware)
# ------------------------------------------------------------------ #
@pytest.mark.parametrize("tool", ["check_pallas_tpu.py",
                                  "check_quant_tpu.py",
                                  "check_export_tpu.py"])
def test_spot_check(tpu, tool):
    p = _tool(tool)
    assert p.returncode == 0, f"{tool} failed:\n{(p.stdout + p.stderr)[-3000:]}"


# ------------------------------------------------------------------ #
# accuracy halves of the recommended serving configs (r04 Missing #3)
# ------------------------------------------------------------------ #
def _record_delta(tag, f32_ap, f32_cl, ap, cl):
    line = (f"{tag}: mean_ap {ap:.4f} (f32 {f32_ap:.4f}, d{ap - f32_ap:+.4f}) "
            f"corloc {cl:.4f} (f32 {f32_cl:.4f}, d{cl - f32_cl:+.4f})")
    print(line)
    with open(os.path.join(EVIDENCE_DIR, "accuracy_deltas.txt"), "a") as f:
        f.write(line + "\n")


def _eval_variant(ckpt, out_tag, network, net_depth, extra):
    from overfit_regression import run_eval
    return run_eval(ckpt, os.path.join(EVIDENCE_DIR, out_tag),
                    set_cfgs=CANVAS_CFGS, network=network,
                    net_depth=net_depth, extra_args=extra)


def test_accuracy_vgg_int8(vgg_snapshot):
    ckpt, f32_ap, f32_cl = vgg_snapshot
    ap, cl = _eval_variant(ckpt, "vgg_int8_eval", "VGGnet_test", 18,
                           ["--int8"])
    _record_delta("vgg16_int8", f32_ap, f32_cl, ap, cl)
    assert ap - f32_ap >= DELTA_FLOOR and cl - f32_cl >= DELTA_FLOOR


def test_accuracy_r18_int8(r18_snapshot):
    ckpt, f32_ap, f32_cl = r18_snapshot
    ap, cl = _eval_variant(ckpt, "r18_int8_eval", "Resnet_test", 18,
                           ["--int8"])
    _record_delta("resnet18_int8", f32_ap, f32_cl, ap, cl)
    assert ap - f32_ap >= DELTA_FLOOR and cl - f32_cl >= DELTA_FLOOR


def test_accuracy_r50_bf16(r50_snapshot):
    ckpt, f32_ap, f32_cl = r50_snapshot
    ap, cl = _eval_variant(ckpt, "r50_bf16_eval", "Resnet_test", 50,
                           ["--bf16"])
    _record_delta("resnet50_bf16", f32_ap, f32_cl, ap, cl)
    assert ap - f32_ap >= DELTA_FLOOR and cl - f32_cl >= DELTA_FLOOR
