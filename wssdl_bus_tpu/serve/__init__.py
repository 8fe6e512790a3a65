"""Deployment: serialize the compiled inference program to a portable
serving artifact.

TPU-native serving story (no reference analog — the reference "deploys" by
re-running its TF1 graph builder against a ``.ckpt``,
``/root/reference/code/main/test.py:40-74``): the jitted inference step is
exported to StableHLO with :mod:`jax.export`, and the weights plus the full
config ride alongside, so a serving process restores the bundle WITHOUT the
model-building code (flax modules, the detector factory, optimizer/training
machinery) — just ``jax`` and this module.

Artifact layout (a directory)::

    meta.json           net name, canvas, batch sizes, platform, flat config
    variables.msgpack   model variables (params + batch_stats), flax msgpack
    infer_b{B}.shlo     serialized StableHLO of the inference step, one per
                        exported batch size B

The loaded :class:`ServingModel` duck-types the Engine serving surface
(``.cfg`` / ``.canvas_hw`` / ``.inference_step``), so every host-side
serving helper in :mod:`wssdl_bus_tpu.evaluate.detect` (``im_detect``,
``im_detect_batch``, the NMS stack) works on it unchanged.

Platform note: the hot ops pick their TPU (Pallas) or portable (pure-XLA)
lowering from ``jax.default_backend()`` at trace time, so an artifact is
exported FOR the platform of the exporting process and :mod:`jax.export`
refuses to run it elsewhere — export on (a host attached to) the hardware
you serve on.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from wssdl_bus_tpu.config import Config

_META = "meta.json"
_VARS = "variables.msgpack"
_FORMAT = 1


def _flat_config(cfg: Config) -> dict:
    """Config -> {dotted key: plain value} covering every field."""
    from wssdl_bus_tpu.config import _flatten

    flat = []
    _flatten(dataclasses.asdict(cfg), "", flat)
    return {k: v for k, v in flat}


def _config_from_flat(flat: dict) -> Config:
    cfg = Config()
    for k, v in flat.items():
        cfg = cfg._set_dotted(k, v)
    return cfg


def export_serving(eng, variables, out_dir: str, net_name: str,
                   batch_sizes=(1,), calib_batches=None) -> dict:
    """Export ``eng``'s inference step at each batch size into ``out_dir``.

    ``eng`` must be a single-device :class:`~wssdl_bus_tpu.train.engine.
    Engine`; a meshed ``ParallelEngine`` serves through its own shard_map
    path and is not exportable as a portable single-program artifact.
    Returns the metadata dict (also written to ``meta.json``).

    With ``calib_batches`` (an iterable of preprocessed [B, H, W, 3]
    serving inputs) the artifact is **int8-quantized**: the trunk is
    post-training-quantized against those activation ranges
    (models/quantize.py) and the exported program is the quantized
    inference step.  The shipped variables are then ``{"qtrunk", "head"}``
    for VGG (the fc head stays f32) and just ``{"qtrunk"}`` for ResNet
    (its quantized group3 head + fc live inside the qtrunk pytree) — no
    float copy of any quantized part, ~4x smaller weights.  The restored
    :class:`ServingModel` surface is identical either way.
    """
    import jax
    from jax import export as jexport

    from wssdl_bus_tpu.parallel.engine import ParallelEngine
    from wssdl_bus_tpu.train.engine import Engine

    if isinstance(eng, ParallelEngine):
        raise NotImplementedError(
            "export_serving takes a single-device Engine; build one with "
            "mesh_data=mesh_model=1 for export")
    assert isinstance(eng, Engine)

    os.makedirs(out_dir, exist_ok=True)
    h, w = eng.canvas_hw
    if calib_batches is not None:
        qtrunk = eng.quantize_for_serving(variables, calib_batches)
        if eng.model.backbone == "VGGnet":
            ship = {"qtrunk": qtrunk, "head": variables["head"]}
            step = jax.jit(lambda v, d, i: eng._inference_quant_impl(
                v["qtrunk"], v["head"], d, i))
        else:
            # ResNet qtrunk already holds the quantized group3 head + fc;
            # _inference_quant_impl never reads head_vars on this branch,
            # so shipping the float head would be a dead ~2x weight copy
            ship = {"qtrunk": qtrunk}
            step = jax.jit(lambda v, d, i: eng._inference_quant_impl(
                v["qtrunk"], None, d, i))
    else:
        ship = variables
        step = jax.jit(lambda v, d, i: eng._inference_impl(v, d, i))
    # one device->host fetch, reused for the shape specs and the msgpack
    host_vars = jax.tree.map(np.asarray, ship)
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_vars)
    for b in batch_sizes:
        exp = jexport.export(step)(
            var_spec,
            jax.ShapeDtypeStruct((int(b), h, w, 3), np.float32),
            jax.ShapeDtypeStruct((int(b), 4), np.float32))
        with open(os.path.join(out_dir, f"infer_b{int(b)}.shlo"), "wb") as f:
            f.write(exp.serialize())

    from flax import serialization
    with open(os.path.join(out_dir, _VARS), "wb") as f:
        f.write(serialization.msgpack_serialize(host_vars))

    meta = {
        "format": _FORMAT,
        "net_name": net_name,
        "backbone": eng.model.backbone,
        "num_classes": eng.model.num_classes,
        "canvas_hw": [int(h), int(w)],
        "batch_sizes": sorted(int(b) for b in batch_sizes),
        "platform": jax.default_backend(),
        "jax_version": jax.__version__,
        "quantized": calib_batches is not None,
        "config": _flat_config(eng.cfg),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return meta


class ServingModel:
    """A restored serving artifact.

    Duck-types the Engine serving surface used by
    :mod:`wssdl_bus_tpu.evaluate.detect`: ``.cfg``, ``.canvas_hw`` and
    ``.inference_step(variables, data, im_info)`` (which dispatches to the
    exported program matching ``data.shape[0]``).
    """

    def __init__(self, path: str, meta: dict, variables):
        self.path = path
        self.meta = meta
        self.cfg = _config_from_flat(meta["config"])
        self.canvas_hw = tuple(meta["canvas_hw"])
        self.net_name = meta["net_name"]
        self.batch_sizes = list(meta["batch_sizes"])
        self.variables = variables
        self._programs = {}

    def _program(self, b: int):
        if b not in self._programs:
            if b not in self.batch_sizes:
                raise ValueError(
                    f"no exported program for batch size {b}; artifact has "
                    f"{self.batch_sizes} (use detect(), which pads, or "
                    f"re-export with this batch size)")
            import jax
            from jax import export as jexport

            from wssdl_bus_tpu.utils.tpu_opts import serving_compiler_options
            with open(os.path.join(self.path, f"infer_b{b}.shlo"),
                      "rb") as f:
                exported = jexport.deserialize(f.read())
            # compile the restored program with the measured serving
            # options (utils/tpu_opts.py; StableHLO carries no compiler
            # options — they apply at compile time, i.e. HERE)
            self._programs[b] = jax.jit(
                exported.call, compiler_options=serving_compiler_options())
        return self._programs[b]

    def inference_step(self, variables, data, im_info):
        return self._program(int(np.shape(data)[0]))(
            variables, data, im_info)

    # ------------------------------------------------------------------ #
    def detect(self, images):
        """Serve a list of raw numpy images -> list of ``(scores [N, C],
        pred_boxes [N, 4C])`` in original image coordinates (the
        ``im_detect_batch`` contract).  Packs into the smallest exported
        batch size >= len(images), padding with blank canvas slots."""
        from wssdl_bus_tpu.evaluate.detect import (_decode_packed,
                                                   pack_image_batch)

        n = len(images)
        fits = [b for b in self.batch_sizes if b >= n]
        if not fits:
            raise ValueError(
                f"{n} images exceed the largest exported batch size "
                f"{max(self.batch_sizes)}; split the request or re-export")
        b = min(fits)
        blob, infos, scales = pack_image_batch(self, images, self.net_name,
                                               self.canvas_hw)
        if b > n:
            pad_blob = np.zeros((b, *self.canvas_hw, 3), np.float32)
            pad_blob[:n] = blob
            pad_infos = np.tile(
                np.array([[self.canvas_hw[0], self.canvas_hw[1], 1.0, 0.0]],
                         np.float32), (b, 1))
            pad_infos[:n] = infos
            blob, infos = pad_blob, pad_infos
        outs = self.inference_step(self.variables, blob, infos)
        p = self.cfg.TEST.RPN_POST_NMS_TOP_N
        outs = [np.asarray(o).reshape(b, p, -1)[:n].reshape(n * p, -1)
                for o in outs]
        outs[1] = outs[1].reshape(-1)  # valid mask is flat [n*p]
        return _decode_packed(self, images, scales, outs)


from wssdl_bus_tpu.data.dataset import CLASSES as CLASS_NAMES  # noqa: E402


def report_detections(scores, boxes, cfg, thresh: float = 0.5,
                      class_names=CLASS_NAMES) -> "tuple[list, dict]":
    """(scores [N, C], pred_boxes [N, 4C]) -> ``(entries, kept)``: sorted
    report entries ``{"class", "score", "box"}`` plus the per-class
    ``{class_index: [n, 5]}`` arrays behind them (for overlays), applying
    the reference detection post-processing (0.05 score floor + per-class
    NMS + optional class-agnostic second pass, test_bus.py:359-386) and
    then the caller's report threshold.  Shared by the predict CLI and the
    HTTP server so their outputs cannot drift."""
    from wssdl_bus_tpu.evaluate.detect import apply_nms_per_class

    dets = apply_nms_per_class(scores, boxes, len(class_names), 0.05,
                               cfg.TEST.NMS,
                               cls_agnostic=cfg.TEST.CLS_AGNOSTIC_NMS)
    kept = {j: dets[j][dets[j][:, 4] >= thresh]
            for j in range(1, len(class_names))}
    out = []
    for j in range(1, len(class_names)):
        for x1, y1, x2, y2, s in kept[j]:
            out.append({"class": class_names[j], "score": float(s),
                        "box": [float(x1), float(y1), float(x2),
                                float(y2)]})
    out.sort(key=lambda d: -d["score"])
    return out, kept


def load_serving(path: str) -> ServingModel:
    """Restore a :func:`export_serving` artifact directory."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if meta.get("format") != _FORMAT:
        raise ValueError(f"unknown serving artifact format: {meta.get('format')}")
    from flax import serialization
    with open(os.path.join(path, _VARS), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    return ServingModel(path, meta, variables)
