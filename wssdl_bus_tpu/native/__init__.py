"""ctypes bindings for the native host-runtime kernels (native/*.cc).

Builds ``libwssdl_native.so`` on first import if missing (g++ via the
Makefile in ``native/``) and falls back to ``None`` handles when no compiler
is available — every caller keeps a pure-numpy fallback.

Native coverage (host paths only; device paths are jit/Pallas in ops/):
  * ``nms``               — greedy IoU NMS (reference cpu_nms.pyx:17-68)
  * ``bbox_overlaps``     — dense IoU matrix (bbox.pyx:15-55)
  * ``bbox_overlaps_ui``  — unidirectional overlaps (bbox_ui.pyx:12-47)
  * ``resize_bilinear`` / ``rotate_bilinear`` / ``brightness_contrast``
                          — the data-loader augmentation hot loops
                            (utils/blob.py:34-79)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwssdl_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_lock = threading.Lock()


def _float_p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    """First-use build + dlopen, serialized: concurrent first calls from
    prefetch threads must not race `make` against a partially written .so."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.wssdl_nms.restype = ctypes.c_int
    lib.wssdl_nms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                              ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
    for name in ("wssdl_bbox_overlaps", "wssdl_bbox_overlaps_ui"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                       ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                       ctypes.POINTER(ctypes.c_float)]
    lib.wssdl_resize_bilinear.restype = None
    lib.wssdl_resize_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    lib.wssdl_rotate_bilinear.restype = None
    lib.wssdl_rotate_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
    lib.wssdl_brightness_contrast.restype = None
    lib.wssdl_brightness_contrast.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def nms(dets: np.ndarray, thresh: float) -> Optional[list]:
    """Greedy NMS over score-desc-sorted dets [n,5]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float32)
    keep = np.empty((len(dets),), np.int32)
    n = lib.wssdl_nms(_float_p(dets), len(dets), float(thresh),
                      keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].tolist()


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray,
                  unidirectional: bool = False) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.empty((len(boxes), len(query)), np.float32)
    fn = lib.wssdl_bbox_overlaps_ui if unidirectional \
        else lib.wssdl_bbox_overlaps
    fn(_float_p(boxes), len(boxes), _float_p(query), len(query),
       _float_p(out))
    return out


def resize_bilinear(im: np.ndarray, oh: int, ow: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    im = np.ascontiguousarray(im, np.float32)
    out = np.empty((oh, ow), np.float32)
    lib.wssdl_resize_bilinear(_float_p(im), im.shape[0], im.shape[1],
                              _float_p(out), oh, ow)
    return out


def rotate_bilinear(im: np.ndarray, degrees: float,
                    cval: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    im = np.ascontiguousarray(im, np.float32)
    out = np.empty_like(im)
    lib.wssdl_rotate_bilinear(_float_p(im), im.shape[0], im.shape[1],
                              float(degrees), float(cval), _float_p(out))
    return out


def brightness_contrast(im: np.ndarray, delta: float, factor: float,
                        apply_brightness: bool,
                        apply_contrast: bool) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    # unconditional copy: the kernel writes in place, and ascontiguousarray
    # aliases the input when it is already contiguous float32 — the caller's
    # array must never be mutated
    im = np.array(im, np.float32, copy=True, order="C")
    lib.wssdl_brightness_contrast(_float_p(im), im.size, float(delta),
                                  float(factor), int(apply_brightness),
                                  int(apply_contrast))
    return im
