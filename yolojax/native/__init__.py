"""Native (C++) host-path components, built on demand and loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; this package covers the *host* side
where the reference leans on torch's C++ (SURVEY.md §2.16): currently a
multithreaded exact greedy NMS used by CPU detection flows (BASELINE
config 1) and available to any host tooling.

The shared object is compiled once per machine with g++ into
``~/.cache/yolojax/`` (keyed by source hash); all call sites degrade to the
pure-JAX ops when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

__all__ = ["native_nms_available", "nms_native", "nms_native_batch"]

_LOG = logging.getLogger(__name__)
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "nms.cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha1(f.read()).hexdigest()[:12]
        cache = os.path.join(os.path.expanduser("~/.cache/yolojax"))
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"nms_{digest}.so")
        if not os.path.exists(so):
            cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                   "-fPIC", src, "-o", so + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so + ".tmp", so)
            _LOG.info("built native NMS: %s", so)
        lib = ctypes.CDLL(so)
        lib.nms_batch.restype = None
        lib.nms_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception as e:  # no compiler / unsupported platform
        _LOG.info("native NMS unavailable (%s); using JAX ops", e)
        _LIB = None
    return _LIB


def native_nms_available() -> bool:
    return _build_and_load() is not None


def nms_native_batch(boxes: np.ndarray, scores: np.ndarray, threshold: float,
                     overlap: float, max_out: int):
    """Batched exact greedy NMS on host.

    boxes (G, N, 4) [ymin,xmin,ymax,xmax] f32, scores (G, N) f32 →
    (idx (G, max_out) i32, conf (G, max_out) f32, count (G,) i32).
    Same picks as ops.nms.nms_select, problems parallel over OpenMP.
    """
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native NMS library unavailable")
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    g, n = scores.shape
    idx = np.zeros((g, max_out), np.int32)
    conf = np.zeros((g, max_out), np.float32)
    count = np.zeros((g,), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.nms_batch(boxes.ctypes.data_as(fp), scores.ctypes.data_as(fp),
                  g, n, threshold, overlap, max_out,
                  idx.ctypes.data_as(ip), conf.ctypes.data_as(fp),
                  count.ctypes.data_as(ip))
    return idx, conf, count


def nms_native(yx_min: np.ndarray, yx_max: np.ndarray, scores: np.ndarray,
               threshold: float, overlap: float, max_out: int):
    """Single-problem wrapper mirroring ops.nms.nms_select's return contract:
    (idx, conf, valid) each (max_out,)."""
    boxes = np.concatenate([yx_min, yx_max], axis=-1)[None]
    idx, conf, count = nms_native_batch(boxes, scores[None], threshold,
                                        overlap, max_out)
    valid = np.arange(max_out) < count[0]
    return idx[0], conf[0], valid
