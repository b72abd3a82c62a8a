"""ctypes bindings for the native host library (native/rangedet_host.cpp) —
the framework's twin of the reference's pybind11 ``processing_cxx``
(operator_cxx/src_cxx/pybinding.cpp). Builds on demand via make; all consumers
gate on availability (the TPU paths never need it).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librangedet_host.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rd_assign_points.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p,
        ctypes.c_float, ctypes.c_float, i32p,
    ]
    lib.rd_points_per_box.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.rd_weighted_nms.restype = ctypes.c_int32
    lib.rd_weighted_nms.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, f32p, i32p,
    ]
    lib.rd_iou_bev_matrix.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def assign_points(
    pc: np.ndarray, corners8: np.ndarray, mask: np.ndarray,
    radius_sq: float = 100.0, max_dist_sq: float = 20.0,
) -> np.ndarray:
    lib = _load()
    pc = np.ascontiguousarray(pc, np.float32).reshape(-1, 3)
    corners8 = np.ascontiguousarray(corners8, np.float32).reshape(-1, 8, 3)
    mask = np.ascontiguousarray(mask, np.float32).reshape(-1)
    out = np.empty((pc.shape[0],), np.int32)
    lib.rd_assign_points(
        _fp(pc), pc.shape[0], _fp(corners8), corners8.shape[0], _fp(mask),
        radius_sq, max_dist_sq, _ip(out),
    )
    return out


def points_per_box(idx: np.ndarray, num_boxes: int) -> np.ndarray:
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int32).reshape(-1)
    out = np.empty((num_boxes,), np.float32)
    lib.rd_points_per_box(_ip(idx), idx.shape[0], num_boxes, _fp(out))
    return out


def weighted_nms(
    dets12: np.ndarray, thresh: float, thresh_vote: float,
    is_3d: bool = False, max_keep: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    dets12 = np.ascontiguousarray(dets12, np.float32).reshape(-1, 12)
    n = dets12.shape[0]
    max_keep = max_keep or n
    out = np.empty((max_keep, 12), np.float32)
    inds = np.empty((max_keep,), np.int32)
    k = lib.rd_weighted_nms(
        _fp(dets12), n, thresh, thresh_vote, int(is_3d), max_keep,
        _fp(out), _ip(inds),
    )
    return out[:k], inds[:k]


def iou_bev_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float32).reshape(-1, 8)
    b = np.ascontiguousarray(b, np.float32).reshape(-1, 8)
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    lib.rd_iou_bev_matrix(_fp(a), a.shape[0], _fp(b), b.shape[0], _fp(out))
    return out
