"""ctypes bindings for native/diffcloth_native.cpp.

API mirrors geometry/objio.py (load_obj/save_obj) plus the scene
preprocessing hooks (extract_bending_pairs, conn_table) used by
geometry/builder.py.  Import raises if the toolchain/build is unavailable;
callers treat this module as an optional fast path.
"""
from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from diffcloth_tpu.native import _ensure_built

_lib = ctypes.CDLL(_ensure_built())

_lib.dc_load_obj.restype = ctypes.c_int
_lib.dc_load_obj.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
    ctypes.POINTER(ctypes.c_int64)]
_lib.dc_save_obj.restype = ctypes.c_int
_lib.dc_save_obj.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
_lib.dc_extract_bending_pairs.restype = ctypes.c_int
_lib.dc_extract_bending_pairs.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
    ctypes.POINTER(ctypes.c_int64)]
_lib.dc_conn_table.restype = ctypes.c_int
_lib.dc_conn_table.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_uint8)]
_lib.dc_free.restype = None
_lib.dc_free.argtypes = [ctypes.c_void_p]


def _take_f64(ptr, count) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
    _lib.dc_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr


def _take_i32(ptr, count) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
    _lib.dc_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    vp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = _lib.dc_load_obj(path.encode(), ctypes.byref(vp), ctypes.byref(nv),
                          ctypes.byref(tp), ctypes.byref(nt))
    if rc != 0:
        raise IOError(f"dc_load_obj({path}) failed rc={rc}")
    verts = _take_f64(vp, 3 * nv.value).reshape(-1, 3)
    tris = _take_i32(tp, 3 * nt.value).reshape(-1, 3)
    return verts, tris


def save_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    v = np.ascontiguousarray(verts, np.float64).reshape(-1, 3)
    t = np.ascontiguousarray(tris, np.int32).reshape(-1, 3)
    rc = _lib.dc_save_obj(
        path.encode(), v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        v.shape[0], t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t.shape[0])
    if rc != 0:
        raise IOError(f"dc_save_obj({path}) failed rc={rc}")


def extract_bending_pairs(tris: np.ndarray) -> np.ndarray:
    t = np.ascontiguousarray(tris, np.int32).reshape(-1, 3)
    qp = ctypes.POINTER(ctypes.c_int32)()
    nq = ctypes.c_int64()
    rc = _lib.dc_extract_bending_pairs(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), t.shape[0],
        ctypes.byref(qp), ctypes.byref(nq))
    if rc != 0:
        raise ValueError(f"non-manifold mesh (rc={rc})")
    return _take_i32(qp, 4 * nq.value).reshape(-1, 4)


def conn_table(tris: np.ndarray, n: int) -> np.ndarray:
    t = np.ascontiguousarray(tris, np.int32).reshape(-1, 3)
    table = np.zeros((n, n), np.uint8)
    rc = _lib.dc_conn_table(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), t.shape[0], n,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"dc_conn_table failed rc={rc}")
    return table.astype(bool)
