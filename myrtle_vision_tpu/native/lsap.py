"""ctypes wrapper for the native C++ LSAP solver (native/lsap.cpp).

Builds on demand with g++ (cached as native/liblsap.so); callers fall back
to scipy when the toolchain is unavailable.  Solves rectangular problems
with rows >= cols by transposing (the solver wants rows <= cols), matching
scipy.optimize.linear_sum_assignment's (row_ind, col_ind) contract.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "liblsap.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "lsap.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
            ):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC",
                        "-o", _SO_PATH, _SRC_PATH,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.lsap_solve.restype = ctypes.c_int
            lib.lsap_solve.argtypes = [
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def solve(cost: np.ndarray):
    """scipy-compatible LSAP: returns (row_ind, col_ind), length
    min(n_rows, n_cols), row_ind sorted ascending."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native lsap unavailable")
    cost = np.ascontiguousarray(cost, np.float64)
    n_rows, n_cols = cost.shape
    transposed = n_rows > n_cols
    if transposed:
        cost = np.ascontiguousarray(cost.T)
        n_rows, n_cols = n_cols, n_rows
    out = np.zeros(n_rows, np.int32)
    rc = lib.lsap_solve(
        n_rows,
        n_cols,
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"lsap_solve failed rc={rc}")
    rows = np.arange(n_rows, dtype=np.int64)
    cols = out.astype(np.int64)
    if transposed:
        rows, cols = cols, rows
        order = np.argsort(rows)
        rows, cols = rows[order], cols[order]
    return rows, cols
