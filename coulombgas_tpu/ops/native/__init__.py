"""Native (C++) host-side components, loaded via ctypes.

Build happens lazily on first use with g++ (-O3 -shared -fPIC); every native
entry point has a pure-Python fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["enumerate_subsets", "native_available"]

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "manybody.cpp")
_SO = os.path.join(_HERE, "_manybody.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.cg_enumerate_subsets.restype = ctypes.c_int64
            lib.cg_enumerate_subsets.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def enumerate_subsets(Es: np.ndarray, n: int, Emax_total: int) -> np.ndarray | None:
    """All strictly-increasing n-subsets of [0, M) with sum(Es[subset]) <= cutoff.

    Returns an (n_states, n) int64 array (unsorted in energy), or None when
    the native library is unavailable (callers fall back to Python).
    """
    lib = _load()
    if lib is None:
        return None
    Es = np.ascontiguousarray(Es, dtype=np.int64)
    M = Es.size
    ptr = Es.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    count = lib.cg_enumerate_subsets(ptr, M, n, Emax_total, None, 0)
    out = np.empty((count, n), dtype=np.int64)
    filled = lib.cg_enumerate_subsets(
        ptr, M, n, Emax_total, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), count
    )
    assert filled == count, "native enumeration count mismatch"
    return out
