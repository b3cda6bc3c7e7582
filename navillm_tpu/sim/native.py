"""ctypes bindings for the native navsim library, with lazy self-build.

Builds libnavsim.so from navsim.cpp on first use (g++ -O3, no external
deps). If a C++ toolchain is unavailable, callers fall back to the pure
NumPy implementations in graph.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "navsim.cpp"
_LIB = _HERE / "libnavsim.so"
_lock = threading.Lock()
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, text=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        lib = ctypes.CDLL(str(_LIB))
        c = ctypes
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.ns_scan_create.restype = c.c_int64
        lib.ns_scan_create.argtypes = [c.c_int32, c.c_int32, i32p, f64p]
        lib.ns_scan_distance.restype = c.c_double
        lib.ns_scan_distance.argtypes = [c.c_int64, c.c_int32, c.c_int32]
        lib.ns_scan_dist_matrix.restype = None
        lib.ns_scan_dist_matrix.argtypes = [c.c_int64, f64p]
        lib.ns_scan_path.restype = c.c_int32
        lib.ns_scan_path.argtypes = [c.c_int64, c.c_int32, c.c_int32, i32p, c.c_int32]
        lib.ns_scan_distances.restype = None
        lib.ns_scan_distances.argtypes = [c.c_int64, c.c_int32, i32p, i32p, f64p]

        lib.ep_create.restype = c.c_int64
        lib.ep_create.argtypes = [c.c_int32]
        lib.ep_free.restype = None
        lib.ep_free.argtypes = [c.c_int64]
        lib.ep_reset.restype = None
        lib.ep_reset.argtypes = [c.c_int64]
        lib.ep_add_edge.restype = None
        lib.ep_add_edge.argtypes = [c.c_int64, c.c_int32, c.c_int32, c.c_double]
        lib.ep_update.restype = None
        lib.ep_update.argtypes = [c.c_int64, c.c_int32]
        lib.ep_visited.restype = c.c_int32
        lib.ep_visited.argtypes = [c.c_int64, c.c_int32]
        lib.ep_distance.restype = c.c_double
        lib.ep_distance.argtypes = [c.c_int64, c.c_int32, c.c_int32]
        lib.ep_distances_from.restype = None
        lib.ep_distances_from.argtypes = [c.c_int64, c.c_int32, f64p]
        lib.ep_num_nodes.restype = c.c_int32
        lib.ep_num_nodes.argtypes = [c.c_int64]
        lib.ep_path.restype = c.c_int32
        lib.ep_path.argtypes = [c.c_int64, c.c_int32, c.c_int32, i32p, c.c_int32]
        lib.ep_pair_dists.restype = None
        lib.ep_pair_dists.argtypes = [c.c_int64, c.c_int32, i32p, f64p]
        lib.ep_dist_steps.restype = None
        lib.ep_dist_steps.argtypes = [c.c_int64, c.c_int32, c.c_int32, i32p,
                                      f64p, i32p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None
