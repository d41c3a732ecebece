"""Native host components (C++), loaded via ctypes.

Compiled on first use into the package directory (g++ -O3 -march=native);
callers fall back to scipy when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _compile() -> Path | None:
    so = _HERE / "libwildmvs_native.so"
    src = _HERE / "kdtree.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-march=native", str(src), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import sys
        print(f"wildmvs.cpp: native build failed ({e}); using scipy fallback",
              file=sys.stderr)
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        so = _compile()
        if so is None:
            _LIB_FAILED = True
            return None
        lib = ctypes.CDLL(str(so))
        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.kdtree_free.argtypes = [ctypes.c_void_p]
        lib.kdtree_nn.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_double,
                                  ctypes.c_void_p, ctypes.c_int]
        lib.kdtree_radius_dedup.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
        return _LIB


class NativeKDTree:
    """3D KD-tree over [N, 3] float64 points (native C++)."""

    def __init__(self, points: np.ndarray):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._pts = np.ascontiguousarray(points, dtype=np.float64)
        self._handle = lib.kdtree_build(
            self._pts.ctypes.data_as(ctypes.c_void_p), self._pts.shape[0])

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.kdtree_free(self._handle)
            self._handle = None

    def nn_distance(self, queries: np.ndarray, maxdist: float = np.inf,
                    threads: int = 8) -> np.ndarray:
        """NN distance per query, clipped at maxdist (like cKDTree.query
        with distance_upper_bound, but returning maxdist instead of inf)."""
        q = np.ascontiguousarray(queries, dtype=np.float64)
        out = np.empty(q.shape[0], np.float64)
        md = 1e30 if np.isinf(maxdist) else float(maxdist)
        self._lib.kdtree_nn(self._handle, q.ctypes.data_as(ctypes.c_void_p),
                            q.shape[0], md, out.ctypes.data_as(ctypes.c_void_p),
                            threads)
        return out


def radius_dedup(points: np.ndarray, radius: float,
                 order: np.ndarray) -> np.ndarray:
    """Random-order radius dedup -> keep mask (bool[N])."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    order = np.ascontiguousarray(order, dtype=np.int64)
    keep = np.empty(pts.shape[0], np.uint8)
    lib.kdtree_radius_dedup(pts.ctypes.data_as(ctypes.c_void_p),
                            pts.shape[0], float(radius),
                            order.ctypes.data_as(ctypes.c_void_p),
                            keep.ctypes.data_as(ctypes.c_void_p))
    return keep.astype(bool)
