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
_HAS_IMAGE = False  # true when the libjpeg/libpng image module linked


def _compile() -> tuple[Path | None, bool]:
    """Build the native library. Returns (path, has_image_module).

    The image module (image.cpp) needs libjpeg + libpng dev files; when they
    are absent we fall back to a kdtree-only build so the 3D-metrics path
    keeps its native speed regardless.
    """
    so = _HERE / "libwildmvs_native.so"
    srcs = [_HERE / "kdtree.cpp", _HERE / "image.cpp"]
    stamp = _HERE / ".native_build"  # records which variant the .so holds
    if so.exists() and stamp.exists() and all(
            so.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return so, stamp.read_text().strip() == "full"
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            "-march=native"]
    # compile to a per-process temp path, then atomically publish, so a
    # concurrent/interrupted build can never leave a truncated .so behind
    tmp = so.with_suffix(f".{os.getpid()}.tmp.so")
    try:
        subprocess.run(base + [str(s) for s in srcs]
                       + ["-o", str(tmp), "-ljpeg", "-lpng"],
                       check=True, capture_output=True)
        os.replace(tmp, so)
        stamp.write_text("full")
        return so, True
    except (subprocess.CalledProcessError, FileNotFoundError):
        pass
    try:
        subprocess.run(base + [str(srcs[0]), "-o", str(tmp)],
                       check=True, capture_output=True)
        os.replace(tmp, so)
        stamp.write_text("kdtree")
        return so, False
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import sys
        print(f"wildmvs.cpp: native build failed ({e}); using scipy fallback",
              file=sys.stderr)
        return None, False
    finally:
        try:
            tmp.unlink()
        except OSError:
            pass


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _LIB_FAILED, _HAS_IMAGE
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        so, has_image = _compile()
        if so is None:
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            # Corrupt/truncated .so (e.g. a concurrently-interrupted build):
            # drop the artifacts so the next process rebuilds, and fall back
            # to scipy/PIL for this one rather than crash the callers.
            import sys
            print("wildmvs.cpp: failed to load native library; rebuilding "
                  "next run, using scipy/PIL fallback", file=sys.stderr)
            for p in (so, _HERE / ".native_build"):
                try:
                    p.unlink()
                except OSError:
                    pass
            _LIB_FAILED = True
            return None
        _HAS_IMAGE = has_image
        if has_image:
            lib.wmvs_load_batch.restype = ctypes.c_int
            lib.wmvs_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int]
            lib.wmvs_resize_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            lib.wmvs_free.argtypes = [ctypes.c_void_p]
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


def has_image_module() -> bool:
    """True when the native JPEG/PNG decode + Lanczos resize module linked."""
    return get_lib() is not None and _HAS_IMAGE


def load_images(paths, resize_to: tuple | None = None, threads: int = 0):
    """Decode n images in parallel (native pool), optional min-side-fit
    LANCZOS resize exactly as `data.loaders.read_image` defines it.

    Returns list of (img float32 [H,W,3]|[H,W] in [0,1], ratio) — ratio is
    original/resized. Raises RuntimeError if the image module is unavailable
    or any file fails to decode (caller falls back to PIL).
    """
    if not has_image_module():
        raise RuntimeError("native image module unavailable")
    lib = get_lib()
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    out_data = (ctypes.c_void_p * n)()
    out_h = (ctypes.c_int * n)()
    out_w = (ctypes.c_int * n)()
    out_c = (ctypes.c_int * n)()
    out_r = (ctypes.c_float * n)()
    th, tw = (0, 0) if resize_to is None else (int(resize_to[0]),
                                               int(resize_to[1]))
    ok = lib.wmvs_load_batch(c_paths, n, th, tw, out_data, out_h, out_w,
                             out_c, out_r, threads)
    results = []
    try:
        if ok != n:
            bad = [str(paths[i]) for i in range(n) if not out_data[i]]
            raise RuntimeError(f"native decode failed for {bad}")
        for i in range(n):
            h, w, c = out_h[i], out_w[i], out_c[i]
            buf = ctypes.cast(out_data[i],
                              ctypes.POINTER(ctypes.c_float * (h * w * c)))
            img = np.frombuffer(buf.contents, np.float32).reshape(h, w, c)
            if c == 1:  # match np.asarray(PIL gray) -> [H, W]
                img = img[..., 0]
            results.append((img.copy(), float(out_r[i])))
    finally:
        for i in range(n):
            if out_data[i]:
                lib.wmvs_free(out_data[i])
    return results


def resize_lanczos(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Native separable Lanczos-3 resize of float32 [H, W, C] (PIL box
    semantics, no clamping)."""
    if not has_image_module():
        raise RuntimeError("native image module unavailable")
    lib = get_lib()
    src = np.ascontiguousarray(img, dtype=np.float32)
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    h, w, c = src.shape
    dst = np.empty((out_h, out_w, c), np.float32)
    lib.wmvs_resize_f32(src.ctypes.data_as(ctypes.c_void_p), h, w, c,
                        out_h, out_w, dst.ctypes.data_as(ctypes.c_void_p))
    return dst[..., 0] if squeeze else dst
