"""Native C++ runtime bindings (ctypes, no pybind11).

Builds panovlm_tpu/native/libpvruntime.so on first use (g++ -O3 -shared).
Every entry point has a numpy fallback so the framework still works if the
toolchain is unavailable; io/pointcloud.py routes through here when built.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("panovlm")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pvruntime.cpp")
_LIB = os.path.join(_HERE, "libpvruntime.so")

_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the native library. Returns True on success."""
    if os.path.exists(_LIB) and not force and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=240)
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        log.warning("native build failed: %s", e)
        return False


def get():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not build():
        return None
    lib = ctypes.CDLL(_LIB)
    lib.pv_read_pcd.restype = ctypes.c_long
    lib.pv_read_pcd.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                ctypes.POINTER(ctypes.c_int)]
    lib.pv_read_ply.restype = ctypes.c_long
    lib.pv_read_ply.argtypes = lib.pv_read_pcd.argtypes
    lib.pv_write_pcd.restype = ctypes.c_int
    lib.pv_write_pcd.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_void_p, ctypes.c_long, ctypes.c_int]
    lib.pv_free.argtypes = [ctypes.c_void_p]
    lib.pv_depth_quantize.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_long, ctypes.c_float]
    lib.pv_depth_dequantize.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_long, ctypes.c_float]
    lib.pv_prefetch_create.restype = ctypes.c_void_p
    lib.pv_prefetch_create.argtypes = [ctypes.c_int]
    lib.pv_prefetch_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_long]
    lib.pv_prefetch_poll.restype = ctypes.c_long
    lib.pv_prefetch_poll.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                     ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_int)]
    lib.pv_prefetch_pending.restype = ctypes.c_int
    lib.pv_prefetch_pending.argtypes = [ctypes.c_void_p]
    lib.pv_prefetch_destroy.argtypes = [ctypes.c_void_p]
    lib.pv_sector_picks.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.pv_grow_lines.restype = ctypes.c_int
    lib.pv_grow_lines.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_void_p]
    _lib = lib
    return _lib


def _take_array(lib, data_ptr, rows, cols):
    buf = np.ctypeslib.as_array(data_ptr, shape=(rows, cols)).copy()
    lib.pv_free(data_ptr)
    return buf


def read_cloud_native(path: str):
    """Read pcd/ply via the native reader; None if unavailable/failed."""
    lib = get()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    cols = ctypes.c_int()
    fn = lib.pv_read_ply if path.endswith(".ply") else lib.pv_read_pcd
    n = fn(path.encode(), ctypes.byref(data), ctypes.byref(cols))
    if n < 0:
        return None
    return _take_array(lib, data, n, cols.value)


def write_pcd_native(path: str, xyz: np.ndarray, intensity=None,
                     binary: bool = True) -> bool:
    lib = get()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(xyz, np.float32)
    inten = None if intensity is None else \
        np.ascontiguousarray(intensity, np.float32)
    rc = lib.pv_write_pcd(
        path.encode(), xyz.ctypes.data_as(ctypes.c_void_p),
        None if inten is None else inten.ctypes.data_as(ctypes.c_void_p),
        len(xyz), 1 if binary else 0)
    return rc == 0


def sector_picks(P, curv, edge_elig, flat_base, max_edge=30, max_flat=4):
    """Greedy sector picks + suppression walks (C++), or None if the
    native lib is unavailable. Used by bench.py's single-thread CPU
    baseline so the baseline runs reference-speed sequential code."""
    lib = get()
    if lib is None:
        return None
    n = len(curv)
    P = np.ascontiguousarray(P, np.float32)
    curv = np.ascontiguousarray(curv, np.float32)
    ee = np.ascontiguousarray(edge_elig, np.uint8)
    fb = np.ascontiguousarray(flat_base, np.uint8)
    picked = np.zeros(n, np.uint8)
    fpicked = np.zeros(n, np.uint8)
    disabled = np.zeros(n, np.uint8)
    lib.pv_sector_picks(
        P.ctypes.data_as(ctypes.c_void_p), curv.ctypes.data_as(ctypes.c_void_p),
        ee.ctypes.data_as(ctypes.c_void_p), fb.ctypes.data_as(ctypes.c_void_p),
        n, max_edge, max_flat,
        picked.ctypes.data_as(ctypes.c_void_p),
        fpicked.ctypes.data_as(ctypes.c_void_p),
        disabled.ctypes.data_as(ctypes.c_void_p))
    return picked.astype(bool), fpicked.astype(bool), disabled.astype(bool)


def grow_lines(E, max_lines=64, knn_radius=2.0, inlier_dist=0.05,
               run_gap=0.5, min_len=0.3):
    """Seeded 3D line growth over edge points (C++), or None if the native
    lib is unavailable. Returns (seg_label int64 array, n_lines)."""
    lib = get()
    if lib is None:
        return None
    E = np.ascontiguousarray(E, np.float32)
    seg = np.empty(len(E), np.int64)
    n_lines = lib.pv_grow_lines(
        E.ctypes.data_as(ctypes.c_void_p), len(E), max_lines,
        knn_radius, inlier_dist, run_gap, min_len,
        seg.ctypes.data_as(ctypes.c_void_p))
    return seg, n_lines


class ScanPrefetcher:
    """Threaded file prefetch (replaces the reference's OpenMP load loops).

    Usage: pf = ScanPrefetcher(paths, n_threads=4); for arr in pf: ...
    Results come back in submission order.
    """

    def __init__(self, paths, n_threads: int = 4):
        self._lib = get()
        self._paths = list(paths)
        if self._lib is None:
            self._h = None
            return
        self._h = self._lib.pv_prefetch_create(n_threads)
        for i, p in enumerate(self._paths):
            self._lib.pv_prefetch_submit(self._h, str(p).encode(), i)

    def __iter__(self):
        import time
        if self._h is None:  # fallback: synchronous numpy reads
            from ..io import pointcloud
            for p in self._paths:
                yield pointcloud.load_cloud(p)
            return
        pending = {}
        next_id = 0
        n = len(self._paths)
        while next_id < n:
            if next_id in pending:
                yield pending.pop(next_id)
                next_id += 1
                continue
            data = ctypes.POINTER(ctypes.c_float)()
            rows = ctypes.c_long()
            cols = ctypes.c_int()
            got = self._lib.pv_prefetch_poll(self._h, ctypes.byref(data),
                                             ctypes.byref(rows), ctypes.byref(cols))
            if got < 0:
                time.sleep(0.002)
                continue
            arr = _take_array(self._lib, data, rows.value, cols.value) \
                if rows.value >= 0 else None
            pending[got] = arr

    def close(self):
        if self._h is not None:
            self._lib.pv_prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
