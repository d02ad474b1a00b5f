"""Native (C++) runtime pieces, loaded over ctypes.

Provides the scan IO / prefetching data-loader role the reference fills with
C++ (rosbag playback + PCL readers). Falls back to numpy implementations when
the shared library is absent; `python -m lv_slam_tpu.native.build` compiles
it (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

from lv_slam_tpu.native.build import LIBRARY, build

_lib = None


def _load(auto_build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(LIBRARY) and auto_build:
        try:
            build()
        except Exception:
            return None
    if not os.path.exists(LIBRARY):
        return None
    lib = ctypes.CDLL(LIBRARY)
    lib.lv_load_bin.restype = ctypes.c_long
    lib.lv_load_bin.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.lv_load_pcd.restype = ctypes.c_long
    lib.lv_load_pcd.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.lv_prefetch_open.restype = ctypes.c_void_p
    lib.lv_prefetch_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.lv_prefetch_next.restype = ctypes.c_long
    lib.lv_prefetch_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.lv_prefetch_close.restype = None
    lib.lv_prefetch_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_bin(path: str, max_points: int = 200_000) -> np.ndarray:
    """KITTI .bin -> (N,4) float32; native fast path, numpy fallback."""
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    buf = np.empty((max_points, 4), np.float32)
    n = lib.lv_load_bin(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_points
    )
    if n < 0:
        raise IOError(f"failed to read {path}")
    return buf[:n].copy()


def load_pcd(path: str, max_points: int = 2_000_000) -> np.ndarray:
    """Binary float32 PCD -> (N,3|4); native fast path, python fallback."""
    lib = _load()
    if lib is None:
        from lv_slam_tpu.io.pcd import read_pcd

        return read_pcd(path)
    buf = np.empty((max_points, 4), np.float32)
    fields = ctypes.c_int(0)
    n = lib.lv_load_pcd(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points, ctypes.byref(fields),
    )
    if n < 0:
        from lv_slam_tpu.io.pcd import read_pcd

        return read_pcd(path)
    return buf.reshape(-1)[: n * fields.value].reshape(n, fields.value).copy()


class ScanPrefetcher:
    """Background-threaded in-order scan loader (bounded ring).

    >>> with ScanPrefetcher(paths) as pf:
    ...     for scan in pf:  # (N,4) float32 arrays, file order
    ...         ...
    """

    def __init__(self, paths: Sequence[str], max_points: int = 200_000,
                 n_threads: int = 2, queue_depth: int = 4):
        self.paths = list(paths)
        self.max_points = max_points
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(*[p.encode() for p in self.paths])
            self._keepalive = arr
            self._handle = self._lib.lv_prefetch_open(
                arr, len(self.paths), max_points, n_threads, queue_depth
            )
        self._emitted = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._emitted >= len(self.paths):
            raise StopIteration
        self._emitted += 1
        if self._handle is None:  # fallback: synchronous numpy
            return np.fromfile(self.paths[self._emitted - 1], dtype=np.float32).reshape(-1, 4)
        buf = np.empty((self.max_points, 4), np.float32)
        n = self._lib.lv_prefetch_next(
            self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if n < 0:
            raise StopIteration
        return buf[:n].copy()

    def close(self):
        if self._handle is not None:
            self._lib.lv_prefetch_close(self._handle)
            self._handle = None
