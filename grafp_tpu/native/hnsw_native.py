"""ctypes bindings for the first-party C++ HNSW (src/hnsw_native.cpp).

Same build pattern as wav_native: compiled with g++ on first use and
cached next to the source. The pure-Python HNSW in retrieval/hnsw.py is
the fallback (and the semantic reference) — it refuses past 100k rows;
this backend handles the reference protocol scale (fma_medium's 1.6M
segment rows, reference eval.py:90-98 via CPU FAISS there).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "hnsw_native.cpp")
_LIB_PATH = os.path.join(_DIR, "_hnsw_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

from grafp_tpu.native.wav_native import NativeUnavailable


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except (OSError, subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as e:
        raise NativeUnavailable(f"hnsw native build failed: {e}") from e


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        fp = ctypes.POINTER(ctypes.c_float)
        lp = ctypes.POINTER(ctypes.c_long)
        lib.hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_uint]
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_destroy.argtypes = [ctypes.c_void_p]
        lib.hnsw_ntotal.argtypes = [ctypes.c_void_p]
        lib.hnsw_ntotal.restype = ctypes.c_long
        lib.hnsw_add.argtypes = [ctypes.c_void_p, fp, ctypes.c_long]
        lib.hnsw_add.restype = ctypes.c_int
        lib.hnsw_search.argtypes = [ctypes.c_void_p, fp, ctypes.c_long,
                                    ctypes.c_int, ctypes.c_int, fp, lp]
        lib.hnsw_search.restype = ctypes.c_int
        lib.hnsw_reconstruct.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                         ctypes.c_long, fp]
        lib.hnsw_reconstruct.restype = ctypes.c_int
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


class HNSWNative:
    """Thin RAII wrapper over the C++ index."""

    def __init__(self, d: int, m: int = 16, ef_construction: int = 80,
                 seed: int = 0):
        self._lib = _load()
        self.d = int(d)
        self._h = self._lib.hnsw_create(self.d, int(m),
                                        int(ef_construction),
                                        ctypes.c_uint(seed))
        if not self._h:
            raise NativeUnavailable("hnsw_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.hnsw_destroy(h)
            self._h = None

    @property
    def ntotal(self) -> int:
        return int(self._lib.hnsw_ntotal(self._h))

    def add(self, data: np.ndarray) -> None:
        data = np.ascontiguousarray(data, np.float32)
        assert data.ndim == 2 and data.shape[1] == self.d, data.shape
        rc = self._lib.hnsw_add(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(data))
        if rc != 0:
            raise NativeUnavailable(f"hnsw_add -> {rc}")

    def search(self, q: np.ndarray, k: int, ef_search: int = 64
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(q, np.float32)
        assert q.ndim == 2 and q.shape[1] == self.d, q.shape
        out_d = np.empty((len(q), k), np.float32)
        out_i = np.empty((len(q), k), np.int64)
        rc = self._lib.hnsw_search(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(q), int(k), int(ef_search),
            out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        if rc != 0:
            raise NativeUnavailable(f"hnsw_search -> {rc}")
        return out_d, out_i

    def reconstruct_n(self, start: int, n: int) -> np.ndarray:
        out = np.empty((n, self.d), np.float32)
        rc = self._lib.hnsw_reconstruct(
            self._h, int(start), int(n),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise NativeUnavailable(f"hnsw_reconstruct -> {rc}")
        return out
