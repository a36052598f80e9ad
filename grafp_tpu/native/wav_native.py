"""ctypes bindings for the native audio ops (src/wav_native.cpp).

Builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-Python fallback in grafp_tpu/data,
so a missing compiler only costs speed, never correctness.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "wav_native.cpp")
_LIB_PATH = os.path.join(_DIR, "_wav_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        raise NativeUnavailable(f"native build failed: {e}") from e


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_read.restype = ctypes.c_int
        lib.wav_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.resample_sinc.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.resample_sinc.restype = ctypes.c_int
        _lib = lib
        return lib


def read(path: str) -> Tuple[np.ndarray, int]:
    """Decode a wav file -> ((T,) or (T, C) float32, sample_rate)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int()
    n_ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.wav_read(path.encode(), ctypes.byref(out),
                      ctypes.byref(n_frames), ctypes.byref(n_ch),
                      ctypes.byref(sr))
    if rc != 0:
        raise NativeUnavailable(f"wav_read({path}) -> {rc}")
    try:
        n = n_frames.value * n_ch.value
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.wav_free(out)
    if n_ch.value > 1:
        arr = arr.reshape(n_frames.value, n_ch.value)
    return arr, sr.value


def resample(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Windowed-sinc resample (same kernel as data/resample.py)."""
    if orig_sr == new_sr:
        return np.asarray(x, np.float32)
    lib = _load()
    g = math.gcd(int(orig_sr), int(new_sr))
    orig, new = int(orig_sr) // g, int(new_sr) // g
    x = np.ascontiguousarray(x, np.float32)
    target = int(math.ceil(new * len(x) / orig))
    out = np.empty(target, np.float32)
    rc = lib.resample_sinc(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), orig, new,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), target,
    )
    if rc < 0:
        raise NativeUnavailable(f"resample_sinc -> {rc}")
    return out
