"""ctypes binding for the native normalization kernel (with numpy fallback).

The C source lives next to this file; it is compiled once into
`libd2s_native.so` in the package directory (cc -O3 -shared -fPIC) and
cached. Set D2S_DISABLE_NATIVE=1 to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "d2s_native.c")
_LIB_PATH = os.path.join(_HERE, "libd2s_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC,
                 "-lpthread"],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("D2S_DISABLE_NATIVE"):
            return None
        try:
            if not os.path.exists(_LIB_PATH) and not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            fn = lib.d2s_normalize_u8_to_f32_mt
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def normalize_u8(
    img: np.ndarray,
    mean: Sequence[float],
    std: Sequence[float],
    n_threads: int = 0,
) -> np.ndarray:
    """(…, C) uint8 -> normalized float32: (x/255 - mean) / std, one pass.

    Uses the native kernel when available, numpy otherwise.
    """
    img = np.ascontiguousarray(img)
    assert img.dtype == np.uint8, img.dtype
    C = img.shape[-1]
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib = _load()
    if lib is None or C > 8:
        return (img.astype(np.float32) / 255.0 - mean) / std
    scale = np.ascontiguousarray(1.0 / (255.0 * std), np.float32)
    shift = np.ascontiguousarray(-mean / std, np.float32)
    out = np.empty(img.shape, np.float32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.d2s_normalize_u8_to_f32_mt(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_size_t(img.size // C),
        ctypes.c_size_t(C),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        shift.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads),
    )
    return out
