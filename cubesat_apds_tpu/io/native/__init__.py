"""ctypes bindings for the native TIFF decoder.

Compiled on first use (g++ + zlib); returns None handles when the
toolchain is missing or a file uses unsupported TIFF features — callers
(io.tiff.read_geotiff) fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tiff_decode.cc")
_LIB = os.path.join(_HERE, "libtiff_decode.so")
_lock = threading.Lock()
_lib = None
_tried = False

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build():
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", _LIB + ".tmp", "-lz", "-lpthread"],
                check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.tiff_open.restype = ctypes.c_void_p
    lib.tiff_open.argtypes = [_u8p, ctypes.c_int64, _i64p]
    lib.tiff_decode.restype = ctypes.c_int
    lib.tiff_decode.argtypes = [ctypes.c_void_p, _u8p, ctypes.c_int]
    lib.tiff_close.restype = None
    lib.tiff_close.argtypes = [ctypes.c_void_p]
    return lib


def get_lib():
    global _lib, _tried
    with _lock:
        if not _tried:
            _lib = _build()
            _tried = True
        return _lib


def read_tiff_native(path: str, n_threads: int = 8) -> Optional[np.ndarray]:
    """Decode a TIFF with the native engine → [H, W] or [H, W, C] array,
    or None when the file/toolchain is unsupported (fallback to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.fromfile(path, np.uint8)
    info = np.zeros(8, np.int64)
    handle = lib.tiff_open(raw, len(raw), info)
    if not handle:
        return None
    try:
        w, h, samples, bits, fmt, _n_chunks, ok = (int(x) for x in info[:7])
        if not ok:
            return None
        dtype = {(8, 1): np.uint8, (16, 1): np.uint16,
                 (32, 3): np.float32}.get((bits, fmt))
        if dtype is None:
            return None
        out = np.empty(h * w * samples, dtype)
        rc = lib.tiff_decode(handle,
                             out.view(np.uint8).reshape(-1), n_threads)
        if rc != 0:
            return None
        return out.reshape((h, w) if samples == 1 else (h, w, samples))
    finally:
        lib.tiff_close(handle)
