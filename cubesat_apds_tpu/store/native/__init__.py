"""ctypes bindings for the native store query engine.

Compiles store_query.cc with g++ on first use (cached as
libstore_query.so next to the source); falls back to None when no
toolchain is available — callers keep a pure-numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "store_query.cc")
_LIB = os.path.join(_HERE, "libstore_query.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC, "-o", _LIB + ".tmp"],
                check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.query_window.restype = ctypes.c_int64
    lib.query_window.argtypes = [
        _f32p, _f32p, _i32p, _i32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int64, _i32p]
    lib.query_lod.restype = ctypes.c_int64
    lib.query_lod.argtypes = [_i32p, _i32p, ctypes.c_int64,
                              ctypes.c_int32, ctypes.c_int64, _i32p]
    lib.query_image.restype = ctypes.c_int64
    lib.query_image.argtypes = [_i32p, _i32p, ctypes.c_int64,
                                ctypes.c_int32, ctypes.c_int64, _i32p]
    lib.argsort_response_desc.restype = None
    lib.argsort_response_desc.argtypes = [_f32p, ctypes.c_int64, _i32p]
    lib.gather_descriptors.restype = None
    lib.gather_descriptors.argtypes = [_u8p, ctypes.c_int64, _i32p,
                                       ctypes.c_int64, _u8p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if not _tried:
            _lib = _build()
            _tried = True
        return _lib
