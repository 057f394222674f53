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
    lib.tiff_open_path.restype = ctypes.c_void_p
    lib.tiff_open_path.argtypes = [ctypes.c_char_p, _i64p]
    lib.tiff_decode.restype = ctypes.c_int
    lib.tiff_decode.argtypes = [ctypes.c_void_p, _u8p, ctypes.c_int]
    lib.tiff_decode_window.restype = ctypes.c_int
    lib.tiff_decode_window.argtypes = [
        ctypes.c_void_p, _u8p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
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


class NativeTiff:
    """mmap-backed TIFF handle with windowed decode — the out-of-RAM
    ingestion path (the reference streams COG windows through GDAL,
    geotiff_extractor mod.rs:332-343; this is the same access pattern:
    only chunks intersecting a requested window are ever decompressed).

    Use as a context manager or call close(); also safe to drop (GC
    closes the handle).
    """

    def __init__(self, path: str, n_threads: int = 8):
        self._lib = get_lib()
        self._handle = None
        self.n_threads = n_threads
        if self._lib is None:
            raise OSError("native TIFF decoder unavailable")
        info = np.zeros(8, np.int64)
        handle = self._lib.tiff_open_path(
            os.fspath(path).encode(), info)
        if not handle:
            raise OSError(f"cannot parse TIFF header: {path}")
        self.width, self.height, self.samples, bits, fmt, self.n_chunks, ok \
            = (int(x) for x in info[:7])
        self.dtype = {(8, 1): np.uint8, (16, 1): np.uint16,
                      (32, 3): np.float32}.get((bits, fmt))
        if not ok or self.dtype is None:
            self._lib.tiff_close(handle)
            raise OSError(f"unsupported TIFF layout: {path}")
        self._handle = handle

    def read_window(self, x0: int, y0: int, w: int, h: int) -> np.ndarray:
        """Decode [y0:y0+h, x0:x0+w] → [h, w] or [h, w, C]."""
        if self._handle is None:
            raise ValueError("closed")
        if not (0 <= x0 and 0 <= y0 and x0 + w <= self.width
                and y0 + h <= self.height and w > 0 and h > 0):
            raise ValueError(
                f"window ({x0},{y0},{w},{h}) outside "
                f"{self.width}x{self.height}")
        out = np.empty(h * w * self.samples, self.dtype)
        rc = self._lib.tiff_decode_window(
            self._handle, out.view(np.uint8).reshape(-1),
            x0, y0, w, h, self.n_threads)
        if rc != 0:
            raise OSError(f"window decode failed (rc={rc})")
        return out.reshape((h, w) if self.samples == 1
                           else (h, w, self.samples))

    def close(self):
        if self._handle is not None:
            self._lib.tiff_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_tiff_native(path: str, n_threads: int = 8) -> Optional[NativeTiff]:
    """NativeTiff for supported files, None otherwise (fallback to PIL)."""
    try:
        return NativeTiff(path, n_threads)
    except OSError:
        return None


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
