"""ctypes bindings + lazy build for the C++ decode pool."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "decode_pool.cpp")
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libposetpu_decode.so")

_lock = threading.Lock()
_lib = None
_build_error = None


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-ljpeg", "-lpthread", "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.pool_create.restype = ctypes.c_void_p
            lib.pool_create.argtypes = [ctypes.c_int]
            lib.pool_destroy.argtypes = [ctypes.c_void_p]
            lib.pool_decode_batch.restype = ctypes.c_int
            lib.pool_decode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception as e:  # no g++ / no libjpeg: PIL fallback
            _build_error = e
        return _lib


def native_available():
    return _load() is not None


class NativeDecoder:
    """Parallel JPEG batch decoder.

    decode_batch(paths, centers, pad_hw) -> (images, valid_wh, offsets, ok)
      images  (N, ph, pw, 3) uint8, zero-padded (device converts to f32 —
              uint8 H2D transfers are 4x cheaper, see BASELINE.md)
      valid_wh (N, 2) int32 (w, h) of the valid region (0,0 on failure)
      offsets (N, 2) int32 integer crop offset applied (x, y)
      ok      (N,) bool per-file success (caller PIL-fallbacks failures)
    """

    def __init__(self, num_threads=None):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native decoder unavailable: {_build_error}")
        self._lib = lib
        n = num_threads or min(16, os.cpu_count() or 4)
        self._pool = lib.pool_create(int(n))

    def decode_batch(self, paths, centers, pad_hw):
        if self._pool is None:
            # a NULL pool handle would segfault inside the C++ call
            raise RuntimeError("NativeDecoder used after close()")
        ph, pw = pad_hw
        n = len(paths)
        images = np.zeros((n, ph, pw, 3), np.uint8)
        wh = np.zeros((n, 2), np.int32)
        offs = np.zeros((n, 2), np.int32)
        centers = np.ascontiguousarray(centers, np.float32)
        c_paths = (ctypes.c_char_p * n)(
            *[os.fsencode(p) for p in paths]
        )
        self._lib.pool_decode_batch(
            self._pool,
            c_paths,
            n,
            int(ph),
            int(pw),
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            wh.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        ok = (wh > 0).all(axis=1)
        return images, wh, offs, ok

    def close(self):
        if self._pool:
            self._lib.pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
