"""ctypes bindings for the native runtime (``runtime/src/xslam_native.cpp``).

Builds the shared library on first use (``make`` in ``runtime/``); every
entry point degrades gracefully to ``None``/False so pure-Python fallbacks
(PIL, numpy.savetxt) keep working where a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_RUNTIME_DIR = os.path.join(_REPO_ROOT, "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "build", "libxslam_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _RUNTIME_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.xs_read_png16.restype = ctypes.c_int
        lib.xs_read_png16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.xs_free.argtypes = [ctypes.c_void_p]
        lib.xs_write_ply.restype = ctypes.c_int
        lib.xs_write_ply.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.xs_prefetch_create.restype = ctypes.c_void_p
        lib.xs_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.xs_prefetch_get.restype = ctypes.c_int
        lib.xs_prefetch_get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.xs_prefetch_destroy.argtypes = [ctypes.c_void_p]
        lib.xs_write_pose.restype = ctypes.c_int
        lib.xs_write_pose.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_png16(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_uint16)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.xs_read_png16(path.encode(), ctypes.byref(buf), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value)).copy()
    finally:
        lib.xs_free(buf)
    return arr


def write_ply(path: str, points: np.ndarray, normals: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    pts = np.ascontiguousarray(points, np.float32)
    nrm = np.ascontiguousarray(normals, np.float32)
    rc = lib.xs_write_ply(
        path.encode(),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts),
    )
    return rc == 0


def write_pose(path: str, mat4: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    m = np.ascontiguousarray(mat4, np.float32)
    return lib.xs_write_pose(path.encode(), m.ctypes.data_as(ctypes.POINTER(ctypes.c_float))) == 0


class Prefetcher:
    """Threaded ahead-of-time PNG depth decoder (double-buffer analogue)."""

    def __init__(self, paths, n_threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.xs_prefetch_create(arr, len(self._paths), n_threads)
        self._n = len(paths)

    def get(self, i: int, height: int, width: int) -> np.ndarray:
        dst = np.empty((height, width), np.uint16)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.xs_prefetch_get(
            self._handle, i, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.byref(w), ctypes.byref(h),
        )
        if rc != 0:
            raise IOError(f"frame {i} decode failed: {rc}")
        assert (h.value, w.value) == (height, width)
        return dst

    def close(self):
        if self._handle:
            self._lib.xs_prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
