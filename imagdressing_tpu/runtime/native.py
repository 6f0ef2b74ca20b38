"""ctypes binding + build-on-first-use for the C++ image runtime.

Builds csrc/image_ops.cpp into _image_ops.so with g++ (no pybind11 in this
image; the C ABI + ctypes keeps the binding dependency-free). Falls back
cleanly when the toolchain or libjpeg is unavailable — callers check
`available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "image_ops.cpp")
_SO = os.path.join(_DIR, "_image_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
        "-o", _SO, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.igd_jpeg_decode.restype = ctypes.c_int
        lib.igd_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.igd_resize_crop_normalize.restype = ctypes.c_int
        lib.igd_resize_crop_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.igd_clip_preprocess.restype = ctypes.c_int
        lib.igd_clip_preprocess.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


MAX_SIDE = 8192
_tls = threading.local()


def _scratch() -> np.ndarray:
    """Per-thread reusable decode buffer (96 MB): allocating it per call
    churned the allocator/page tables in the hot data-loading path. The
    decoded view is .copy()'d before returning, so reuse is safe."""
    buf = getattr(_tls, "scratch", None)
    if buf is None:
        buf = np.empty((MAX_SIDE, MAX_SIDE // 2, 3), np.uint8)
        _tls.scratch = buf
    return buf


def jpeg_decode(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> (H, W, 3) uint8 RGB, or None when the native path can't
    handle it (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    buf = _scratch()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.igd_jpeg_decode(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p),
        MAX_SIDE, MAX_SIDE // 2, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    return buf.reshape(-1)[: h.value * w.value * 3].reshape(
        h.value, w.value, 3
    ).copy()


def resize_crop_normalize(
    img: np.ndarray, size: int, top: int, left: int, crop_h: int, crop_w: int
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((crop_h, crop_w, 3), np.float32)
    rc = lib.igd_resize_crop_normalize(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
        size, top, left, crop_h, crop_w,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else None


def clip_preprocess(img: np.ndarray, size: int = 224) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((size, size, 3), np.float32)
    rc = lib.igd_clip_preprocess(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
        size, out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else None


def resized_dims(sh: int, sw: int, size: int) -> Tuple[int, int]:
    """Shorter-side resize target dims (matches the C++ arithmetic)."""
    if sh < sw:
        return size, max(1, sw * size // sh)
    return max(1, sh * size // sw), size
