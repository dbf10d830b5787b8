"""ctypes binding to the native frame-IO runtime (`native/pngfilters.cpp`).

Auto-builds `libpngfilters.so` with the system compiler on first use (cached);
callers fall back to the pure-python paths when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libpngfilters.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.png_unfilter.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int, u8p]
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_filter_sub.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int, u8p]
        lib.png_filter_sub.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> Optional[np.ndarray]:
    """Reconstruct filtered PNG scanlines. Returns (height, stride) uint8 or
    None when the native lib is unavailable/fails."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(raw, np.uint8)
    if src.size != height * (stride + 1):
        return None
    out = np.empty((height, stride), np.uint8)
    rc = lib.png_unfilter(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), height, stride, bpp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


_CC: Optional[ctypes.CDLL] = None
_CC_TRIED = False


def _load_cc() -> Optional[ctypes.CDLL]:
    global _CC, _CC_TRIED
    if _CC_TRIED:
        return _CC
    _CC_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libcclabel.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.cc_boxes.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                 i32p, ctypes.c_int64]
        lib.cc_boxes.restype = ctypes.c_int
        _CC = lib
    except Exception:
        _CC = None
    return _CC


def cc_boxes(mask: np.ndarray, max_comps: int = 256) -> Optional[np.ndarray]:
    """Connected-component boxes of a (H, W) bool/uint8 mask via the native
    union-find kernel (`native/cclabel.cpp`). Returns (K, 5) int32
    [x0, y0, x1, y1, area] sorted by area desc, or None when the native lib
    is unavailable."""
    lib = _load_cc()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    out = np.empty((max_comps, 5), np.int32)
    n = lib.cc_boxes(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                     max_comps)
    if n < 0:
        return None
    return out[:n]


def png_filter_sub(img: np.ndarray, bpp: int) -> Optional[bytes]:
    """Apply the Sub filter to (height, stride) uint8 rows; returns the
    filter-tagged scanline bytes ready for zlib, or None."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    height, stride = img.shape
    out = np.empty((height, stride + 1), np.uint8)
    rc = lib.png_filter_sub(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), height, stride, bpp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes() if rc == 0 else None
