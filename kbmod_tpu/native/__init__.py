"""Native (C++) host-side kernels, loaded via ctypes.

Builds the shared library on first use (g++ -O3) and caches it next to the
source; falls back cleanly (``available() == False``) when no compiler is
present so every caller keeps a pure-Python path.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kbmod_native.cpp")
_LIB = os.path.join(_HERE, "libkbmod_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    logger.info(f"Building native library: {' '.join(cmd)}")
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.grid_dedup.restype = ctypes.c_int64
            lib.grid_dedup.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.extract_stamps.restype = None
            lib.extract_stamps.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.rice_decode.restype = ctypes.c_int
            lib.rice_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.rice_encode.restype = ctypes.c_int64
            lib.rice_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            _lib = lib
        except Exception as err:  # pragma: no cover - compiler-less envs
            logger.warning(f"Native library unavailable ({err}); using Python fallbacks.")
            _lib = None
    return _lib


def available():
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def grid_dedup(x, y, vx, vy, lh, bin_width, max_time):
    """Best-lh-per-bin indices (ascending) via the native hash map.

    Semantics match kbmod_tpu.filters.clustering_grid.grid_keep_indices for
    bin coordinates within +/-32767 bins (survey-scale images); returns
    None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.int32)
    y = np.ascontiguousarray(y, dtype=np.int32)
    vx = np.ascontiguousarray(vx, dtype=np.float32)
    vy = np.ascontiguousarray(vy, dtype=np.float32)
    lh = np.ascontiguousarray(lh, dtype=np.float32)
    n = len(x)
    out = np.empty(n, dtype=np.int64)
    count = lib.grid_dedup(
        _ptr(x, ctypes.c_int32),
        _ptr(y, ctypes.c_int32),
        _ptr(vx, ctypes.c_float),
        _ptr(vy, ctypes.c_float),
        _ptr(lh, ctypes.c_float),
        n,
        float(bin_width),
        float(max_time),
        _ptr(out, ctypes.c_int64),
    )
    return out[:count]


def extract_stamps(imgs, xs, ys, radius):
    """(n, T, S, S) NaN-padded stamps via the native loop; None when the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(imgs, dtype=np.float32)
    xs = np.ascontiguousarray(xs, dtype=np.int32)
    ys = np.ascontiguousarray(ys, dtype=np.int32)
    T, H, W = imgs.shape
    n = xs.shape[0]
    S = 2 * radius + 1
    out = np.empty((n, T, S, S), dtype=np.float32)
    lib.extract_stamps(
        _ptr(imgs, ctypes.c_float),
        T, H, W,
        _ptr(xs, ctypes.c_int32),
        _ptr(ys, ctypes.c_int32),
        n,
        radius,
        _ptr(out, ctypes.c_float),
    )
    return out


def rice_decode(data, npix, bytepix):
    """Decode a RICE_1 stream via the native codec; None when the native
    library is unavailable (the caller falls back to io/rice.py)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    out = np.empty(int(npix), dtype=np.int32)
    rc = lib.rice_decode(
        _ptr(buf, ctypes.c_uint8), len(buf), int(npix), int(bytepix),
        _ptr(out, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError("Corrupt RICE stream (native decoder).")
    return out


def rice_encode(values, bytepix):
    """Encode int values as a RICE_1 stream via the native codec; None
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    vals = np.ascontiguousarray(values, dtype=np.int32)
    # Worst case: every block verbatim -> bytepix + fsbits bits overhead
    # per block plus bbits per value; 2x + 64 covers all of it.
    cap = 2 * vals.size * int(bytepix) + vals.size // 4 + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.rice_encode(
        _ptr(vals, ctypes.c_int32), vals.size, int(bytepix),
        _ptr(out, ctypes.c_uint8), cap,
    )
    if n < 0:
        raise ValueError("RICE encode buffer overflow (native encoder).")
    return out[:n].tobytes()
