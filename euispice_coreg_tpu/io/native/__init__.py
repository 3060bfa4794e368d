"""ctypes bindings for the native C++ codecs (built on demand with g++).

The shared library is compiled once into this directory; rebuilds trigger
automatically when ``rice.cpp`` is newer than the cached ``.so``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rice.cpp")
_SO = os.path.join(_DIR, "libeuicoreg_native.so")

_lock = threading.Lock()
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        need_build = (not os.path.exists(_SO)) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        )
        if need_build:
            _build()
        lib = ctypes.CDLL(_SO)
        lib.euicoreg_rice_encode.restype = ctypes.c_long
        lib.euicoreg_rice_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.euicoreg_rice_decode.restype = ctypes.c_int
        lib.euicoreg_rice_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return lib


def rice_encode(pixels: np.ndarray, blocksize: int = 32, bytepix: int = 4) -> np.ndarray:
    """RICE_1-encode an int array; returns a uint8 array of compressed bytes."""
    lib = _load()
    a = np.ascontiguousarray(pixels, dtype=np.int32)
    npix = a.size
    # worst case: verbatim blocks + headers + first pixel + slack
    cap = npix * (bytepix + 1) + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.euicoreg_rice_encode(
        a.ctypes.data, npix, out.ctypes.data, cap, blocksize, bytepix
    )
    if n < 0:
        raise RuntimeError("RICE encode buffer overflow")
    return out[:n].copy()


def rice_decode(comp: np.ndarray, npix: int, blocksize: int = 32, bytepix: int = 4) -> np.ndarray:
    """Decode RICE_1 bytes into an int32 array of ``npix`` pixels."""
    lib = _load()
    c = np.ascontiguousarray(comp, dtype=np.uint8)
    out = np.empty(npix, dtype=np.int32)
    rc = lib.euicoreg_rice_decode(
        c.ctypes.data, c.size, out.ctypes.data, npix, blocksize, bytepix
    )
    if rc != 0:
        raise RuntimeError(f"RICE decode failed (rc={rc})")
    return out
