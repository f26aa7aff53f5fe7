"""Lazy build + ctypes binding for the native rANS runtime.

Compiles rans.cpp with g++ -O3 on first use (cached next to the source,
rebuilt when the source is newer). Callers fall back to the numpy
implementation when no compiler is available — the native path is a
performance component, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'rans.cpp')
_LIB = os.path.join(_DIR, 'librans.so')
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.check_call(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _LIB],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None if unbuildable."""
    global _lib, _build_failed
    with _LOCK:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        needs_build = (not os.path.exists(_LIB)
                       or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if needs_build and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rans_encode_reverse.argtypes = [
            ctypes.c_int64, ctypes.c_int64, u32p, u32p, u8p,
            ctypes.c_uint32, u16p, u32p, u32p, i32p]
        lib.rans_encode_reverse.restype = None
        lib.rans_decode_lane.argtypes = [
            ctypes.c_int64, ctypes.c_int64, u16p, ctypes.c_int64,
            ctypes.c_uint32, ctypes.c_int32, u32p, u32p, i32p]
        lib.rans_decode_lane.restype = None
        _lib = lib
        return _lib
