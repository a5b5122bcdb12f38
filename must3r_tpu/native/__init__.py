"""First-party native (C++) components, loaded via ctypes.

Build happens lazily at import: if the shared library is missing or stale,
it is compiled with g++ -O3 (no external deps). Consumers must handle
`load_library() is None` (toolchain-less environments) by falling back to
scipy equivalents.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "kdtree.cpp")
_LIB = os.path.join(_DIR, "libmust3r_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    return os.path.getmtime(_SRC) > os.path.getmtime(_LIB)


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried and not _needs_build():
            return _lib
        _tried = True
        try:
            if _needs_build():
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                     "-std=c++17", _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.kd3_create.restype = ctypes.c_void_p
            lib.kd3_create.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.kd3_query.restype = None
            lib.kd3_query.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64, ctypes.c_void_p]
            lib.kd3_size.restype = ctypes.c_int64
            lib.kd3_size.argtypes = [ctypes.c_void_p]
            lib.kd3_destroy.restype = None
            lib.kd3_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib
