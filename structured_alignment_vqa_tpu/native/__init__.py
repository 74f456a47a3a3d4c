"""Native (C++) tier: fast tar indexing, loaded through ctypes.

The shared library is built on demand with g++ (no pybind11 in the image; the
C ABI + ctypes keeps the binding dependency-free). If the toolchain is
missing, callers fall back to the pure-Python scanner transparently
(`data/tar_reader.py`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tar_index.cpp")
_LIB = os.path.join(_HERE, "libtarindex.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.tar_index_build.restype = ctypes.c_void_p
        lib.tar_index_build.argtypes = [ctypes.c_char_p]
        lib.tar_index_count.restype = ctypes.c_int64
        lib.tar_index_count.argtypes = [ctypes.c_void_p]
        lib.tar_index_entry.restype = ctypes.c_int
        lib.tar_index_entry.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tar_index_free.restype = None
        lib.tar_index_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class tar_index:
    """Namespace matching the import in `data/tar_reader.py`."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    @staticmethod
    def index_tar(path: str) -> List[Tuple[str, int, int]]:
        lib = _load()
        if lib is None:
            raise RuntimeError("native tar indexer unavailable")
        handle = lib.tar_index_build(path.encode())
        if not handle:
            raise IOError(f"cannot index {path}")
        try:
            n = lib.tar_index_count(handle)
            out = []
            name = ctypes.c_char_p()
            off = ctypes.c_uint64()
            size = ctypes.c_uint64()
            for i in range(n):
                if lib.tar_index_entry(handle, i, ctypes.byref(name),
                                       ctypes.byref(off), ctypes.byref(size)) == 0:
                    out.append((name.value.decode(), int(off.value), int(size.value)))
            return out
        finally:
            lib.tar_index_free(handle)
