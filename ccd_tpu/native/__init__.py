"""Native (C++) runtime components, loaded via ctypes.

``build()`` compiles the shared library on first use (cached next to the
sources); everything degrades gracefully to the pure-Python implementations
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libccd_lmdb.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build(force: bool = False) -> Optional[str]:
    """Compile libccd_lmdb.so if needed; returns the path or None."""
    src = os.path.join(_DIR, "lmdb_reader.cc")
    if not force and os.path.exists(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True)
        return _LIB_PATH
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        path = build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.ccd_lmdb_open.restype = ctypes.c_void_p
        lib.ccd_lmdb_open.argtypes = [ctypes.c_char_p]
        lib.ccd_lmdb_entries.restype = ctypes.c_uint64
        lib.ccd_lmdb_entries.argtypes = [ctypes.c_void_p]
        lib.ccd_lmdb_get.restype = ctypes.c_int
        lib.ccd_lmdb_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t)]
        lib.ccd_lmdb_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeLmdbReader:
    """ctypes wrapper with the same interface as data.lmdb.LmdbReader."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native lmdb library unavailable")
        self._lib = lib
        self._env = lib.ccd_lmdb_open(path.encode())
        if not self._env:
            raise ValueError(f"cannot open LMDB environment at {path}")
        self.entries = int(lib.ccd_lmdb_entries(self._env))
        self.path = path

    def get(self, key: bytes) -> Optional[bytes]:
        val = ctypes.c_void_p()
        vlen = ctypes.c_size_t()
        hit = self._lib.ccd_lmdb_get(self._env, key, len(key),
                                     ctypes.byref(val), ctypes.byref(vlen))
        if not hit:
            return None
        return ctypes.string_at(val.value, vlen.value)

    def __len__(self) -> int:
        return self.entries

    def close(self) -> None:
        if getattr(self, "_env", None):
            self._lib.ccd_lmdb_close(self._env)
            self._env = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_reader(path: str):
    """Best reader available: native C++ when buildable, else pure Python."""
    try:
        return NativeLmdbReader(path)
    except Exception:
        from ccd_tpu.data.lmdb import LmdbReader
        return LmdbReader(path)
