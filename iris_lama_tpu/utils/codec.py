"""Buffer compression via the native C++ codec (ctypes).

reference: include/lama/buffer_compressor.h:43-80 — abstract
compress/decompress/bound with LZ4/ZSTD implementations. Here the LZ4 block
format is implemented natively in native/lama_codec.cpp (compiled on first
use with g++, cached next to the package) and exposed through the same
three-operation interface; a zlib fallback covers hosts without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import zlib

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "lama_codec.so"
_SRC_PATH = _NATIVE_DIR / "lama_codec.cpp"

_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not _SO_PATH.exists() or
                _SO_PATH.stat().st_mtime < _SRC_PATH.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC_PATH), "-o", str(_SO_PATH)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO_PATH))
        for name in ("lama_lz4_compress", "lama_lz4_decompress"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                           ctypes.c_char_p, ctypes.c_int64]
        lib.lama_lz4_compress_bound.restype = ctypes.c_int64
        lib.lama_lz4_compress_bound.argtypes = [ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class BufferCompressor:
    """compress/decompress/bound (buffer_compressor.h:43-80)."""

    def __init__(self, algorithm: str = "lz4"):
        self.algorithm = algorithm
        self._native = _load() if algorithm == "lz4" else None

    def compress_bound(self, n: int) -> int:
        if self._native is not None:
            return int(self._native.lama_lz4_compress_bound(n))
        return n + n // 255 + 64

    def compress(self, data: bytes) -> bytes:
        if self._native is not None:
            cap = self.compress_bound(len(data))
            out = ctypes.create_string_buffer(cap)
            n = self._native.lama_lz4_compress(data, len(data), out, cap)
            if n > 0:
                return out.raw[:n]
        return zlib.compress(data, 1)

    def decompress(self, data: bytes, expected_size: int) -> bytes:
        if self._native is not None:
            out = ctypes.create_string_buffer(expected_size)
            n = self._native.lama_lz4_decompress(data, len(data), out,
                                                 expected_size)
            if n == expected_size:
                return out.raw
            if n >= 0:
                return out.raw[:n]
        return zlib.decompress(data)

    @property
    def is_native(self) -> bool:
        return self._native is not None
