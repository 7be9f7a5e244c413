"""ctypes binding to the native range coder, with automatic build.

The shared library is compiled on first use (g++ is part of the toolchain;
pybind11 is not available in this image, so the binding is plain ctypes
over a C ABI — flat arrays in, bytes out). A pure-Python zlib container is
the fallback when no compiler exists; the bitstream header records which
entropy backend wrote the stream so decode always dispatches correctly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import zlib
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "native_available",
    "encode_coeffs",
    "decode_coeffs",
    "encode_bytes",
    "decode_bytes",
    "BACKEND_NATIVE",
    "BACKEND_ZLIB",
]

BACKEND_NATIVE = 0
BACKEND_ZLIB = 1

_CSRC = Path(__file__).parent / "csrc" / "rangecoder.cpp"
_LIB_PATH = Path(__file__).parent / "csrc" / "libnvc_rc.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _CSRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(_LIB_PATH), str(_CSRC)],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.nvc_rc_encode.restype = ctypes.c_longlong
            lib.nvc_rc_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_longlong, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ]
            lib.nvc_rc_decode.restype = ctypes.c_longlong
            lib.nvc_rc_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
                ctypes.c_longlong, ctypes.c_int, ctypes.POINTER(ctypes.c_int16),
            ]
            lib.nvc_rc_encode_bytes.restype = ctypes.c_longlong
            lib.nvc_rc_encode_bytes.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ]
            lib.nvc_rc_decode_bytes.restype = ctypes.c_longlong
            lib.nvc_rc_decode_bytes.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def encode_coeffs(coeffs: np.ndarray, block_len: int) -> tuple[int, bytes]:
    """int16 array (flat, length % block_len == 0) -> (backend, payload)."""
    flat = np.ascontiguousarray(coeffs, dtype=np.int16).reshape(-1)
    assert flat.size % block_len == 0, (flat.size, block_len)
    lib = _load()
    if lib is not None:
        cap = flat.size * 4 + 4096
        out = np.empty(cap, dtype=np.uint8)
        n = lib.nvc_rc_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            flat.size, block_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        )
        if n >= 0:
            return BACKEND_NATIVE, out[:n].tobytes()
    return BACKEND_ZLIB, zlib.compress(flat.tobytes(), level=6)


def decode_coeffs(backend: int, payload: bytes, n: int, block_len: int) -> np.ndarray:
    if backend == BACKEND_ZLIB:
        return np.frombuffer(zlib.decompress(payload), dtype=np.int16)[:n].copy()
    lib = _load()
    if lib is None:
        raise RuntimeError("stream was encoded with the native range coder, "
                           "but the native library is unavailable")
    out = np.empty(n, dtype=np.int16)
    buf = np.frombuffer(payload, dtype=np.uint8)
    got = lib.nvc_rc_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        n, block_len, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    assert got == n
    return out


def encode_bytes(data: np.ndarray) -> tuple[int, bytes]:
    flat = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    lib = _load()
    if lib is not None:
        cap = flat.size * 2 + 4096
        out = np.empty(cap, dtype=np.uint8)
        n = lib.nvc_rc_encode_bytes(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        )
        if n >= 0:
            return BACKEND_NATIVE, out[:n].tobytes()
    return BACKEND_ZLIB, zlib.compress(flat.tobytes(), level=6)


def decode_bytes(backend: int, payload: bytes, n: int) -> np.ndarray:
    if backend == BACKEND_ZLIB:
        return np.frombuffer(zlib.decompress(payload), dtype=np.uint8)[:n].copy()
    lib = _load()
    if lib is None:
        raise RuntimeError("native range coder unavailable for decode")
    out = np.empty(n, dtype=np.uint8)
    buf = np.frombuffer(payload, dtype=np.uint8)
    got = lib.nvc_rc_decode_bytes(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert got == n
    return out
