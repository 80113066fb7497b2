"""ctypes bindings to the C++ host-IO helpers (native/hakai_native.cpp).

Builds the shared library on first use if a compiler is available; all
callers fall back to pure NumPy when it isn't.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libhakai_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        lib.hakai_parse_numbers.restype = ctypes.c_int64
        lib.hakai_parse_numbers.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.hakai_format_e.restype = ctypes.c_int64
        lib.hakai_format_e.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        lib.hakai_format_i.restype = ctypes.c_int64
        lib.hakai_format_i.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def parse_numbers(text: str, expect: int | None = None) -> np.ndarray:
    """All float literals in ``text`` as a 1-D float64 array."""
    lib = _load()
    if not lib:
        import re
        return np.array([float(t) for t in re.findall(
            r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][-+]?\d+)?", text)])
    raw = text.encode()
    cap = expect if expect is not None else max(len(raw) // 2, 16)
    while True:
        out = np.empty(cap, np.float64)
        n = lib.hakai_parse_numbers(
            raw, len(raw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
        if n >= 0:
            return out[:n]
        cap *= 4


def format_e_rows(a: np.ndarray) -> str:
    """'%1.6e' space-separated rows with newlines (C fast path)."""
    lib = _load()
    a = np.ascontiguousarray(a, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if not lib:
        import io as _io
        buf = _io.StringIO()
        np.savetxt(buf, a, fmt="%1.6e", delimiter=" ")
        return buf.getvalue()
    cap = a.size * 16 + 16
    out = ctypes.create_string_buffer(cap)
    n = lib.hakai_format_e(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        a.shape[0], a.shape[1], out, cap)
    if n < 0:
        raise RuntimeError("format buffer overflow")
    return out.raw[:n].decode()


def format_i_rows(a: np.ndarray) -> str:
    lib = _load()
    a = np.ascontiguousarray(a, np.int32)
    if a.ndim == 1:
        a = a[:, None]
    if not lib:
        import io as _io
        buf = _io.StringIO()
        np.savetxt(buf, a, fmt="%d", delimiter=" ")
        return buf.getvalue()
    cap = a.size * 13 + 16
    out = ctypes.create_string_buffer(cap)
    n = lib.hakai_format_i(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        a.shape[0], a.shape[1], out, cap)
    if n < 0:
        raise RuntimeError("format buffer overflow")
    return out.raw[:n].decode()
