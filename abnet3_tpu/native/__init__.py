"""ctypes loader for the native C++ host runtime (libabnet3_native.so).

Compiles the library on first use (cached next to the source) and exposes
numpy-friendly wrappers. Falls back gracefully: ``native.AVAILABLE`` is
False when no C++ toolchain is present, and every caller keeps a pure
Python/numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["AVAILABLE", "dtw_align", "dtw", "cosine_distance", "pad_batch",
           "parse_pairs"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "abnet3_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libabnet3_native.so")
_lock = threading.Lock()
_lib = None
AVAILABLE = False


def _build() -> bool:
    for cxx in ("g++", "c++", "clang++"):
        try:
            res = subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", _LIB_PATH, _SRC],
                capture_output=True, timeout=180)
            if res.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _load():
    global _lib, AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                AVAILABLE = False
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            AVAILABLE = False
            return None

        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_i8p = ctypes.POINTER(ctypes.c_int8)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_f64p = ctypes.POINTER(ctypes.c_double)

        lib.abnet3_cosine_distance.argtypes = [
            c_f32p, ctypes.c_int, c_f32p, ctypes.c_int, ctypes.c_int,
            c_f64p]
        lib.abnet3_dtw.argtypes = [c_f64p, ctypes.c_int, ctypes.c_int,
                                   c_i32p, c_i32p, c_f64p]
        lib.abnet3_dtw.restype = ctypes.c_int
        lib.abnet3_dtw_align.argtypes = [c_f32p, ctypes.c_int, c_f32p,
                                         ctypes.c_int, ctypes.c_int,
                                         c_i32p, c_i32p]
        lib.abnet3_dtw_align.restype = ctypes.c_int
        lib.abnet3_pad_batch.argtypes = [c_f32p, c_i64p, c_i32p,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, c_f32p]
        lib.abnet3_parse_pairs.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            c_i32p, c_f64p, c_f64p, c_i32p, c_f64p, c_f64p, c_i8p,
            ctypes.c_char_p, ctypes.c_int64, c_i64p]
        lib.abnet3_parse_pairs.restype = ctypes.c_int64

        _lib = lib
        AVAILABLE = True
        return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def cosine_distance(x: np.ndarray, y: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    out = np.empty((len(x), len(y)), np.float64)
    lib.abnet3_cosine_distance(_ptr(x, ctypes.c_float), len(x),
                               _ptr(y, ctypes.c_float), len(y),
                               x.shape[1], _ptr(out, ctypes.c_double))
    return out


def dtw(dist: np.ndarray):
    """Returns (cost, path1, path2) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    dist = np.ascontiguousarray(dist, np.float64)
    n1, n2 = dist.shape
    p1 = np.empty(n1 + n2 - 1, np.int32)
    p2 = np.empty(n1 + n2 - 1, np.int32)
    cost = ctypes.c_double()
    L = lib.abnet3_dtw(_ptr(dist, ctypes.c_double), n1, n2,
                       _ptr(p1, ctypes.c_int32), _ptr(p2, ctypes.c_int32),
                       ctypes.byref(cost))
    if L < 0:
        raise ValueError("degenerate DTW input")
    return float(cost.value), p1[:L].astype(np.int64), \
        p2[:L].astype(np.int64)


def dtw_align(f1: np.ndarray, f2: np.ndarray):
    """Fused cosine distance + DTW alignment; (path1, path2) or None."""
    lib = _load()
    if lib is None:
        return None
    f1 = np.ascontiguousarray(f1, np.float32)
    f2 = np.ascontiguousarray(f2, np.float32)
    n1, n2 = len(f1), len(f2)
    p1 = np.empty(n1 + n2 - 1, np.int32)
    p2 = np.empty(n1 + n2 - 1, np.int32)
    L = lib.abnet3_dtw_align(_ptr(f1, ctypes.c_float), n1,
                             _ptr(f2, ctypes.c_float), n2, f1.shape[1],
                             _ptr(p1, ctypes.c_int32),
                             _ptr(p2, ctypes.c_int32))
    if L < 0:
        raise ValueError("degenerate DTW input")
    return p1[:L].astype(np.int64), p2[:L].astype(np.int64)


def pad_batch(table: np.ndarray, offsets: np.ndarray, lens: np.ndarray,
              T: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    table = np.ascontiguousarray(table, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lens = np.ascontiguousarray(lens, np.int32)
    B, d = len(offsets), table.shape[1]
    out = np.empty((B, T, d), np.float32)
    lib.abnet3_pad_batch(_ptr(table, ctypes.c_float),
                         _ptr(offsets, ctypes.c_int64),
                         _ptr(lens, ctypes.c_int32), B, T, d,
                         _ptr(out, ctypes.c_float))
    return out


def parse_pairs(path: str):
    """Parse a 7-column pair file. Returns
    (names, f1_id, s1, e1, f2_id, s2, e2, same) or None when unavailable.
    Raises ValueError with the offending line number on malformed input."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        buf = fh.read()
    # count '\r' too: the parser accepts lone-'\r' line endings, so a
    # '\n'-only count under-sizes the buffers on old-Mac files (CRLF
    # files double-count — harmless over-allocation)
    max_pairs = buf.count(b"\n") + buf.count(b"\r") + 1
    f1_id = np.empty(max_pairs, np.int32)
    f2_id = np.empty(max_pairs, np.int32)
    s1 = np.empty(max_pairs, np.float64)
    e1 = np.empty(max_pairs, np.float64)
    s2 = np.empty(max_pairs, np.float64)
    e2 = np.empty(max_pairs, np.float64)
    same = np.empty(max_pairs, np.int8)
    names_cap = len(buf) + 16
    names_out = ctypes.create_string_buffer(names_cap)
    names_len = ctypes.c_int64()
    n = lib.abnet3_parse_pairs(
        buf, len(buf), max_pairs,
        _ptr(f1_id, ctypes.c_int32), _ptr(s1, ctypes.c_double),
        _ptr(e1, ctypes.c_double), _ptr(f2_id, ctypes.c_int32),
        _ptr(s2, ctypes.c_double), _ptr(e2, ctypes.c_double),
        _ptr(same, ctypes.c_int8), names_out, names_cap,
        ctypes.byref(names_len))
    if n < 0:
        int64_min = -(1 << 63)
        if n in (int64_min + 1, int64_min + 2):
            # internal buffer-sizing failure, NOT malformed content —
            # fall back to the pure-Python parser rather than misreport
            return None
        raise ValueError(f"malformed pairs line {-n} in {path}")
    names = names_out.raw[:names_len.value].decode("utf-8").split("\n")[:-1]
    n = int(n)
    return (names, f1_id[:n], s1[:n], e1[:n], f2_id[:n], s2[:n], e2[:n],
            same[:n])
