"""ctypes bindings for the native host library (native/miotts_native.cpp).

Accelerates the model-load hot loops (quant-block repack into the planar
device layout, half-float conversion, PCM conversion).  Auto-builds with the
in-image toolchain on first use; every entry point falls back to the numpy
reference implementation in quants.py when the library is unavailable, and
the test suite asserts bit-identical outputs between the two.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(root, "native")
    so_path = os.path.join(native_dir, "libmiotts_native.so")
    src = os.path.join(native_dir, "miotts_native.cpp")
    stale = (os.path.exists(so_path) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(so_path))
    if (not os.path.exists(so_path) or stale) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
                 src, "-o", so_path],
                check=True, capture_output=True, timeout=120)
        except Exception:
            if stale:   # keep using the old binary rather than failing
                pass
            else:
                return None
    if not os.path.exists(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C")
    u16 = np.ctypeslib.ndpointer(np.uint16, flags="C")
    i8 = np.ctypeslib.ndpointer(np.int8, flags="C,W")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C,W")
    i16 = np.ctypeslib.ndpointer(np.int16, flags="C,W")
    f32r = np.ctypeslib.ndpointer(np.float32, flags="C")
    i64 = ctypes.c_int64
    lib.miotts_f16_to_f32.argtypes = [u16, f32, i64]
    lib.miotts_bf16_to_f32.argtypes = [u16, f32, i64]
    lib.miotts_repack_q8_0_t.argtypes = [u8, i64, i64, i8, f32]
    lib.miotts_repack_q6_k_t.argtypes = [u8, i64, i64, i8, f32]
    lib.miotts_repack_q4_k_t.argtypes = [u8, i64, i64, i8, f32, f32]
    lib.miotts_f32_to_s16.argtypes = [f32r, i16, i64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def f16_to_f32(raw_u16: np.ndarray) -> np.ndarray | None:
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(raw_u16, np.uint16)
    out = np.empty(src.size, np.float32)
    lib.miotts_f16_to_f32(src.reshape(-1), out, src.size)
    return out


def bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray | None:
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(raw_u16, np.uint16)
    out = np.empty(src.size, np.float32)
    lib.miotts_bf16_to_f32(src.reshape(-1), out, src.size)
    return out


def repack_q8_0_t(raw: np.ndarray, rows: int, cols: int):
    """-> (values_t int8 [cols, rows], scales_t f32 [cols//32, rows]) or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    values = np.empty((cols, rows), np.int8)
    scales = np.empty((cols // 32, rows), np.float32)
    lib.miotts_repack_q8_0_t(raw, rows, cols, values, scales)
    return values, scales


def repack_q6_k_t(raw: np.ndarray, rows: int, cols: int):
    """-> (values_t int8 [cols, rows] centered, scales_t f32 [cols//16, rows])."""
    lib = _build_and_load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    values = np.empty((cols, rows), np.int8)
    scales = np.empty((cols // 16, rows), np.float32)
    lib.miotts_repack_q6_k_t(raw, rows, cols, values, scales)
    return values, scales


def repack_q4_k_t(raw: np.ndarray, rows: int, cols: int):
    """-> (values_t [cols, rows] 0..15, scales_t, mins_t f32 [cols//32, rows])."""
    lib = _build_and_load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    values = np.empty((cols, rows), np.int8)
    scales = np.empty((cols // 32, rows), np.float32)
    mins = np.empty((cols // 32, rows), np.float32)
    lib.miotts_repack_q4_k_t(raw, rows, cols, values, scales, mins)
    return values, scales, mins


def f32_to_s16(samples: np.ndarray) -> np.ndarray | None:
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(samples, np.float32)
    out = np.empty(src.size, np.int16)
    lib.miotts_f32_to_s16(src.reshape(-1), out, src.size)
    return out
