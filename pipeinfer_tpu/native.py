"""ctypes bindings to the native C++ runtime (native/repack.cpp).

The model-load hot path (block decode + planar repack + K-major transpose)
runs natively with a thread pool when the shared library is available;
everything degrades gracefully to the vectorized numpy implementations.
Build with `make -C native`; the library is auto-built on first use when a
compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from .gguf.constants import GGMLQuantType

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO = _NATIVE_DIR / "libpipeinfer_native.so"

_lib = None
_tried = False

# formats the native repacker supports (native/repack.cpp decoder_for)
NATIVE_QTYPES = {
    GGMLQuantType.Q4_0,
    GGMLQuantType.Q8_0,
    GGMLQuantType.Q4_K,
    GGMLQuantType.Q5_K,
    GGMLQuantType.Q6_K,
}


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() and (_NATIVE_DIR / "repack.cpp").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True, timeout=120
            )
        except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
            return None
    if not _SO.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.pi_repack.restype = ctypes.c_int
    lib.pi_repack.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int,
    ]
    lib.pi_transpose_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int
    ]
    for name in ("pi_round_clip_u8", "pi_round_clip_i8"):
        if hasattr(lib, name):
            getattr(lib, name).argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def repack(raw: np.ndarray, qtype: GGMLQuantType, n: int, k: int, n_threads: int = 0):
    """Native decode+repack to N-major planes. Returns (qs, qh, scales, bias)
    matching quant.pack layouts, or None if unsupported/unavailable."""
    lib = get_lib()
    if lib is None or qtype not in NATIVE_QTYPES:
        return None
    from .quant.pack import FORMAT_INFO

    bits, group = FORMAT_INFO[qtype]
    if bits == 8:
        qs = np.empty((n, k), np.int8)
        qh = None
    else:
        qs = np.empty((n, k // 2), np.uint8)
        qh = (
            np.empty((n, k // 8), np.uint8)
            if bits == 5
            else (np.empty((n, k // 4), np.uint8) if bits == 6 else None)
        )
    scales = np.empty((n, k // group), np.float32)
    bias = np.empty((n, k // group), np.float32)
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    rc = lib.pi_repack(
        int(qtype),
        raw.ctypes.data_as(ctypes.c_void_p),
        n,
        k,
        qs.ctypes.data_as(ctypes.c_void_p),
        qh.ctypes.data_as(ctypes.c_void_p) if qh is not None else None,
        scales.ctypes.data_as(ctypes.c_void_p),
        bias.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    if rc != 0:
        return None
    return qs, qh, scales, bias


def round_clip(x: np.ndarray, lo: float, hi: float, dtype=np.uint8,
               half_away: bool = False, n_threads: int = 0) -> np.ndarray | None:
    """round(x) clipped to [lo, hi] as u8/i8 — np.round().astype(int) runs
    at ~2 M elem/s on this host's numpy (scalar conversion fallback); the
    native loop vectorizes. half_away=False matches np.round (half-to-
    even); half_away=True matches ggml's (x + 0.5) truncation rounding."""
    lib = get_lib()
    fn_name = "pi_round_clip_u8" if dtype == np.uint8 else "pi_round_clip_i8"
    if lib is None or not hasattr(lib, fn_name):
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype)
    getattr(lib, fn_name)(
        x.ctypes.data_as(ctypes.c_void_p), x.size,
        ctypes.c_float(lo), ctypes.c_float(hi),
        out.ctypes.data_as(ctypes.c_void_p), 1 if half_away else 0, n_threads,
    )
    return out


def transpose_u8(a: np.ndarray, n_threads: int = 0) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a)
    out = np.empty((a.shape[1], a.shape[0]), a.dtype)
    lib.pi_transpose_u8(
        a.ctypes.data_as(ctypes.c_void_p), a.shape[0], a.shape[1],
        out.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return out
