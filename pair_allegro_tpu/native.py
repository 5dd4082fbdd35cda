"""ctypes bindings to the C++ host runtime (csrc/pat_host.cpp).

Loads csrc/build/libpat_host.so, building it with `make -C csrc` on first
use when a toolchain is available.  Every entry point has a pure-python
fallback (the numpy implementations in neighbors/naive.py etc.), so the
extension is an accelerator, never a requirement — mirroring how the
reference's OpenMP/Kokkos paths accelerate but don't define semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "build", "libpat_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("PAT_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_CSRC):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pat_neighbor_stats.restype = ctypes.c_int
        lib.pat_neighbor_stats.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pat_spatial_keys.restype = ctypes.c_int
        lib.pat_spatial_keys.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pat_extxyz_count.restype = ctypes.c_int64
        lib.pat_extxyz_count.argtypes = [ctypes.c_char_p]
        lib.pat_extxyz_read.restype = ctypes.c_int
        lib.pat_extxyz_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def neighbor_stats(positions, cell, cutoff: float):
    """Binned (total_edges, max_per_atom) under full PBC; None when the
    native path is unavailable or the box is too small to bin (caller falls
    back to the python implementation)."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float64)
    cl = np.ascontiguousarray(cell, np.float64)
    total = ctypes.c_int64()
    maxc = ctypes.c_int64()
    rc = lib.pat_neighbor_stats(
        _dptr(pos), pos.shape[0], _dptr(cl), float(cutoff),
        ctypes.byref(total), ctypes.byref(maxc),
    )
    if rc != 0:
        return None
    return int(total.value), int(maxc.value)


def spatial_keys(positions, cell=None, n_bins: int = 8):
    """Bin-id sort keys for shard load balancing; None = fall back."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float64)
    n = pos.shape[0]
    keys = np.empty(n, np.int64)
    use_cell = cell is not None
    cl = np.ascontiguousarray(cell if use_cell else np.eye(3), np.float64)
    rc = lib.pat_spatial_keys(
        _dptr(pos), n, _dptr(cl), int(use_cell), int(n_bins),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return keys


def read_extxyz_frame(path: str):
    """Fast first-frame (positions, symbols) read; None = fall back to the
    python parser (also used for the comment-line metadata either way)."""
    lib = _load()
    if lib is None:
        return None
    n = lib.pat_extxyz_count(path.encode())
    if n < 0:
        return None
    pos = np.empty((n, 3), np.float64)
    syms = ctypes.create_string_buffer(8 * n)
    rc = lib.pat_extxyz_read(path.encode(), n, _dptr(pos), syms)
    if rc != 0:
        return None
    symbols = np.array(
        [syms.raw[8 * k : 8 * k + 8].split(b"\0")[0].decode() for k in range(n)]
    )
    return pos, symbols
