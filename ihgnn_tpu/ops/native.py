"""ctypes binding for the native routing library (csrc/routing.cc).

The library is built on demand with g++ (no pip/pybind11 in this
environment) into ``csrc/build/``; if the toolchain is unavailable the
callers fall back to the pure-NumPy implementation in ops/benes.py (the
test oracle), which is ~1000x slower but correct.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SRC = os.path.join(_CSRC, "routing.cc")
_SO = os.path.join(_CSRC, "build", "libihgnn_routing.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if stale/missing) the routing library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(_SRC)
                     and os.path.getmtime(_SRC) > os.path.getmtime(_SO)))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ihgnn_euler_split.argtypes = [i32p, i32p, ctypes.c_int64,
                                          ctypes.c_int32, ctypes.c_int32, u8p]
        lib.ihgnn_euler_split.restype = None
        lib.ihgnn_color_regular_bipartite.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p]
        lib.ihgnn_color_regular_bipartite.restype = None
        lib.ihgnn_benes_route.argtypes = [i64p, ctypes.c_int64,
                                          ctypes.c_int32, ctypes.c_int32,
                                          i32p, i32p, i32p]
        lib.ihgnn_benes_route.restype = ctypes.c_int
        lib.ihgnn_route_rows.argtypes = [i32p, ctypes.c_int64,
                                         ctypes.c_int32, ctypes.c_int32, i32p]
        lib.ihgnn_route_rows.restype = ctypes.c_int
        lib.ihgnn_route_rows_bfly.argtypes = [i32p, ctypes.c_int64,
                                              ctypes.c_int32, ctypes.c_int32,
                                              i32p]
        lib.ihgnn_route_rows_bfly.restype = ctypes.c_int
        lib.ihgnn_bfly_route_blocks.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.ihgnn_bfly_route_blocks.restype = ctypes.c_int
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def benes_route(perm: np.ndarray, rows: int, cols: int
                ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native rectangular Clos routing: out[j] = in[perm[j]], E = rows*cols.

    Returns (p0 [rows, cols], p1 [cols, rows], p2 [rows, cols]) int32, or
    None if the native library is unavailable (caller falls back to
    ops/benes.py). cols must be a power of two.
    """
    lib = load()
    if lib is None:
        return None
    perm = np.ascontiguousarray(perm, np.int64)
    assert perm.shape == (rows * cols,)
    p0 = np.empty((rows, cols), np.int32)
    p1 = np.empty((cols, rows), np.int32)
    p2 = np.empty((rows, cols), np.int32)
    rc = lib.ihgnn_benes_route(_ptr(perm, ctypes.c_int64), perm.size,
                               rows, cols, _ptr(p0, ctypes.c_int32),
                               _ptr(p1, ctypes.c_int32),
                               _ptr(p2, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"ihgnn_benes_route failed with code {rc}")
    return p0, p1, p2


def route_rows_hier(p: np.ndarray, w: int) -> Optional[np.ndarray]:
    """Native hierarchical in-row routing: each row of ``p`` ([NR, L],
    a permutation of range(L)) → packed int32 stage word (see
    ops/benes.py route_rows_hier, the NumPy oracle). Returns None if the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    p = np.ascontiguousarray(p, np.int32)
    nr, length = p.shape
    packed = np.empty((nr, length), np.int32)
    rc = lib.ihgnn_route_rows(_ptr(p, ctypes.c_int32), nr, length, w,
                              _ptr(packed, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"ihgnn_route_rows failed with code {rc}")
    return packed


def route_rows_bfly(p: np.ndarray, w: int = 128) -> Optional[np.ndarray]:
    """Native butterfly in-row routing: each row of ``p`` ([NR, L], a
    permutation of range(L)) → packed int32 butterfly word (see
    ops/bfly.py pack_bfly_words, the NumPy oracle). Returns None if the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    p = np.ascontiguousarray(p, np.int32)
    nr, length = p.shape
    packed = np.empty((nr, length), np.int32)
    rc = lib.ihgnn_route_rows_bfly(_ptr(p, ctypes.c_int32), nr, length, w,
                                   _ptr(packed, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"ihgnn_route_rows_bfly failed with code {rc}")
    return packed


def bfly_route_blocks(perms: np.ndarray) -> Optional[np.ndarray]:
    """Native single-network Beneš switch routing of 128-lane blocks:
    perms [N, 128] → 13-bit words [N, 128] (ops/bfly.py route_blocks
    oracle). Returns None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    perms = np.ascontiguousarray(perms, np.int32)
    nb = perms.shape[0]
    assert perms.shape[1] == 128, perms.shape
    words = np.empty((nb, 128), np.int32)
    rc = lib.ihgnn_bfly_route_blocks(_ptr(perms, ctypes.c_int32), nb,
                                     _ptr(words, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"ihgnn_bfly_route_blocks failed with code {rc}")
    return words
