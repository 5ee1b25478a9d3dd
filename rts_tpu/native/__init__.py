"""ctypes bindings for the C++ host geometry runtime (src/rts_native.cpp).

Builds the shared library with g++ on first use (cached next to the
source); every entry point has a NumPy fallback in the pure-Python
modules, so the framework works without a toolchain — the native layer
is the fast path for million-triangle host work (file parsing, icosphere
subdivision, Morton ordering, soup flattening).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "rts_native.cpp")
_LIB = os.path.join(_DIR, "librts_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("RTS_NO_NATIVE"):
            # Diagnostics/bisection: force the pure-NumPy fallbacks.
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i64, i32, f64, ch = (
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_char_p,
        )
        lib.rts_icosphere_counts.argtypes = [ctypes.c_int, i64, i64]
        lib.rts_icosphere.argtypes = [ctypes.c_int] + [ctypes.c_double] * 4 + [f64, i32, f64]
        lib.rts_count_triplets.argtypes = [ch]
        lib.rts_count_triplets.restype = ctypes.c_int64
        lib.rts_load_triplets.argtypes = [ch, ctypes.c_int64, f64]
        lib.rts_morton_order.argtypes = [f64, ctypes.c_int64, i64]
        lib.rts_flatten.argtypes = [f64, i32, ctypes.c_int64, ctypes.c_void_p, f64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def icosphere(subdivs: int, radius: float, yaw=0.0, pitch=0.0, roll=0.0):
    """(verts [V,3], tris [T,3], normals [V,3]) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    nv, nt = ctypes.c_int64(), ctypes.c_int64()
    if lib.rts_icosphere_counts(subdivs, ctypes.byref(nv), ctypes.byref(nt)):
        return None
    verts = np.empty((nv.value, 3))
    tris = np.empty((nt.value, 3), np.int32)
    normals = np.empty((nv.value, 3))
    rc = lib.rts_icosphere(
        subdivs, float(radius), float(yaw), float(pitch), float(roll),
        _ptr(verts, ctypes.c_double), _ptr(tris, ctypes.c_int32), _ptr(normals, ctypes.c_double),
    )
    return None if rc else (verts, tris, normals)


def load_triplets(path: str):
    """[N, 3] float64 from a whitespace/comma text file, or None."""
    lib = _load()
    if lib is None:
        return None
    n = lib.rts_count_triplets(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, 3))
    if lib.rts_load_triplets(path.encode(), n, _ptr(out, ctypes.c_double)):
        raise IOError(f"parse error in {path}")
    return out


def morton_order(tri_verts: np.ndarray):
    """Morton permutation of [T,3,3] triangle soup, or None."""
    lib = _load()
    if lib is None:
        return None
    tv = np.ascontiguousarray(tri_verts, np.float64)
    t = tv.shape[0]
    perm = np.empty(t, np.int64)
    lib.rts_morton_order(_ptr(tv, ctypes.c_double), t, _ptr(perm, ctypes.c_int64))
    return perm


def flatten(verts: np.ndarray, tris: np.ndarray, perm: np.ndarray | None = None):
    """Gather corners [T,3,3] (optionally permuted), or None."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float64)
    tr = np.ascontiguousarray(tris, np.int32)
    t = tr.shape[0]
    out = np.empty((t, 3, 3))
    p = None
    if perm is not None:
        p = np.ascontiguousarray(perm, np.int64)
    lib.rts_flatten(
        _ptr(v, ctypes.c_double),
        _ptr(tr, ctypes.c_int32),
        t,
        p.ctypes.data_as(ctypes.c_void_p) if p is not None else None,
        _ptr(out, ctypes.c_double),
    )
    return out
