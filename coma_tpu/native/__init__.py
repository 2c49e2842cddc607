"""Native (C++) runtime components, loaded via ctypes.

Mirrors the reference's native surface (SURVEY.md §2.5: Open3D poisson-disk
sampling, Blender mesh booleans) with in-tree C++ compiled on first use
(g++ -O3; no pybind11 in this image — plain C ABI + ctypes). Every entry
point has a pure-Python fallback, so the framework works without a
toolchain; the native path is ~50-100x faster for the offline prep stages.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "coma_native.cpp")
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        with open(_SRC, "rb") as fh:
            digest = hashlib.sha1(fh.read()).hexdigest()[:12]
        cache_dir = os.path.expanduser("~/.cache/coma_tpu/native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"coma_native_{digest}.so")
        if not os.path.exists(so_path):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.poisson_eliminate.restype = ctypes.c_int
        lib.poisson_eliminate.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.points_inside_mesh.restype = None
        lib.points_inside_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def poisson_eliminate(points: np.ndarray, n_target: int, total_area: float) -> np.ndarray:
    """Native weighted sample elimination; returns kept indices.

    Semantics match ``coma_tpu.geometry.sampling.poisson_disk_eliminate``.
    """
    lib = _build_and_load()
    assert lib is not None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    keep = np.zeros(len(pts), dtype=np.uint8)
    n = lib.poisson_eliminate(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts), int(n_target), float(total_area),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert n == n_target, f"native elimination kept {n}, wanted {n_target}"
    return np.flatnonzero(keep)


def points_inside_mesh(points: np.ndarray, verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Native ray-parity inside test; returns (P,) bool."""
    lib = _build_and_load()
    assert lib is not None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    v = np.ascontiguousarray(verts, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.zeros(len(pts), dtype=np.uint8)
    lib.points_inside_mesh(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)
