"""Native (C++) host-side accelerators, compiled on demand via g++ + ctypes.

Python fallbacks exist for every entry point; this package only speeds up
host-side preprocessing that scales with mesh size (million-triangle
FESOM/ICON grids). The shared library is compiled once per environment and
cached next to the source (or in a temp dir if the package is read-only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

__all__ = ["build_face_adjacency", "get_lib", "rasterize_faces"]

_SRC = os.path.join(os.path.dirname(__file__), "ux_native.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _compile() -> str | None:
    sodir = os.path.dirname(__file__)
    sopath = os.path.join(sodir, "_ux_native.so")
    if os.path.exists(sopath) and os.path.getmtime(sopath) >= os.path.getmtime(_SRC):
        return sopath
    if not os.access(sodir, os.W_OK):
        sopath = os.path.join(tempfile.gettempdir(), "parcels_tpu_ux_native.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", sopath]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return sopath


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.build_face_adjacency.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.build_face_adjacency.restype = None
        lib.rasterize_faces.argtypes = [
            f64p, f64p, i32p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, i32p,
        ]
        lib.rasterize_faces.restype = None
        _LIB = lib
        return _LIB


def build_face_adjacency(conn: np.ndarray) -> np.ndarray | None:
    """Edge-neighbor table via the native path; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    adj = np.empty_like(conn)
    lib.build_face_adjacency(conn, conn.shape[0], adj)
    return adj


def rasterize_faces(
    node_lon: np.ndarray,
    node_lat: np.ndarray,
    conn: np.ndarray,
    lat_min: float,
    lon_min: float,
    step_y: float,
    step_x: float,
    ny: int,
    nx: int,
) -> np.ndarray | None:
    """Exact face-coverage raster via the native path; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tbl = np.full((ny, nx), -1, dtype=np.int32)
    lib.rasterize_faces(
        np.ascontiguousarray(node_lon, dtype=np.float64),
        np.ascontiguousarray(node_lat, dtype=np.float64),
        np.ascontiguousarray(conn, dtype=np.int32),
        conn.shape[0],
        float(lat_min), float(lon_min), float(step_y), float(step_x),
        int(ny), int(nx), tbl,
    )
    return tbl
