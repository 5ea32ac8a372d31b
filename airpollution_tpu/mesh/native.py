"""ctypes bridge to the native C++ mesh-topology kernel.

The reference's native meshing lives in the gmsh C++ kernel (crbe.py:14-44);
this framework's counterpart is ``native/mesh_topology.cpp``: the
first-encounter edge enumeration (crbe.py:109-131 contract) as an O(n)
hash-table pass. The library is built on demand with the system toolchain
(``make`` in ``native/``), loaded via ctypes (no pybind11 in this
environment), and the vectorized numpy path in
``airpollution_tpu.mesh.topology`` is the always-available fallback —
set ``APT_NATIVE=0`` to force it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libmeshtopo.so")


def _load() -> ctypes.CDLL | None:
    """Build (if needed) and load the native library; None on any failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("APT_NATIVE", "1") == "0":
            return None
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.enumerate_edges.restype = ctypes.c_int64
            lib.enumerate_edges.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def enumerate_edges_native(triangles: np.ndarray, n_points: int):
    """Native edge enumeration; returns (segments, triangle_to_segments)
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles, dtype=np.int32)
    n_tri = tris.shape[0]
    tri_to_seg = np.empty((n_tri, 3), dtype=np.int32)
    segments = np.empty((3 * n_tri, 2), dtype=np.int32)
    n_seg = ctypes.c_int64(0)
    rc = lib.enumerate_edges(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_tri, int(n_points),
        tri_to_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        segments.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(n_seg),
    )
    if rc != 0:
        raise ValueError(f"native enumerate_edges failed with code {rc}")
    return segments[: n_seg.value].copy(), tri_to_seg
