"""Native (C++) host-side extensions, loaded via ctypes.

Built on demand with g++ (no pybind11 dependency); falls back cleanly to the
numpy implementations if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, '_voxelizer.so')
_SRC_PATH = os.path.join(_DIR, 'voxelizer.cpp')
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC',
             '-o', _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.voxelize.restype = ctypes.c_int32
        lib.voxelize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.majority_labels.restype = None
        lib.majority_labels.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def native_points_to_voxel(points: np.ndarray, voxel_size, coors_range,
                           max_voxels: int | None = None):
    """C++ voxelization; same contract as core.voxelizer.points_to_voxel."""
    lib = get_lib()
    assert lib is not None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    vs = np.ascontiguousarray(voxel_size, dtype=np.float32)
    rg = np.ascontiguousarray(coors_range, dtype=np.float32)
    gs = np.round((rg[3:] - rg[:3]) / vs).astype(np.int64)
    n = pts.shape[0]
    cap = int(max_voxels) if max_voxels else n
    ids = np.empty(n, np.int32)
    coords = np.empty((cap, 3), np.int32)
    m = lib.voxelize(_fptr(pts), n, pts.shape[1], _fptr(vs), _fptr(rg),
                     int(gs[0]), int(gs[1]), int(gs[2]),
                     _iptr(ids), _iptr(coords), cap)
    return coords[:m].copy(), ids


def native_majority_labels(point_voxel_ids, point_labels, num_voxels,
                           ignore_index=255):
    lib = get_lib()
    assert lib is not None
    ids = np.ascontiguousarray(point_voxel_ids, dtype=np.int32)
    labels = np.ascontiguousarray(point_labels, dtype=np.int64)
    out = np.full(num_voxels, ignore_index, np.int32)
    lib.majority_labels(_iptr(ids),
                        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                        ids.shape[0], num_voxels, ignore_index, _iptr(out))
    return out


def available() -> bool:
    return get_lib() is not None
