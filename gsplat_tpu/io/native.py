"""ctypes bindings for the native C++ host runtime (native/gsplat_native.cpp).

Every entry point has a pure-Python fallback; ``available()`` reports whether
the shared library was built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import functools
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libgsplat_native.so"


@functools.lru_cache(maxsize=1)
def _lib():
    if not _LIB_PATH.is_file():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.gsplat_count_points3d.restype = ctypes.c_longlong
    lib.gsplat_count_points3d.argtypes = [ctypes.c_char_p]
    lib.gsplat_parse_points3d.restype = ctypes.c_longlong
    lib.gsplat_parse_points3d.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.gsplat_knn_mean_dist.restype = ctypes.c_int
    lib.gsplat_knn_mean_dist.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_longlong, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gsplat_save_ply.restype = ctypes.c_int
    lib.gsplat_save_ply.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_points3d(path: str | Path):
    """Fast points3D.bin parse. Returns (xyz f64 (N,3), rgb u8 (N,3),
    error f64 (N,), ids u64 (N,)) or None if the native lib is absent."""
    lib = _lib()
    if lib is None:
        return None
    n = lib.gsplat_count_points3d(str(path).encode())
    if n < 0:
        raise OSError(f"Could not open file {path}")
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    ids = np.empty((n,), np.uint64)
    got = lib.gsplat_parse_points3d(
        str(path).encode(), n,
        _ptr(xyz, ctypes.c_double), _ptr(rgb, ctypes.c_uint8),
        _ptr(err, ctypes.c_double), _ptr(ids, ctypes.c_uint64),
    )
    if got != n:
        raise OSError(f"Corrupt points3D file {path}")
    return xyz, rgb, err, ids


def knn_mean_dist(xyz: np.ndarray, k: int = 3):
    """Mean distance to k nearest neighbors, or None if lib absent."""
    lib = _lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float64)
    out = np.empty((xyz.shape[0],), np.float32)
    rc = lib.gsplat_knn_mean_dist(
        _ptr(xyz, ctypes.c_double), xyz.shape[0], k, _ptr(out, ctypes.c_float)
    )
    if rc != 0:
        raise RuntimeError("knn_mean_dist failed")
    return out


def save_ply(path, xyz, rgb, opacity, scale, quat, sh=None) -> bool:
    lib = _lib()
    if lib is None:
        return False
    n = xyz.shape[0]
    xyz = np.ascontiguousarray(xyz, np.float32)
    rgb = np.ascontiguousarray(rgb, np.float32)
    opacity = np.ascontiguousarray(opacity, np.float32).reshape(-1)
    scale = np.ascontiguousarray(scale, np.float32)
    norm = np.linalg.norm(quat, axis=1, keepdims=True)
    quat = np.ascontiguousarray(
        quat / np.where(norm > 0, norm, 1.0), np.float32
    )
    num_sh = 0
    sh_ptr = _ptr(np.empty(0, np.float32), ctypes.c_float)
    if sh is not None:
        sh = np.ascontiguousarray(sh, np.float32).reshape(n, -1)
        num_sh = sh.shape[1]
        sh_ptr = _ptr(sh, ctypes.c_float)
    rc = lib.gsplat_save_ply(
        str(path).encode(), n, num_sh,
        _ptr(xyz, ctypes.c_float), _ptr(rgb, ctypes.c_float),
        _ptr(opacity, ctypes.c_float), _ptr(scale, ctypes.c_float),
        _ptr(quat, ctypes.c_float), sh_ptr,
    )
    return rc == 0
