"""ctypes bindings for the native C++ components (built via make).

`PointStore` wraps native/pointstore: the host-side incremental voxel-hash
point cloud with KNN (TPU-native equivalent of the reference's iVox inside
the `svo` extension — SURVEY.md N2). Used by the optional point-feature
render path and by mesh cleaning; the *device* voxel feature map lives in
`ops/voxel_hash.py`.

The library is auto-built on first use if g++ is available; everything
degrades gracefully (callers check `native_available()`).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                "native", "pointstore")
_LIB_PATH = osp.join(_DIR, "libpointstore.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ps_create.restype = ctypes.c_void_p
    lib.ps_create.argtypes = [ctypes.c_float, ctypes.c_int64, ctypes.c_int32]
    lib.ps_destroy.argtypes = [ctypes.c_void_p]
    lib.ps_num_voxels.restype = ctypes.c_int64
    lib.ps_num_voxels.argtypes = [ctypes.c_void_p]
    lib.ps_num_dropped.restype = ctypes.c_int64
    lib.ps_num_dropped.argtypes = [ctypes.c_void_p]
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ps_insert.argtypes = [ctypes.c_void_p, ctypes.c_int64, f32p, f32p]
    lib.ps_knn.argtypes = [ctypes.c_void_p, ctypes.c_int64, f32p,
                           ctypes.c_int32, f32p, f32p, f32p]
    lib.ps_export_voxels.argtypes = [ctypes.c_void_p, f32p]
    lib.ps_export_points.argtypes = [ctypes.c_void_p, f32p, f32p, i32p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class PointStore:
    """Voxel-hash point cloud: bounded points/voxel, 3^3-neighborhood KNN."""

    def __init__(self, voxel_size: float, max_voxels: int = 1 << 17,
                 points_per_voxel: int = 10):
        lib = _load()
        if lib is None:
            raise RuntimeError("native pointstore unavailable (g++ build failed)")
        self._lib = lib
        self.points_per_voxel = points_per_voxel
        self._h = ctypes.c_void_p(lib.ps_create(
            ctypes.c_float(voxel_size), max_voxels, points_per_voxel))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ps_destroy(self._h)
            self._h = None

    @property
    def num_voxels(self) -> int:
        return int(self._lib.ps_num_voxels(self._h))

    @property
    def num_dropped(self) -> int:
        return int(self._lib.ps_num_dropped(self._h))

    def insert(self, xyz: np.ndarray, rgb: Optional[np.ndarray] = None):
        xyz = np.ascontiguousarray(xyz, dtype=np.float32)
        n = len(xyz)
        rgb_p = _fptr(np.ascontiguousarray(rgb, np.float32)) \
            if rgb is not None else None
        self._lib.ps_insert(self._h, n, _fptr(xyz), rgb_p)

    def knn(self, xyz: np.ndarray, k: int
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (neighbors (N, k, 3), colors (N, k, 3), dist2 (N, k); -1 pad)."""
        xyz = np.ascontiguousarray(xyz, dtype=np.float32)
        n = len(xyz)
        out_xyz = np.empty((n, k, 3), np.float32)
        out_rgb = np.empty((n, k, 3), np.float32)
        out_d2 = np.empty((n, k), np.float32)
        self._lib.ps_knn(self._h, n, _fptr(xyz), k, _fptr(out_xyz),
                         _fptr(out_rgb), _fptr(out_d2))
        return out_xyz, out_rgb, out_d2

    def voxel_centers(self) -> np.ndarray:
        out = np.empty((self.num_voxels, 3), np.float32)
        if len(out):
            self._lib.ps_export_voxels(self._h, _fptr(out))
        return out

    def export_points(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (xyz (V, ppv, 3), rgb (V, ppv, 3), counts (V,))."""
        v = self.num_voxels
        ppv = self.points_per_voxel
        xyz = np.zeros((v, ppv, 3), np.float32)
        rgb = np.zeros((v, ppv, 3), np.float32)
        counts = np.zeros((v,), np.int32)
        if v:
            self._lib.ps_export_points(
                self._h, _fptr(xyz), _fptr(rgb),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return xyz, rgb, counts
