"""ctypes bindings for the native IO/geometry library (native/sdpgs_io.cc),
with transparent build-on-first-use and pure-Python fallbacks.

The reference leans on native host code for the same roles (simple-knn CUDA,
open3d downsampling, cv2 connected components); here the TPU compute path is
Pallas and these cover the host-side hot paths.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsdpgs_io.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["sh", str(_NATIVE_DIR / "build.sh")],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        c = ctypes.c_longlong
        dp = np.ctypeslib.ndpointer(np.float64, flags="C")
        fp = np.ctypeslib.ndpointer(np.float32, flags="C")
        lp = np.ctypeslib.ndpointer(np.int64, flags="C")
        ip = np.ctypeslib.ndpointer(np.int32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        lib.colmap_points3d_count.restype = c
        lib.colmap_points3d_count.argtypes = [ctypes.c_char_p]
        lib.colmap_points3d_parse.restype = c
        lib.colmap_points3d_parse.argtypes = [
            ctypes.c_char_p, dp, dp, dp, c, ctypes.c_void_p, c, ctypes.c_void_p
        ]
        lib.voxel_downsample.restype = c
        lib.voxel_downsample.argtypes = [fp, fp, c, ctypes.c_float, fp, fp]
        lib.connected_components.restype = ctypes.c_int
        lib.connected_components.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ip]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_points3d(path, with_tracks: bool = False):
    """Fast points3D.bin parse -> (xyz, rgb, err[, obs]) where obs is
    [M, 3] (point_idx, image_id, kp_idx). Falls back to the Python parser."""
    lib = _load()
    if lib is None:
        from sdpgs_tpu.data import colmap

        if with_tracks:
            raise RuntimeError("track parsing requires the native library")
        return colmap.read_points3D_binary(path)

    n = lib.colmap_points3d_count(str(path).encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.float64)
    err = np.empty((n,), np.float64)
    if with_tracks:
        max_obs = max(n * 8, 1)
        obs = np.empty((max_obs, 3), np.int64)
        n_obs = np.zeros((1,), np.int64)
        got = lib.colmap_points3d_parse(
            str(path).encode(), xyz, rgb, err, n,
            obs.ctypes.data_as(ctypes.c_void_p), max_obs,
            n_obs.ctypes.data_as(ctypes.c_void_p),
        )
        assert got == n, (got, n)
        return xyz, rgb, err, obs[: int(n_obs[0])]
    got = lib.colmap_points3d_parse(
        str(path).encode(), xyz, rgb, err, n, None, 0, None
    )
    assert got == n, (got, n)
    return xyz, rgb, err


def voxel_downsample(points: np.ndarray, colors: np.ndarray, voxel: float
                     ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        from sdpgs_tpu.pipelines.fusion import voxel_downsample as py_vd

        return py_vd(points, colors, voxel)
    pts = np.ascontiguousarray(points, np.float32)
    cols = np.ascontiguousarray(colors, np.float32)
    out_p = np.empty_like(pts)
    out_c = np.empty_like(cols)
    m = lib.voxel_downsample(pts, cols, len(pts), voxel, out_p, out_c)
    return out_p[:m].copy(), out_c[:m].copy()


def connected_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        from sdpgs_tpu.pipelines.depth_align import _connected_components

        return _connected_components(mask)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    labels = np.empty(m.shape, np.int32)
    n = lib.connected_components(m, m.shape[0], m.shape[1], labels)
    return labels, n
