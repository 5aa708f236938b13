"""ctypes bindings for the native host-pipeline library (native/fastpcd.cpp).

``load_pcd_into`` does parse + ego-mask + transform + range-crop in one C
pass, writing straight into the caller's fixed-capacity buffer (no
intermediate allocations). Falls back to the pure-python reader
(data/pcd.py) when the shared library is absent; ``ensure_built`` compiles
it on demand with make/g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastpcd.so")
_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libfastpcd.so if missing. Returns availability."""
    if os.path.isfile(_LIB_PATH):
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fastpcd_load.restype = ctypes.c_long
    lib.fastpcd_load.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def load_pcd_into(
    path: str,
    out: np.ndarray,
    *,
    transform: np.ndarray | None = None,
    lidar_range=None,
    ego_mask: float = 0.0,
) -> int:
    """Fill ``out`` (N, 4) float32 with processed points; returns the count.

    One native pass: NaN drop -> ego mask -> rigid transform -> range crop.
    Falls back to the python reader with equivalent numpy post-processing.
    """
    assert out.dtype == np.float32 and out.ndim == 2 and out.shape[1] == 4
    lib = _load()
    if lib is not None:
        t_ptr = None
        if transform is not None:
            t = np.ascontiguousarray(transform, np.float32)
            t_ptr = t.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        r_ptr = None
        if lidar_range is not None:
            r = np.ascontiguousarray(lidar_range, np.float32)
            r_ptr = r.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        n = lib.fastpcd_load(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.shape[0],
            t_ptr,
            r_ptr,
            ctypes.c_float(ego_mask),
        )
        if n >= 0:
            return int(n)
    # python fallback
    from airv2x_tpu.data.pcd import read_pcd
    from airv2x_tpu.utils.transforms import transform_points

    pts = read_pcd(path)
    if ego_mask > 0:
        keep = ~(
            (np.abs(pts[:, 0]) < ego_mask) & (np.abs(pts[:, 1]) < ego_mask)
        )
        pts = pts[keep]
    if transform is not None:
        pts = transform_points(pts, transform).astype(np.float32)
    if lidar_range is not None:
        lr = lidar_range
        keep = (
            (pts[:, 0] > lr[0]) & (pts[:, 0] < lr[3])
            & (pts[:, 1] > lr[1]) & (pts[:, 1] < lr[4])
            & (pts[:, 2] > lr[2]) & (pts[:, 2] < lr[5])
        )
        pts = pts[keep]
    n = min(len(pts), out.shape[0])
    out[:n] = pts[:n]
    return n


def load_pcd_label_into(
    path: str,
    out: np.ndarray,
    clean: np.ndarray,
    *,
    transform: np.ndarray | None = None,
    lidar_range=None,
    ego_mask: float = 0.0,
) -> int:
    """Like ``load_pcd_into`` but also extracts the V2X-R per-point weather
    label (green color channel; reference pcd_utils.pcd_to_np
    get_weather=True) — ``clean[i]`` is True where the point is real
    (label == 0, basedataset.py:358's ``de_lidar_np`` selection). Pure
    python: the label column only exists in the simulated-weather V2X-R
    clouds, which the MDD training path reads."""
    from airv2x_tpu.data.pcd import read_pcd
    from airv2x_tpu.utils.transforms import transform_points

    pts, label = read_pcd(path, return_label=True)
    if ego_mask > 0:
        keep = ~(
            (np.abs(pts[:, 0]) < ego_mask) & (np.abs(pts[:, 1]) < ego_mask)
        )
        pts, label = pts[keep], label[keep]
    if transform is not None:
        pts = transform_points(pts, transform).astype(np.float32)
    if lidar_range is not None:
        lr = lidar_range
        keep = (
            (pts[:, 0] > lr[0]) & (pts[:, 0] < lr[3])
            & (pts[:, 1] > lr[1]) & (pts[:, 1] < lr[4])
            & (pts[:, 2] > lr[2]) & (pts[:, 2] < lr[5])
        )
        pts, label = pts[keep], label[keep]
    n = min(len(pts), out.shape[0])
    out[:n] = pts[:n]
    clean[:n] = label[:n] == 0
    return n
