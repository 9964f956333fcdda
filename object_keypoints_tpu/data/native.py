"""ctypes bindings for the C++ host data plane (native/okt_native.cpp).

Auto-builds libokt_native.so with g++ on first import when a compiler is
available; every entry point has a pure-numpy fallback so the package works
without native code (mirroring how the reference checks in prebuilt .so
files but can rebuild them, SURVEY.md §2.4 L0).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libokt_native.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and (_NATIVE_DIR / "okt_native.cpp").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _lib = False
        return _lib

    lib.okt_splat_gaussian.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    lib.okt_add_discrete_kernel.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.okt_normalize_image.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.okt_fill_discs.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float,
    ]
    _lib = lib
    return _lib


def have_native() -> bool:
    return bool(_load())


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def splat_gaussian(target: np.ndarray, points: np.ndarray,
                   length_scale: float = 2.0, window_radius: int = 8) -> np.ndarray:
    """In-place additive sub-pixel gaussian splat (host).

    Same semantics as data.targets.splat_gaussian on device / the
    reference's numba _set_keypoints (video.py:44-55).
    """
    target = np.ascontiguousarray(target, np.float32)
    pts = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib:
        lib.okt_splat_gaussian(
            _fptr(target), target.shape[0], target.shape[1], _fptr(pts),
            len(pts), ctypes.c_float(length_scale), window_radius,
        )
        return target
    # numpy fallback
    h, w = target.shape
    for px, py in pts:
        ix, iy = int(px), int(py)
        x0, x1 = max(ix - window_radius, 0), min(ix + window_radius + 1, w)
        y0, y1 = max(iy - window_radius, 0), min(iy + window_radius + 1, h)
        if x1 <= x0 or y1 <= y0:
            continue
        ys, xs = np.mgrid[y0:y1, x0:x1]
        target[y0:y1, x0:x1] += np.exp(
            -((xs - px) ** 2 + (ys - py) ** 2) / length_scale**2
        )
    return target


def add_discrete_kernel(target: np.ndarray, kernel: np.ndarray,
                        points: np.ndarray, center: int) -> np.ndarray:
    """In-place rounded kernel paste; native-accelerated version of
    data.targets.add_discrete_kernel."""
    target = np.ascontiguousarray(target, np.float32)
    lib = _load()
    if lib:
        kern = np.ascontiguousarray(kernel, np.float32)
        pts = np.ascontiguousarray(points, np.float32)
        lib.okt_add_discrete_kernel(
            _fptr(target), target.shape[0], target.shape[1],
            _fptr(kern), kern.shape[0], center, _fptr(pts), len(pts),
        )
        return target
    from object_keypoints_tpu.data.targets import add_discrete_kernel as np_impl

    return np_impl(target, kernel, points, center)


def normalize_image(image_u8: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """uint8 HWC -> normalized float32 HWC in one fused pass."""
    image_u8 = np.ascontiguousarray(image_u8, np.uint8)
    lib = _load()
    if lib:
        out = np.empty(image_u8.shape, np.float32)
        m = np.ascontiguousarray(mean, np.float32)
        s = np.ascontiguousarray(std, np.float32)
        lib.okt_normalize_image(
            image_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(out),
            image_u8.shape[0] * image_u8.shape[1], _fptr(m), _fptr(s),
        )
        return out
    return (image_u8.astype(np.float32) / 255.0 - mean) / std


def fill_discs(target: np.ndarray, points: np.ndarray, values: np.ndarray,
               radius: float) -> np.ndarray:
    """In-place disc overwrite for depth/center fields. target: (C, H, W);
    values: (N, C)."""
    target = np.ascontiguousarray(target, np.float32)
    pts = np.ascontiguousarray(points, np.float32)
    vals = np.ascontiguousarray(values, np.float32)
    lib = _load()
    if lib:
        c, h, w = target.shape
        lib.okt_fill_discs(
            _fptr(target), h, w, c, _fptr(pts), _fptr(vals), len(pts),
            ctypes.c_float(radius),
        )
        return target
    c, h, w = target.shape
    ys, xs = np.mgrid[0:h, 0:w]
    cx, cy = xs + 0.5, ys + 0.5
    for (px, py), val in zip(pts, vals):
        within = (px - cx) ** 2 + (py - cy) ** 2 < radius**2
        for ch in range(c):
            target[ch][within] = val[ch]
    return target
