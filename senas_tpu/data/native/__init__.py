"""ctypes bindings for the native data-pipeline kernels.

`lib()` returns the loaded shared object or None (every caller must keep a
numpy fallback — the extension is an optional accelerator, built with
`python -m senas_tpu.data.native.build`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "libsenas_native.so")
_lib = None
_tried = False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        return None
    try:
        so = ctypes.CDLL(_SO_PATH)
        so.curvature_flow.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int]
        so.gaussian_blur_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int]
        so.elastic_remap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int]
        _lib = so
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return lib() is not None


def curvature_flow(img: np.ndarray, t_step: float, n_iter: int) -> np.ndarray:
    so = lib()
    assert so is not None
    # copy: the kernel mutates its buffer in place and must not alias the
    # caller's array (ascontiguousarray is a no-op on contiguous float64)
    u = np.array(img, dtype=np.float64, order="C", copy=True)
    h, w = u.shape
    so.curvature_flow(u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      h, w, float(t_step), int(n_iter))
    return u


def elastic_remap(img: np.ndarray, mask: np.ndarray, dy: np.ndarray,
                  dx: np.ndarray):
    so = lib()
    assert so is not None
    h, w = img.shape[:2]
    img_c = np.ascontiguousarray(img, dtype=np.float32)
    mask_c = np.ascontiguousarray(mask, dtype=np.uint8)
    dy_c = np.ascontiguousarray(dy, dtype=np.float32)
    dx_c = np.ascontiguousarray(dx, dtype=np.float32)
    img_o = np.empty_like(img_c)
    mask_o = np.empty_like(mask_c)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    so.elastic_remap(img_c.ctypes.data_as(f32p), mask_c.ctypes.data_as(u8p),
                     dy_c.ctypes.data_as(f32p), dx_c.ctypes.data_as(f32p),
                     img_o.ctypes.data_as(f32p), mask_o.ctypes.data_as(u8p),
                     h, w)
    return img_o, mask_o
