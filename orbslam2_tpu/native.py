"""ctypes bindings for the native preprocessing runtime (native/).

Loads liborbslam2_tpu_native.so when built (cmake -S native -B
native/build && cmake --build native/build); every entry point has a
numpy fallback so pure-Python environments keep working.
"""

from __future__ import annotations

import ctypes
import os
import numpy as np

_LIB_PATHS = [
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "build", "liborbslam2_tpu_native.so",
    ),
]

_lib = None
for p in _LIB_PATHS:
    if os.path.exists(p):
        try:
            _lib = ctypes.CDLL(p)
            break
        except OSError:
            pass

if _lib is not None:
    _lib.remap_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    _lib.remap_bilinear_async.restype = ctypes.c_uint64
    _lib.remap_bilinear_async.argtypes = _lib.remap_bilinear.argtypes
    _lib.preprocess_wait.argtypes = [ctypes.c_uint64]
    _lib.preprocess_init.argtypes = [ctypes.c_int]
    _lib.to_grayscale.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]


def available() -> bool:
    return _lib is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def remap_bilinear(
    src: np.ndarray, mapx: np.ndarray, mapy: np.ndarray
) -> np.ndarray:
    """uint8 [sh,sw] + float32 maps [dh,dw] -> float32 [dh,dw]."""
    src = np.ascontiguousarray(src, np.uint8)
    mapx = np.ascontiguousarray(mapx, np.float32)
    mapy = np.ascontiguousarray(mapy, np.float32)
    dh, dw = mapx.shape
    dst = np.empty((dh, dw), np.float32)
    if _lib is not None:
        _lib.remap_bilinear(
            _u8p(src), src.shape[0], src.shape[1],
            _f32p(mapx), _f32p(mapy), _f32p(dst), dh, dw,
        )
        return dst
    # numpy fallback
    x0 = np.floor(mapx).astype(np.int32)
    y0 = np.floor(mapy).astype(np.int32)
    inb = (mapx >= 0) & (mapy >= 0) & (x0 < src.shape[1] - 1) & (y0 < src.shape[0] - 1)
    x0c = np.clip(x0, 0, src.shape[1] - 2)
    y0c = np.clip(y0, 0, src.shape[0] - 2)
    ax = mapx - x0
    ay = mapy - y0
    s = src.astype(np.float32)
    v = (1 - ay) * ((1 - ax) * s[y0c, x0c] + ax * s[y0c, x0c + 1]) + ay * (
        (1 - ax) * s[y0c + 1, x0c] + ax * s[y0c + 1, x0c + 1]
    )
    return np.where(inb, v, 0.0).astype(np.float32)


class AsyncRemap:
    """Pipelined rectification: submit() returns immediately, the worker
    pool rectifies while the caller decodes the next frame / dispatches to
    the device. Falls back to synchronous numpy when the library is absent."""

    def __init__(self, n_threads: int = 4):
        if _lib is not None:
            _lib.preprocess_init(n_threads)

    def submit(self, src: np.ndarray, mapx: np.ndarray, mapy: np.ndarray):
        src = np.ascontiguousarray(src, np.uint8)
        mapx = np.ascontiguousarray(mapx, np.float32)
        mapy = np.ascontiguousarray(mapy, np.float32)
        dh, dw = mapx.shape
        dst = np.empty((dh, dw), np.float32)
        if _lib is None:
            dst[:] = remap_bilinear(src, mapx, mapy)
            return (None, dst, (src, mapx, mapy))
        job = _lib.remap_bilinear_async(
            _u8p(src), src.shape[0], src.shape[1],
            _f32p(mapx), _f32p(mapy), _f32p(dst), dh, dw,
        )
        # keep references alive until wait()
        return (job, dst, (src, mapx, mapy))

    def wait(self, handle) -> np.ndarray:
        job, dst, _refs = handle
        if job is not None:
            _lib.preprocess_wait(job)
        return dst


def to_grayscale(src: np.ndarray, bgr: bool = True) -> np.ndarray:
    """uint8 [h,w] | [h,w,3] | [h,w,4] -> float32 [h,w] grayscale."""
    if src.ndim == 2:
        ch = 1
    else:
        ch = src.shape[2]
    src = np.ascontiguousarray(src, np.uint8)
    h, w = src.shape[:2]
    if _lib is not None:
        dst = np.empty((h, w), np.float32)
        _lib.to_grayscale(_u8p(src), h, w, ch, int(bgr), _f32p(dst))
        return dst
    if ch == 1:
        return src.astype(np.float32)
    wts = np.array([0.114, 0.587, 0.299] if bgr else [0.299, 0.587, 0.114])
    return (src[..., :3] @ wts).astype(np.float32)
