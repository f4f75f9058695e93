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
    _lib.vocab_count.restype = ctypes.c_int64
    _lib.vocab_count.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib.vocab_parse.restype = ctypes.c_int64
    _lib.vocab_parse.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
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


def parse_vocabulary_text(path: str, n_threads: int = 0):
    """Parse a DBoW2 text vocabulary (ORBvoc.txt format — the reference's
    slowest init step, System.cpp:38-39) with the native multi-threaded
    parser. Returns (k, L, parents[n] i32, is_leaf[n] bool, desc[n,32] u8,
    weights[n] f32), node 0 = implicit root; None if the library is absent
    (callers fall back to the Python parser)."""
    if _lib is None:
        return None
    k = ctypes.c_int()
    L = ctypes.c_int()
    n = _lib.vocab_count(path.encode(), ctypes.byref(k), ctypes.byref(L))
    if n < 0:
        raise FileNotFoundError(path)
    parents = np.empty(n + 1, np.int32)
    is_leaf = np.empty(n + 1, np.uint8)
    desc = np.zeros((n + 1, 32), np.uint8)
    weights = np.zeros(n + 1, np.float32)
    got = _lib.vocab_parse(
        path.encode(),
        parents[1:].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8p(is_leaf[1:]), _u8p(desc[1:]),
        _f32p(weights[1:]), n, n_threads,
    )
    if got < 0:
        raise FileNotFoundError(path)
    n = int(got)
    parents[0], is_leaf[0], weights[0] = -1, 0, 0.0
    end = n + 1
    return (
        int(k.value), int(L.value),
        parents[:end], is_leaf[:end].astype(bool), desc[:end], weights[:end],
    )


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
