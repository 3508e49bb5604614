"""ctypes bindings for the native IO runtime (native/iek_io.cpp).

API mirrors data/io.py: ``imread(path) -> RGB uint8 | None``,
``imwrite(path, arr) -> bool``, plus ``imread_batch(paths, threads)`` for the
threaded directory loader and ``gather_patches`` for the training sampler's
host hot loop.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

__all__ = ["available", "imread", "imwrite", "imread_batch", "gather_patches"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "lib", "libiek_io.so")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.iek_imread.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.iek_imread.restype = ctypes.c_int
    lib.iek_imwrite.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int]
    lib.iek_imwrite.restype = ctypes.c_int
    lib.iek_free.argtypes = [u8p]
    lib.iek_imread_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.iek_imread_batch.restype = ctypes.c_int
    lib.iek_gather_patches.argtypes = [
        u8p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_int,
        u8p,
    ]
    lib.iek_gather_patches.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def _take(lib, ptr, h, w) -> np.ndarray:
    buf = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * (h * w * 3))).contents
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3).copy()
    lib.iek_free(ptr)
    return arr


def imread(path: str) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.iek_imread(os.fsencode(path), ctypes.byref(out), ctypes.byref(h),
                        ctypes.byref(w))
    if rc != 0:
        return None
    return _take(lib, out, h.value, w.value)


def imwrite(path: str, arr: np.ndarray) -> bool:
    lib = _lib()
    if lib is None:
        return False
    arr = np.asarray(arr)
    if arr.ndim != 3 or arr.shape[2] != 3:
        return False
    if arr.dtype != np.uint8:
        # mirror data/io.py: clip+round, never a wrap-around cast
        arr = np.clip(np.round(arr.astype(np.float32)), 0, 255)
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return lib.iek_imwrite(os.fsencode(path), ptr, arr.shape[0], arr.shape[1]) == 0


def imread_batch(paths: list[str], threads: int = 8) -> list[np.ndarray | None]:
    """Decode many files concurrently in native threads (GIL released)."""
    lib = _lib()
    if lib is None:
        return [imread(p) for p in paths]
    n = len(paths)
    if n == 0:
        return []
    u8p = ctypes.POINTER(ctypes.c_uint8)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    outs = (u8p * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    rcs = (ctypes.c_int * n)()
    lib.iek_imread_batch(c_paths, n, threads, outs, hs, ws, rcs)
    result: list[np.ndarray | None] = []
    for i in range(n):
        if rcs[i] == 0:
            result.append(_take(lib, outs[i], hs[i], ws[i]))
        else:
            result.append(None)
    return result


def gather_patches(img: np.ndarray, ys: np.ndarray, xs: np.ndarray, p: int) -> np.ndarray:
    """(H,W,3) uint8 + corner lists -> (N,p,p,3) uint8 via native memcpy.

    Corners must lie in [0, H-p] x [0, W-p]; out-of-range corners raise
    (the C side also clamps defensively, so stale binaries can't overread).
    """
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        # the C side assumes a W*3 row stride: grayscale would overread 3x,
        # RGBA would silently return wrong pixels
        raise ValueError(f"gather_patches needs (H, W, 3) uint8, got {img.shape}")
    h, w = img.shape[:2]
    ys = np.asarray(ys, np.int64)
    xs = np.asarray(xs, np.int64)
    if len(ys) != len(xs):
        raise ValueError(f"len(ys)={len(ys)} != len(xs)={len(xs)}")
    if p <= 0 or p > h or p > w:
        raise ValueError(f"patch {p} does not fit a {h}x{w} image")
    if len(ys) and (
        ys.min() < 0 or xs.min() < 0 or ys.max() > h - p or xs.max() > w - p
    ):
        raise ValueError(
            f"patch corners out of range for {h}x{w} image with p={p}"
        )
    lib = _lib()
    n = len(ys)
    if n == 0:
        return np.empty((0, p, p, 3), np.uint8)  # both paths agree on empty
    if lib is None:
        return np.stack([img[y : y + p, x : x + p] for y, x in zip(ys, xs)])
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((n, p, p, 3), np.uint8)
    ys_c = (ctypes.c_int * n)(*[int(v) for v in ys])
    xs_c = (ctypes.c_int * n)(*[int(v) for v in xs])
    lib.iek_gather_patches(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0],
        img.shape[1],
        ys_c,
        xs_c,
        n,
        p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
