"""Image file IO.

Decode order: the native C++ codec (image_enhance_keras_tpu.runtime, BMP/PPM,
multi-threaded directory loads) when built, else PIL, else a pure-NumPy
24/32-bit BMP codec.  All paths return RGB uint8 (H, W, 3) — the contract of
the reference's ``imread(mode='RGB')`` (models.py:212).
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["imread", "imwrite", "list_images"]

_IMG_EXTS = (".png", ".bmp", ".jpg", ".jpeg", ".ppm", ".tif", ".tiff", ".webp")


def list_images(path: str) -> list[str]:
    """Sorted image files directly inside a directory (main_dirpath.py:50)."""
    out = []
    for f in sorted(os.listdir(path)):
        if f.lower().endswith(_IMG_EXTS):
            out.append(os.path.join(path, f))
    return out


def _pil():
    try:
        from PIL import Image

        return Image
    except ImportError:  # pragma: no cover
        return None


def imread(path: str) -> np.ndarray:
    """Read an image file as RGB uint8 (H, W, 3)."""
    try:
        from image_enhance_keras_tpu.runtime import native_io

        arr = native_io.imread(path)
        if arr is not None:
            return arr
    except Exception:
        pass
    image_mod = _pil()
    if image_mod is not None:
        with image_mod.open(path) as im:
            return np.asarray(im.convert("RGB"))
    return _bmp_read(path)


def imwrite(path: str, arr: np.ndarray) -> None:
    """Write RGB uint8 (or float 0..255, clipped) to a file by extension."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
    try:
        from image_enhance_keras_tpu.runtime import native_io

        if native_io.imwrite(path, arr):
            return
    except Exception:
        pass
    image_mod = _pil()
    if image_mod is not None:
        image_mod.fromarray(arr).save(path)
        return
    if path.lower().endswith(".bmp"):
        _bmp_write(path, arr)
        return
    raise RuntimeError(f"no codec available for {path}")


# ---------------------------------------------------------------------------
# Pure-NumPy BMP fallback (24-bit uncompressed; BI_RGB)
# ---------------------------------------------------------------------------

def _bmp_read(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP file and no other codec available")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_sz = struct.unpack_from("<I", data, 14)[0]
    if hdr_sz < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    img = np.frombuffer(data, np.uint8, stride * h, pix_off).reshape(h, stride)
    img = img[:, : w * nb].reshape(h, w, nb)
    if flip:
        img = img[::-1]
    return img[..., 2::-1].copy()  # BGR(A) -> RGB


def _bmp_write(path: str, arr: np.ndarray) -> None:
    h, w = arr.shape[:2]
    bgr = arr[..., ::-1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pix = rows[::-1].tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(hdr + pix)
