"""Color-space transforms with skimage/ITU-R BT.601 constants, jittable.

The reference scores on the Y channel of skimage ``rgb2ycbcr``
(scorpath.py:26-31,190-191) and carries alternative colorimetry helpers
(rgb2ycbcrTORCH at scorpath.py:40-46 uses the same 65.481/128.553/24.966
coefficients).  These run on device so the eval harness never leaves HBM.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rgb2ycbcr", "ycbcr2rgb", "rgb2y", "im2double", "im2double_minmax"]

# ITU-R BT.601 "full-range RGB -> studio-range YCbCr" matrix, as used by
# skimage.color.rgb2ycbcr (inputs scaled to [0, 1]).
_RGB2YCBCR = jnp.asarray(
    [
        [65.481, 128.553, 24.966],
        [-37.797, -74.203, 112.0],
        [112.0, -93.786, -18.214],
    ],
    dtype=jnp.float32,
)
_YCBCR_OFFSET = jnp.asarray([16.0, 128.0, 128.0], dtype=jnp.float32)


def im2double(x: jnp.ndarray) -> jnp.ndarray:
    """Reference ``im2double`` (PSNR.py:93-98): scale 0..255 data to 0..1 floats."""
    return x.astype(jnp.float32) / 255.0


def im2double_minmax(x: jnp.ndarray) -> jnp.ndarray:
    """Reference ``im2doubleZ`` (PSNR.py:87-91): min-max normalise to [0, 1]."""
    xf = x.astype(jnp.float32)
    lo = jnp.min(xf)
    hi = jnp.max(xf)
    return (xf - lo) / (hi - lo)


def rgb2ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB (uint8 or float 0..255) -> YCbCr floats, Y in [16, 235].

    Matches skimage.color.rgb2ycbcr on uint8 input (which first maps to
    [0, 1]); keeps float32 throughout.
    """
    x = rgb.astype(jnp.float32) / 255.0
    return jnp.einsum("...c,kc->...k", x, _RGB2YCBCR) + _YCBCR_OFFSET


def rgb2y(rgb: jnp.ndarray) -> jnp.ndarray:
    """Just the luma channel (the NTIRE scoring channel, scorpath.py:190-191)."""
    x = rgb.astype(jnp.float32) / 255.0
    return jnp.einsum("...c,c->...", x, _RGB2YCBCR[0]) + 16.0


def ycbcr2rgb(ycbcr: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb2ycbcr`; returns RGB floats in 0..255 (unclipped)."""
    import numpy as np

    inv = jnp.asarray(
        np.linalg.inv(np.asarray(_RGB2YCBCR, np.float64)) * 255.0, dtype=jnp.float32
    )
    x = ycbcr.astype(jnp.float32) - _YCBCR_OFFSET
    return jnp.einsum("...c,kc->...k", x, inv)
