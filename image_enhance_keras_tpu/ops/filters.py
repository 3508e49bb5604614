"""Small separable convolution filters (VPU-friendly, jittable).

Parity targets from the reference data pipeline and metrics:
  * ``scipy.ndimage.gaussian_filter(sigma=0.5)`` degradation blur
    (reference img_utils.py:101),
  * ``scipy.misc.imfilter('sharpen')`` = PIL ImageFilter.SHARPEN
    (reference img_utils.py:74),
  * ``scipy.ndimage.uniform_filter`` — the window filter inside
    skimage's ``compare_ssim`` (used via ops.metrics.ssim).

All are depthwise ``lax.conv_general_dilated`` NHWC convs; boundary handling
mirrors scipy's default mode='reflect' (== np.pad mode='symmetric').
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["gaussian_blur", "uniform_filter", "sharpen_pil", "separable_filter2d"]


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Matches scipy.ndimage.gaussian_filter's discrete Gaussian."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return k.astype(np.float32)


def _to_nhwc(x: jnp.ndarray):
    if x.ndim == 2:
        return x[None, :, :, None], 2
    if x.ndim == 3:
        return x[None], 3
    if x.ndim == 4:
        return x, 4
    raise ValueError(f"expected 2D/3D/4D array, got {x.ndim}D")


def _from_nhwc(y: jnp.ndarray, ndim: int) -> jnp.ndarray:
    if ndim == 2:
        return y[0, :, :, 0]
    if ndim == 3:
        return y[0]
    return y


def _depthwise(x_nhwc: jnp.ndarray, kern_hw: np.ndarray) -> jnp.ndarray:
    """VALID depthwise conv of NHWC input with a (kh, kw) kernel."""
    c = x_nhwc.shape[-1]
    kh, kw = kern_hw.shape
    k = jnp.asarray(kern_hw, dtype=x_nhwc.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO with I=1 (grouped)
    # HIGHEST precision: these filters feed metrics (SSIM/PSNR parity), where
    # the default bf16-truncated conv path is not acceptable.
    return lax.conv_general_dilated(
        x_nhwc,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def separable_filter2d(
    x: jnp.ndarray,
    k_h: np.ndarray,
    k_w: np.ndarray | None = None,
    pad_mode: str = "symmetric",
) -> jnp.ndarray:
    """Apply a separable (k_h outer k_w) filter per channel with edge padding."""
    if k_w is None:
        k_w = k_h
    x_nhwc, ndim = _to_nhwc(x)
    # scipy origin-0 convention: an even-length kernel spans
    # [-(n//2), n - n//2 - 1], so pad n//2 before and (n-1)//2 after —
    # symmetric padding for odd kernels, and even sizes (uniform_filter
    # size=4, ssim win_size=4) keep the (H, W) output instead of growing
    rh, rw = len(k_h) // 2, len(k_w) // 2
    xp = jnp.pad(
        x_nhwc,
        ((0, 0), (rh, (len(k_h) - 1) // 2), (rw, (len(k_w) - 1) // 2), (0, 0)),
        mode=pad_mode,
    )
    y = _depthwise(xp, np.asarray(k_h, np.float32)[:, None])
    y = _depthwise(y, np.asarray(k_w, np.float32)[None, :])
    return _from_nhwc(y, ndim)


def gaussian_blur(x: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """scipy.ndimage.gaussian_filter parity over the spatial axes (per channel)."""
    if sigma <= 0:
        return x
    k = _gaussian_kernel1d(float(sigma), float(truncate))
    return separable_filter2d(x, k, k, pad_mode="symmetric")


def uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """scipy.ndimage.uniform_filter parity (mode='reflect') over spatial axes."""
    k = np.full((size,), 1.0 / size, dtype=np.float32)
    return separable_filter2d(x, k, k, pad_mode="symmetric")


# PIL ImageFilter.SHARPEN: 3x3 kernel, scale 16, offset 0.
_SHARPEN_KERNEL = np.array(
    [[-2, -2, -2], [-2, 32, -2], [-2, -2, -2]], dtype=np.float32
) / 16.0


def sharpen_pil(x: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageFilter.SHARPEN parity (reference img_utils.py:74).

    PIL computes the 3x3 kernel on the interior only and copies the 1-px
    border from the source image; reproduced exactly.  Input is float 0..255;
    output is clipped to [0, 255] like PIL's uint8 store.
    """
    x_nhwc, ndim = _to_nhwc(x)
    interior = _depthwise(x_nhwc.astype(jnp.float32), _SHARPEN_KERNEL)
    interior = jnp.clip(jnp.round(interior), 0.0, 255.0).astype(x_nhwc.dtype)
    y = x_nhwc.at[:, 1:-1, 1:-1, :].set(interior)
    return _from_nhwc(y, ndim)
