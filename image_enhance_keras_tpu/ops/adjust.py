"""Pixel adjustment utilities — vectorised equivalents of the reference's
per-pixel Python loops (img_utils.py:401-440)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["set_gamma", "set_contrast", "smooth_gan_labels"]


def set_gamma(img: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Gamma adjust on uint8-range data (reference SetGama,
    img_utils.py:415-427, a per-pixel loop — here one VPU expression)."""
    x = img.astype(jnp.float32) / 255.0
    y = jnp.power(jnp.clip(x, 0.0, 1.0), gamma) * 255.0
    return jnp.clip(jnp.round(y), 0.0, 255.0)


def set_contrast(img: jnp.ndarray, factor: float, pivot: float = 127.5) -> jnp.ndarray:
    """Linear contrast about a pivot (reference SetContrast,
    img_utils.py:429-440)."""
    y = (img.astype(jnp.float32) - pivot) * factor + pivot
    return jnp.clip(jnp.round(y), 0.0, 255.0)


def smooth_gan_labels(y: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """GAN label smoothing (reference img_utils.py:401-413): zeros stay in
    [0, 0.3], ones map to [0.7, 1.2]."""
    lo = jax.random.uniform(key, y.shape, minval=0.0, maxval=0.3)
    hi = jax.random.uniform(jax.random.fold_in(key, 1), y.shape, minval=0.7, maxval=1.2)
    return jnp.where(y == 0, lo, hi)
