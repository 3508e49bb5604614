"""Pixel-shuffle (depth-to-space) upsamplers as pure reshape/transpose.

The reference ships three subpixel implementations (advanced.py:104-129,
keras_subpixel.py:64-84, advanced.py:173-199 ``tf.depth_to_space``) as an
alternative upsampler head; none are wired into the shipped graphs but they
are part of the capability surface.  On TPU these are zero-FLOP layout ops
that XLA folds into the neighbouring convolution.

Two channel orderings are supported:
  * ``"dcr"`` — TF ``tf.depth_to_space``: ch = (dy*r + dx)*C + c.
  * ``"keras_ref"`` — the reference's Tetrachrome-derived phase shift
    (keras_subpixel.py:64-84): channel-major groups with transposed subpixel
    axes, ch = c*r*r + dx*r + dy.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["depth_to_space", "space_to_depth", "icnr_init"]


def icnr_init(base_init=None, scale: int = 4, order: str = "dcr"):
    """ICNR kernel initializer for subpixel convs (checkerboard-free
    sub-pixel convolution, Aitken et al. 2017): every r^2 output-channel
    group shares one base filter, so conv+depth_to_space at init equals a
    nearest-neighbour resize followed by a conv.

    Returns a flax-style ``init(key, shape, dtype)`` for HWIO kernels whose
    output channels are laid out for :func:`depth_to_space` with ``order``.
    """
    import flax.linen as nn

    if base_init is None:
        base_init = nn.initializers.lecun_normal()
    r2 = scale * scale

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        if cout % r2 != 0:
            raise ValueError(f"output channels {cout} not divisible by scale^2={r2}")
        c = cout // r2
        base = base_init(key, (kh, kw, cin, c), dtype)
        if order == "dcr":
            # ch = (dy*r+dx)*C + c  -> tile along the leading group axis
            k = jnp.tile(base[:, :, :, None, :], (1, 1, 1, r2, 1))
            return k.reshape(kh, kw, cin, cout)
        # keras_ref: ch = c*r*r + dx*r + dy -> repeat per channel
        k = jnp.repeat(base, r2, axis=-1)
        return k.reshape(kh, kw, cin, cout)

    return init


def depth_to_space(x: jnp.ndarray, r: int, order: str = "dcr") -> jnp.ndarray:
    """(B, H, W, r*r*C) -> (B, H*r, W*r, C). Also accepts unbatched HWC."""
    unbatched = x.ndim == 3
    if unbatched:
        x = x[None]
    b, h, w, ch = x.shape
    if ch % (r * r) != 0:
        raise ValueError(f"channels {ch} not divisible by r^2={r * r}")
    c = ch // (r * r)
    if order == "dcr":
        y = x.reshape(b, h, w, r, r, c)            # (B,H,W,dy,dx,c)
        y = y.transpose(0, 1, 3, 2, 4, 5)           # (B,H,dy,W,dx,c)
    elif order == "keras_ref":
        y = x.reshape(b, h, w, c, r, r)             # (B,H,W,c,dx,dy)
        y = y.transpose(0, 1, 5, 2, 4, 3)           # (B,H,dy,W,dx,c)
    else:
        raise ValueError(f"unknown order {order!r}")
    return y.reshape(b, h * r, w * r, c) if not unbatched else y.reshape(h * r, w * r, c)


def space_to_depth(x: jnp.ndarray, r: int, order: str = "dcr") -> jnp.ndarray:
    """Inverse of :func:`depth_to_space`."""
    unbatched = x.ndim == 3
    if unbatched:
        x = x[None]
    b, hr, wr, c = x.shape
    if hr % r or wr % r:
        raise ValueError("spatial dims not divisible by r")
    h, w = hr // r, wr // r
    y = x.reshape(b, h, r, w, r, c)                 # (B,H,dy,W,dx,c)
    if order == "dcr":
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, r * r * c)
    elif order == "keras_ref":
        y = y.transpose(0, 1, 3, 5, 4, 2).reshape(b, h, w, r * r * c)
    else:
        raise ValueError(f"unknown order {order!r}")
    return y[0] if unbatched else y
