"""Residual block family — the core compute pattern of all three generators.

Reference block zoo (SURVEY.md section 2.2):
  * ``LightBlock``   — EDSR-style: x + 0.1 * conv3(relu(conv3(x)))
    (reference models.py:1231-1245); optional LeakyReLU slope for the
    ``_residual_block_light0`` variant (models.py:1127-1142).
  * ``Light53Block`` — dual-branch: 0.9*x + 0.1*(conv5(relu(conv3(x))) +
    conv3(relu(conv5(x)))) (reference models.py:1248-1270).
  * ``DiffBlock``    — "diff-VDSR": t = conv3(relu(conv3(x))); d = t - x;
    u = conv3(lrelu_0.2(conv3(d))); x + 0.1*(d + u + t)
    (reference models.py:1336-1357).  The Difvdsr4 variant
    (models.py:1083-1108) uses relu and sums only (u + t).

TPU notes: all convs are NHWC `lax.conv_general_dilated` through flax
``nn.Conv`` — XLA lowers them onto the MXU and fuses the scale/add epilogues.
Residual scales are compile-time constants.  Channel counts (128/192/256) are
multiples of the 128-lane vector width by construction.
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

__all__ = ["LightBlock", "Light53Block", "DiffBlock", "make_conv"]


def _act(x: jnp.ndarray, leaky_slope: float | None) -> jnp.ndarray:
    if leaky_slope is None:
        return nn.relu(x)
    return nn.leaky_relu(x, negative_slope=leaky_slope)


#: f32-accumulator conv for the MIXED serving profile: inputs/kernel cast to
#: ``dtype`` (bf16 -> the MXU's native rate) but the conv EMITS f32, so the
#: epilogue (bias, relu, residual scale/add) and the inter-block activations
#: never round to bf16.  Measured on the trained didbl checkpoint (CPU,
#: bird-crop probe, r4): all-bf16 loses 3.97 dB PSNR-Y vs f32; bf16 dots +
#: f32 epilogues recovers ALL of it (43.445 vs f32's 43.424) — the bf16
#: profile's loss is conv-output/elementwise rounding, not dot precision
#: (the f32-spine probe recovered only 0.23 dB, measured negative).
_CONV_F32ACC = functools.partial(
    lax.conv_general_dilated, preferred_element_type=jnp.float32
)


def make_conv(features, kernel_size, *, dtype, mixed, name=None, **kw):
    """nn.Conv with the family's serving-precision contract: plain ``dtype``
    execution, or (``mixed=True``) dtype-rate dots with f32 emission.  Param
    tree ("kernel"/"bias") is identical either way — checkpoints are
    profile-portable."""
    if mixed and dtype is not None:
        kw["conv_general_dilated"] = _CONV_F32ACC
    return nn.Conv(
        features, kernel_size, padding="SAME", dtype=dtype, name=name, **kw
    )


class LightBlock(nn.Module):
    """x + res_scale * conv3(act(conv3(x))). Reference models.py:1231-1245."""

    features: int
    res_scale: float = 0.1
    leaky_slope: float | None = None  # None -> relu; 0.001 -> light0 variant
    dtype: Any = None
    mixed: bool = False  # dtype-rate dots, f32 epilogues (see make_conv)

    @nn.compact
    def __call__(self, x):
        conv = functools.partial(
            make_conv, self.features, (3, 3), dtype=self.dtype, mixed=self.mixed
        )
        h = conv(name="conv_a")(x)
        h = _act(h, self.leaky_slope)
        h = conv(name="conv_b")(h)
        return x + jnp.asarray(self.res_scale, h.dtype) * h


class Light53Block(nn.Module):
    """0.9*x + 0.1*(branch_35 + branch_53). Reference models.py:1248-1270.

    branch_35 = conv5(relu(conv3(x))); branch_53 = conv3(relu(conv5(x))).
    Weight-import naming: a1(3x3), a2(5x5) = branch a; b1(5x5), b2(3x3) =
    branch b.  Keras files STORE these in topological order a1, b1, a2, b2
    (models/keras_import.py — verified against real tf_keras, r4).
    """

    features: int
    res_scale: float = 0.1
    identity_scale: float = 0.9
    dtype: Any = None
    mixed: bool = False  # dtype-rate dots, f32 epilogues (see make_conv)

    @nn.compact
    def __call__(self, x):
        conv = functools.partial(
            make_conv, self.features, dtype=self.dtype, mixed=self.mixed
        )
        a = conv((3, 3), name="conv_a1")(x)
        a = nn.relu(a)
        a = conv((5, 5), name="conv_a2")(a)
        b = conv((5, 5), name="conv_b1")(x)
        b = nn.relu(b)
        b = conv((3, 3), name="conv_b2")(b)
        h = a + b
        return (
            jnp.asarray(self.identity_scale, h.dtype) * x
            + jnp.asarray(self.res_scale, h.dtype) * h
        )


class DiffBlock(nn.Module):
    """The "difference" residual block of Difvdsr (reference models.py:1336-1357).

    t = conv_b(relu(conv_a(x)))          # main tower
    d = t - x                            # Subtract
    u = conv_d(act(conv_c(d)))           # diff tower
    out = x + res_scale * (d + u + t)    # 3-way Add then x0.1 (difvdsr)
    With ``three_way=False`` (Difvdsr4 variant, models.py:1083-1108):
    out = x + res_scale * (u + t), act = relu.
    """

    features: int
    res_scale: float = 0.1
    leaky_slope: float | None = 0.2  # difvdsr uses LeakyReLU(0.2); difv4 relu
    three_way: bool = True
    dtype: Any = None
    mixed: bool = False  # dtype-rate dots, f32 epilogues (see make_conv)

    @nn.compact
    def __call__(self, x):
        conv = functools.partial(
            make_conv, self.features, (3, 3), dtype=self.dtype, mixed=self.mixed
        )
        t = conv(name="conv_a")(x)
        t = nn.relu(t)
        t = conv(name="conv_b")(t)
        d = t - x
        u = conv(name="conv_c")(d)
        u = _act(u, self.leaky_slope)
        u = conv(name="conv_d")(u)
        if self.three_way:
            s = d + u + t
        else:
            s = u + t
        return x + jnp.asarray(self.res_scale, s.dtype) * s
