"""DifvdsrDouble ("didbl") — the flagship x4 generator.

Exact graph of reference models.py:1159-1222:
  input (H, W, 3), floats in [0, 1]
  -> 1x1 conv, 128 feats, relu            ('level1', models.py:1177)
  -> 16x Light53Block                     (models.py:1182-1184)
  -> 6x LightBlock                        (models.py:1188-1190)
  -> TF1 bilinear x4 (in-graph)           (models.py:1193, fn 1392-1399)
  -> 2x Light53Block                      (models.py:1194-1196)
  -> 3x3 conv -> 3 feats, relu            (models.py:1199)

TPU-first notes:
  * The x4 upsample is two dense MXU matmuls (ops.resize) with exact TF1
    align_corners=False semantics — no gathers, static shapes.
  * ``dtype=bfloat16`` runs the whole tower in bf16 on the MXU (serving
    profile); params stay f32.
  * The post-upsample tail runs at 16x the pixel count and dominates FLOPs;
    see ops/pallas for the fused block kernels.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from image_enhance_keras_tpu.models.blocks import LightBlock, Light53Block
from image_enhance_keras_tpu.ops.pixel_shuffle import depth_to_space

__all__ = ["DifvdsrDouble"]


class DifvdsrDouble(nn.Module):
    """x4 super-resolution generator; NHWC in [0,1] -> NHWC x4 in [0,inf)."""

    features: int = 128
    n_body53: int = 16
    n_light: int = 6
    n_tail53: int = 2
    scale: int = 4
    upsampler: str = "tf1_bilinear"  # or "subpixel" (depth_to_space head)
    dtype: Any = None  # activation dtype; None -> f32. bf16 for serving.

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype or x.dtype)
        h = nn.Conv(self.features, (1, 1), padding="SAME", dtype=self.dtype, name="level1")(x)
        h = nn.relu(h)
        for i in range(self.n_body53):
            h = Light53Block(self.features, dtype=self.dtype, name=f"body53_{i}")(h)
        for i in range(self.n_light):
            h = LightBlock(self.features, dtype=self.dtype, name=f"light_{i}")(h)
        if self.upsampler == "tf1_bilinear":
            # in the bf16 profile run the resize matmuls at DEFAULT precision:
            # the bilinear weights (quarters) are exact in bf16 and the MXU
            # accumulates in f32, so this is lossless and ~2x faster than the
            # f32-HIGHEST path used for metric-grade f32 inference.
            from jax import lax as _lax

            prec = (
                _lax.Precision.DEFAULT
                if self.dtype == jnp.bfloat16
                else _lax.Precision.HIGHEST
            )
            from image_enhance_keras_tpu.ops.resize import resize2d

            h = resize2d(
                h,
                (self.scale * h.shape[-3], self.scale * h.shape[-2]),
                "tf1_bilinear",
                precision=prec,
            )
        elif self.upsampler == "subpixel":
            # Alternative head from the reference capability surface
            # (advanced.py:173-199): conv to r^2*features then pixel-shuffle.
            # ICNR init (checkerboard-free subpixel conv, PAPERS.md
            # arXiv:1707.02937): at init this equals nearest-resize + conv.
            from image_enhance_keras_tpu.ops.pixel_shuffle import icnr_init

            h = nn.Conv(
                self.features * self.scale * self.scale,
                (3, 3),
                padding="SAME",
                dtype=self.dtype,
                kernel_init=icnr_init(scale=self.scale, order="dcr"),
                name="subpixel_conv",
            )(h)
            h = depth_to_space(h, self.scale, order="dcr")
        else:
            raise ValueError(f"unknown upsampler {self.upsampler!r}")
        for i in range(self.n_tail53):
            h = Light53Block(self.features, dtype=self.dtype, name=f"tail53_{i}")(h)
        out = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="out")(h)
        return nn.relu(out).astype(jnp.float32)
