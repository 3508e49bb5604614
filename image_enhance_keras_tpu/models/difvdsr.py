"""Difvdsr ("difvdsr") — diff-VDSR refiner on pre-upscaled input
(reference models.py:1274-1357).

Graph (no in-network upscale; input is the bicubic-upscaled image):
  input (H, W, 3) in [0, 1]
  -> 3x3 conv, 192 feats, relu ('level1', frozen in the reference,
     models.py:1305 trainable=False)
  -> 32x DiffBlock (three-way add, LeakyReLU(0.2), x0.1; models.py:1336-1357)
  -> 3x3 conv -> 3, relu (models.py:1309)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from image_enhance_keras_tpu.models.blocks import DiffBlock

__all__ = ["Difvdsr"]


class Difvdsr(nn.Module):
    features: int = 192
    n_blocks: int = 32
    dtype: Any = None
    mixed: bool = False  # dtype-rate dots, f32 epilogues (blocks.make_conv)
    # the reference freezes the entry conv (models.py:1305 trainable=False);
    # the trainer masks these top-level param collections out of the optimizer
    frozen_params: tuple = ("level1",)

    @nn.compact
    def __call__(self, x):
        from image_enhance_keras_tpu.models.blocks import make_conv

        pk = dict(dtype=self.dtype, mixed=self.mixed)
        if not self.mixed:
            x = x.astype(self.dtype or x.dtype)
        h = make_conv(self.features, (3, 3), name="level1", **pk)(x)
        h = nn.relu(h)
        for i in range(self.n_blocks):
            h = DiffBlock(
                self.features,
                leaky_slope=0.2,
                three_way=True,
                name=f"diff_{i}",
                **pk,
            )(h)
        out = make_conv(3, (3, 3), name="out", **pk)(h)
        return nn.relu(out).astype(jnp.float32)
