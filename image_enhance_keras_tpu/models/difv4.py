"""Difvdsr4 ("difv4") — progressive 2x + 2x generator (reference models.py:992-1142).

Graph:
  input (H, W, 3) in [0, 1]
  -> 1x1 conv, 256 feats, relu ('level1', models.py:1024)
  -> 6x LightBlock with LeakyReLU(0.001)  ('light0', models.py:1029-1031)
  -> TF1 bilinear x2                      (models.py:1033)
  -> long-skip save; 20x LightBlock; add skip (models.py:1034-1039)
  -> TF1 bilinear x2                      (models.py:1041)
  -> 6x LightBlock                        (models.py:1042-1044)
  -> 3x3 conv -> 3, relu                  (models.py:1047)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from image_enhance_keras_tpu.models.blocks import LightBlock
from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

__all__ = ["Difvdsr4"]


def _up2(h):
    # exact TF1 bilinear x2 as phase interleaving (elementwise, XLA-fused)
    # instead of a dense resize matmul — same closed form as didbl's x4
    return upsample_phase_tf1(h, 2)


class Difvdsr4(nn.Module):
    features: int = 256
    n_head: int = 6
    n_mid: int = 20
    n_tail: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype or x.dtype)
        h = nn.Conv(self.features, (1, 1), padding="SAME", dtype=self.dtype, name="level1")(x)
        h = nn.relu(h)
        for i in range(self.n_head):
            h = LightBlock(
                self.features, leaky_slope=0.001, dtype=self.dtype, name=f"head_{i}"
            )(h)
        h = _up2(h)
        skip = h
        for i in range(self.n_mid):
            h = LightBlock(self.features, dtype=self.dtype, name=f"mid_{i}")(h)
        h = h + skip
        h = _up2(h)
        for i in range(self.n_tail):
            h = LightBlock(self.features, dtype=self.dtype, name=f"tail_{i}")(h)
        out = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="out")(h)
        return nn.relu(out).astype(jnp.float32)
