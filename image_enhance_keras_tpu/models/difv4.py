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

Split-serving layout (engine mode='split'): ``body`` = everything through
the mid tower + long skip (runs whole-frame at 2x), ``tail`` = the second
x2 upsample + 6 tail blocks + out conv — receptive field 13 px at 4x, so
halo'd 2x-map stripes reproduce the whole-frame forward exactly
(split_halo=8 rows of the 2x map covers ceil(13/2)+1).
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
    mixed: bool = False  # dtype-rate dots, f32 epilogues (blocks.make_conv)
    #: net scale: 4 = the reference 2x+2x graph; 2 = the single-2x variant
    #: behind the reference's x2 dev-note configs (models.py:1061-1069) —
    #: same towers, the tail's second upsample dropped.
    scale: int = 4

    # split-mode geometry (engine._split_fn): body output is 2x the input;
    # at scale=4 the tail upsamples a further 2x (13-px HR receptive field,
    # halo 8 = ceil(13/2)+1 rows of the 2x map); at scale=2 the tail runs at
    # the body-map resolution (RF 13 there -> halo 14 = ceil(13/1)+1).
    # The tail method is `tail_fn` — `tail` must stay the submodule list so
    # param scopes remain tail_0.. (the Keras importer's layer map).
    body_upscale: int = 2
    split_tail_method: str = "tail_fn"

    @property
    def tail_upscale(self) -> int:
        return self.scale // 2

    @property
    def split_halo(self) -> int:
        return 8 if self.scale == 4 else 14

    def setup(self):
        if self.scale not in (2, 4):
            raise ValueError(f"Difvdsr4 supports scale 2 or 4, got {self.scale}")
        from image_enhance_keras_tpu.models.blocks import make_conv

        pk = dict(dtype=self.dtype, mixed=self.mixed)
        self.level1 = make_conv(self.features, (1, 1), **pk)
        self.head = [
            LightBlock(self.features, leaky_slope=0.001, **pk)
            for _ in range(self.n_head)
        ]
        self.mid = [
            LightBlock(self.features, **pk) for _ in range(self.n_mid)
        ]
        self.tail = [
            LightBlock(self.features, **pk) for _ in range(self.n_tail)
        ]
        self.out = make_conv(3, (3, 3), **pk)

    def body(self, x):
        """head tower at 1x -> x2 -> mid tower + long skip, at 2x."""
        if not self.mixed:
            x = x.astype(self.dtype or x.dtype)
        h = nn.relu(self.level1(x))
        for blk in self.head:
            h = blk(h)
        h = _up2(h)
        skip = h
        for blk in self.mid:
            h = blk(h)
        return h + skip

    def tail_fn(self, h):
        """(x2 upsample at scale=4) + tail tower + out conv (spatially local)."""
        if not self.mixed:
            h = h.astype(self.dtype or h.dtype)
        if self.scale == 4:
            h = _up2(h)
        for blk in self.tail:
            h = blk(h)
        out = self.out(h)
        return nn.relu(out).astype(jnp.float32)

    def __call__(self, x):
        return self.tail_fn(self.body(x))
