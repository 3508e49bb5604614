"""Iterative back-projection (IBP) — test-time LR-consistency refinement.

Classic SR post-process (Irani & Peleg 1991; used by SRCNN/VDSR-era
pipelines as "back projection" and by NTIRE entries as a free +PSNR
knob): repeatedly project the SR estimate down with the SAME degradation
operator the evaluation uses (PIL-bicubic /scale — eval/evaluate.py:30,
matching the reference's scipy.misc.imresize protocol,
/root/reference/models.py:1545-1560, img_utils.py:107-111), measure the
residual against the actual LR input, and add the bicubic up-projection
of that residual back into the SR estimate.  Each iteration tightens
``downscale(sr) ~= lr`` — information the network alone does not enforce.

Net-new over the reference (no analogue in models.py) and model-agnostic:
it composes with every serving mode, forward dtype, and the x8
self-ensemble, because it only touches the finished SR frame and the LR
input.

TPU-first shape: both projections are separable PIL-kernel resizes from
``ops/resize.py`` — dense (out, in) weight matrices contracted on the
MXU, static shapes, fully fusable; ``iters`` is a tiny static unroll.
"""

from __future__ import annotations

import jax.numpy as jnp

from image_enhance_keras_tpu.ops.resize import resize_bicubic_pil

__all__ = ["back_project"]


def back_project(
    sr: jnp.ndarray,
    lr: jnp.ndarray,
    iters: int = 3,
    step: float = 1.0,
) -> jnp.ndarray:
    """Refine ``sr`` so its PIL-bicubic downscale matches ``lr``.

    Args:
      sr: (..., Hs, Ws, C) SR estimate, uint8 or float in [0, 255].
      lr: (..., Hl, Wl, C) LR input, uint8 or float in [0, 255]; Hs/Hl
        and Ws/Wl must be the (integer) scale factor.  Leading batch
        dims (e.g. video frames) must match sr's.
      iters: back-projection iterations (static; small, typically 1-5).
      step: residual gain per iteration (1.0 = full correction).

    Returns uint8 with sr's shape.
    """
    if sr.shape[-3] % lr.shape[-3] or sr.shape[-2] % lr.shape[-2]:
        raise ValueError(
            f"sr {sr.shape[-3:-1]} is not an integer multiple of lr "
            f"{lr.shape[-3:-1]}"
        )
    x = sr.astype(jnp.float32)
    y = lr.astype(jnp.float32)
    lr_hw = (lr.shape[-3], lr.shape[-2])
    sr_hw = (sr.shape[-3], sr.shape[-2])
    for _ in range(int(iters)):
        down = resize_bicubic_pil(x, lr_hw)
        x = x + step * resize_bicubic_pil(y - down, sr_hw)
    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)
