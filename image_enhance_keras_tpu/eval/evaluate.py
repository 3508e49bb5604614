"""Model evaluation loop — the reference's ``_evaluate`` drivers
(models.py:1519-1622): bicubic-degrade each ground-truth image by the scale
factor, run the network, score the reconstruction against the ground truth
with the NTIRE protocol, optionally save `val_predict/` outputs.
"""

from __future__ import annotations

import os

import numpy as np

from image_enhance_keras_tpu.ops.resize import resize_pil_uint8
from image_enhance_keras_tpu.data.io import imread, imwrite, list_images
from image_enhance_keras_tpu.eval.scorer import score_pair, PairScore
from image_enhance_keras_tpu.utils.logging import get_logger

import jax.numpy as jnp

__all__ = ["degrade", "evaluate_resolver_on_dir"]

log = get_logger(__name__)


def degrade(gt: np.ndarray, scale: int = 4) -> np.ndarray:
    """GT -> LR with uint8 PIL-bicubic semantics (models.py:1545-1560 uses
    scipy imresize; img_utils.py:107 likewise for training patches)."""
    h, w = gt.shape[:2]
    lr = resize_pil_uint8(jnp.asarray(gt), (h // scale, w // scale))
    return np.asarray(lr).astype(np.uint8)


class BicubicResolver:
    """Upscales by plain PIL-bicubic — the classical baseline every SR paper
    (and the NTIRE protocol) compares against.  Same .upscale contract."""

    def __init__(self, scale: int = 4):
        self.scale = scale

    def upscale(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        out = resize_pil_uint8(jnp.asarray(img), (h * self.scale, w * self.scale))
        return np.asarray(out).astype(np.uint8)


def evaluate_resolver_on_dir(
    resolver,
    gt_dir: str,
    scale: int = 4,
    crop_border: int = 10,
    save_dir: str | None = None,
    suffix_filter: str = "scaled",
    verbose: bool = True,
) -> tuple[list[PairScore], dict[str, float]]:
    """Degrade -> super-resolve -> score every ground-truth image in a dir."""
    scores = []
    tag = f"_{suffix_filter}("
    for path in list_images(gt_dir):
        if tag in os.path.basename(path):
            continue
        gt = imread(path)
        # crop GT to a multiple of scale so LR*scale == GT exactly
        h, w = (gt.shape[0] // scale) * scale, (gt.shape[1] // scale) * scale
        gt = gt[:h, :w]
        lr = degrade(gt, scale)
        sr = resolver.upscale(lr)
        s = score_pair(gt, sr, name=os.path.basename(path), crop_border=crop_border)
        scores.append(s)
        if verbose:
            print(f"{s.name}: PSNR-Y {s.psnr_y:.4f}  SSIM-Y {s.ssim_y:.4f}  SSIM-RGB {s.ssim_rgb:.4f}")
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            stem, ext = os.path.splitext(os.path.basename(path))
            imwrite(os.path.join(save_dir, f"{stem}_generated{ext}"), sr)
    means = {}
    if scores:
        means = {
            "psnr_y": float(np.mean([s.psnr_y for s in scores])),
            "ssim_y": float(np.mean([s.ssim_y for s in scores])),
            "ssim_rgb": float(np.mean([s.ssim_rgb for s in scores])),
        }
        if verbose:
            print(
                f"MEAN over {len(scores)}: PSNR-Y {means['psnr_y']:.4f}  "
                f"SSIM-Y {means['ssim_y']:.4f}  SSIM-RGB {means['ssim_rgb']:.4f}"
            )
    return scores, means
