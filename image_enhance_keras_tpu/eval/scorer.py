"""NTIRE-2017 evaluation harness — the scorpath.py protocol, on device.

Protocol (reference scorpath.py:99-258):
  * walk a directory; ground truth = files without the suffix tag; prediction
    = `<stem>_<suffix>(<k>x)<ext>` sibling (scorpath.py:104-114);
  * crop a 10-px border from both (scorpath.py:67-70, 174-179);
  * Y channel via skimage ``rgb2ycbcr`` (scorpath.py:26-31, 190-191);
  * PSNR = NTIRE formulation on Y (scorpath.py:221, PSNR.py:54);
  * SSIM-Y with data_range=255 (scorpath.py:226);
  * SSIM-RGB multichannel on the cropped color images (scorpath.py:176-177,228);
  * print per-image and mean scores (scorpath.py:243-258).

The metric math runs jitted on the accelerator; only decode happens on host.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.ops.color import rgb2ycbcr
from image_enhance_keras_tpu.ops.metrics import gmsd, psnr_nitre, ssim
from image_enhance_keras_tpu.data.io import imread, list_images
from image_enhance_keras_tpu.utils.logging import get_logger

__all__ = ["PairScore", "score_pair", "score_directory"]

log = get_logger(__name__)


@dataclasses.dataclass
class PairScore:
    name: str
    psnr_y: float
    ssim_y: float
    ssim_rgb: float
    #: perceptual extension (lower = better); None unless with_gmsd was set
    gmsd_y: float | None = None


import functools


@functools.partial(jax.jit, static_argnames=("with_gmsd",))
def _score_kernel(gt_cropped, pred_cropped, with_gmsd=False):
    gt_y = rgb2ycbcr(gt_cropped)[..., 0]
    pr_y = rgb2ycbcr(pred_cropped)[..., 0]
    out = (
        psnr_nitre(pr_y, gt_y, 0),
        ssim(pr_y, gt_y, data_range=255.0),
        ssim(
            pred_cropped.astype(jnp.float32),
            gt_cropped.astype(jnp.float32),
            data_range=255.0,
        ),
    )
    # gmsd costs a pooling + four 3x3 gradient convs per pair: only trace
    # it into the program when the caller asked for it
    return out + ((gmsd(pr_y, gt_y),) if with_gmsd else ())


def _crop_border(img: np.ndarray, border: int) -> np.ndarray:
    if border <= 0:
        return img
    return img[border:-border, border:-border]


def score_pair(
    gt: np.ndarray,
    pred: np.ndarray,
    name: str = "",
    crop_border: int = 10,
    allow_shape_mismatch: bool = False,
    with_gmsd: bool = False,
) -> PairScore:
    if gt.shape != pred.shape:
        # The reference would fail on mismatched shapes (scorpath.py does
        # elementwise math on both).  A wrongly-scaled prediction must be an
        # error, not a plausible-looking mean — cropping to the common
        # region is opt-in.
        if not allow_shape_mismatch:
            raise ValueError(
                f"{name or 'pair'}: shape mismatch gt={gt.shape} "
                f"pred={pred.shape}; pass allow_shape_mismatch=True to "
                f"score the top-left common region"
            )
        h = min(gt.shape[0], pred.shape[0])
        w = min(gt.shape[1], pred.shape[1])
        log.warning("%s: shape mismatch gt=%s pred=%s; scoring common %dx%d",
                    name, gt.shape, pred.shape, h, w)
        gt, pred = gt[:h, :w], pred[:h, :w]
    gt_c = _crop_border(gt, crop_border)
    pr_c = _crop_border(pred, crop_border)
    vals = _score_kernel(jnp.asarray(gt_c), jnp.asarray(pr_c),
                         with_gmsd=with_gmsd)
    return PairScore(
        name, float(vals[0]), float(vals[1]), float(vals[2]),
        gmsd_y=float(vals[3]) if with_gmsd else None,
    )


def find_pairs(
    dir_path: str, suffix: str = "scaled", scale_label: int = 1
) -> list[tuple[str, str]]:
    tag = f"_{suffix}("
    pairs = []
    for path in list_images(dir_path):
        base = os.path.basename(path)
        if tag in base:
            continue
        stem, ext = os.path.splitext(path)
        pred = f"{stem}_{suffix}({scale_label}x){ext}"
        if os.path.exists(pred):
            pairs.append((path, pred))
        else:
            log.warning("no prediction for %s (expected %s)", base, os.path.basename(pred))
    return pairs


def score_directory(
    dir_path: str,
    suffix: str = "scaled",
    scale_label: int = 1,
    crop_border: int = 10,
    verbose: bool = True,
    allow_shape_mismatch: bool = False,
    with_gmsd: bool = False,
) -> tuple[list[PairScore], dict[str, float]]:
    scores = []
    for gt_path, pred_path in find_pairs(dir_path, suffix, scale_label):
        s = score_pair(
            imread(gt_path),
            imread(pred_path),
            name=os.path.basename(gt_path),
            crop_border=crop_border,
            allow_shape_mismatch=allow_shape_mismatch,
            with_gmsd=with_gmsd,
        )
        scores.append(s)
        if verbose:
            extra = f"  GMSD-Y {s.gmsd_y:.4f}" if s.gmsd_y is not None else ""
            print(f"{s.name}: PSNR-Y {s.psnr_y:.4f}  SSIM-Y {s.ssim_y:.4f}  SSIM-RGB {s.ssim_rgb:.4f}{extra}")
    if not scores:
        return scores, {}
    means = {
        "psnr_y": float(np.mean([s.psnr_y for s in scores])),
        "ssim_y": float(np.mean([s.ssim_y for s in scores])),
        "ssim_rgb": float(np.mean([s.ssim_rgb for s in scores])),
    }
    if with_gmsd:
        means["gmsd_y"] = float(np.mean([s.gmsd_y for s in scores]))
    if verbose:
        print(
            f"MEAN over {len(scores)} images: PSNR-Y {means['psnr_y']:.4f}  "
            f"SSIM-Y {means['ssim_y']:.4f}  SSIM-RGB {means['ssim_rgb']:.4f}"
        )
    return scores, means
