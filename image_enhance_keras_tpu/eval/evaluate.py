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

__all__ = [
    "degrade",
    "evaluate_resolver_on_dir",
    "evaluate_resolver_on_dir_divisible",
    "evaluate_model",
]

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
    with_gmsd: bool = False,
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
        s = score_pair(gt, sr, name=os.path.basename(path),
                       crop_border=crop_border, with_gmsd=with_gmsd)
        scores.append(s)
        if verbose:
            extra = f"  GMSD-Y {s.gmsd_y:.4f}" if s.gmsd_y is not None else ""
            print(f"{s.name}: PSNR-Y {s.psnr_y:.4f}  SSIM-Y {s.ssim_y:.4f}  SSIM-RGB {s.ssim_rgb:.4f}{extra}")
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
        if with_gmsd:
            means["gmsd_y"] = float(np.mean([s.gmsd_y for s in scores]))
        if verbose:
            print(
                f"MEAN over {len(scores)}: PSNR-Y {means['psnr_y']:.4f}  "
                f"SSIM-Y {means['ssim_y']:.4f}  SSIM-RGB {means['ssim_rgb']:.4f}"
            )
    return scores, means


def evaluate_resolver_on_dir_divisible(
    resolver,
    gt_dir: str,
    scale: int = 4,
    crop_border: int = 10,
    save_dir: str | None = None,
    suffix_filter: str = "scaled",
    verbose: bool = True,
    model_name: str = "model",
    with_gmsd: bool = False,
) -> tuple[list[PairScore], dict[str, float]]:
    """The reference's distinct ``_evaluate_denoise`` driver
    (models.py:1625-1721), for models flagged ``requires_divisible_shape``
    (dispatch at models.py:159-163).  Differences vs the standard driver:

      * non-conformant ground truths are bicubic-RESIZED (not cropped) to
        ``((dim // scale) // 4) * 4 * scale`` (models.py:1648-1657);
      * the forward is always whole-frame (K.function single predict,
        models.py:1684-1696) — no tiling;
      * outputs land in ``save_dir`` as ``<model>_<stem>_generated.png``
        (models.py:1712).

    The reference's unit bug at models.py:1707 (``psnr(y/1, clip(pred, 0,
    255) / 255)`` — mixing [0,1] and [0,255] scales when scale_pred=False)
    is not reproduced; scoring uses the NTIRE protocol consistently.
    """
    scores = []
    tag = f"_{suffix_filter}("
    unit = 4 * scale
    for path in list_images(gt_dir):
        if tag in os.path.basename(path):
            continue
        gt = imread(path)
        h, w = gt.shape[:2]
        if h % unit or w % unit:  # reference coercion: dims must be 4*scale multiples
            h2, w2 = (h // unit) * unit, (w // unit) * unit
            if verbose:
                print(
                    f"{os.path.basename(path)}: coercing to divisible size "
                    f"({h}x{w}) -> ({h2}x{w2})"
                )
            gt = np.asarray(
                resize_pil_uint8(jnp.asarray(gt), (h2, w2))
            ).astype(np.uint8)
        lr = degrade(gt, scale)
        if getattr(resolver, "spec", None) is not None and resolver.spec.pre_upscaled_input:
            sr = resolver.upscale(lr)
        else:
            # whole-frame single forward, never tiled (models.py:1684)
            sr = (
                resolver.upscale_frame(lr)
                if hasattr(resolver, "upscale_frame")
                else resolver.upscale(lr)
            )
        s = score_pair(gt, sr, name=os.path.basename(path),
                       crop_border=crop_border, with_gmsd=with_gmsd)
        scores.append(s)
        if verbose:
            extra = f"  GMSD-Y {s.gmsd_y:.4f}" if s.gmsd_y is not None else ""
            print(f"{s.name}: PSNR-Y {s.psnr_y:.4f}  SSIM-Y {s.ssim_y:.4f}  SSIM-RGB {s.ssim_rgb:.4f}{extra}")
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            stem = os.path.splitext(os.path.basename(path))[0]
            imwrite(os.path.join(save_dir, f"{model_name}_{stem}_generated.png"), sr)
    means = {}
    if scores:
        means = {
            "psnr_y": float(np.mean([s.psnr_y for s in scores])),
            "ssim_y": float(np.mean([s.ssim_y for s in scores])),
            "ssim_rgb": float(np.mean([s.ssim_rgb for s in scores])),
        }
        if with_gmsd:
            means["gmsd_y"] = float(np.mean([s.gmsd_y for s in scores]))
        if verbose:
            print(
                f"MEAN over {len(scores)}: PSNR-Y {means['psnr_y']:.4f}  "
                f"SSIM-Y {means['ssim_y']:.4f}  SSIM-RGB {means['ssim_rgb']:.4f}"
            )
    return scores, means


def evaluate_model(resolver, gt_dir: str, **kw):
    """The reference ``evaluate`` dispatch (models.py:159-163): the
    divisible-shape driver for flagged models, the standard loop otherwise."""
    spec = getattr(resolver, "spec", None)
    if spec is not None and getattr(spec, "requires_divisible_shape", False):
        kw.setdefault("model_name", spec.name)
        return evaluate_resolver_on_dir_divisible(resolver, gt_dir, **kw)
    kw.pop("model_name", None)
    return evaluate_resolver_on_dir(resolver, gt_dir, **kw)
