"""Dataset preparation CLI — the `python img_utils.py` capability
(reference img_utils.py:44-123,727-742): materialise paired LR/HR patch
directories from a folder of source images.

Kept for compatibility with disk-based training flows (the on-device pipeline
in data/pipeline.py makes this unnecessary for our trainer).  Per source
image: resize to 256x256 (PIL bicubic), sharpen (PIL SHARPEN), stride-16 HR
patch grid; per patch: save HR to `y/`, then gaussian blur sigma=0.5 +
bicubic downsample by the scale (+ optional re-upsample when not
--true-upscale) to `X/`, named `<imgidx>_<patchidx>.png`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import jax.numpy as jnp

from image_enhance_keras_tpu.data.io import imread, imwrite, list_images
from image_enhance_keras_tpu.ops.filters import gaussian_blur, sharpen_pil
from image_enhance_keras_tpu.ops.resize import resize_pil_uint8
from image_enhance_keras_tpu.utils.logging import get_logger

log = get_logger(__name__)


def prepare(
    input_dir: str,
    output_dir: str,
    scale: int = 2,
    img_size: int = 256,
    stride: int = 16,
    patch_hr: int | None = None,
    true_upscale: bool = False,
    sharpen: bool = True,
    max_images: int | None = None,
) -> int:
    """Returns the number of patch pairs written.  ``max_images`` caps the
    number of source images processed (compat.transform_images converts the
    reference's off-by-one ``max_nb_images`` contract to this)."""
    x_dir = os.path.join(output_dir, "X")
    y_dir = os.path.join(output_dir, "y")
    os.makedirs(x_dir, exist_ok=True)
    os.makedirs(y_dir, exist_ok=True)
    patch_hr = patch_hr or 16 * scale
    count = 0
    paths = list_images(input_dir)
    if max_images is not None and max_images >= 0:
        paths = paths[:max_images]
    for idx, path in enumerate(paths):
        img = imread(path)
        img = np.asarray(resize_pil_uint8(jnp.asarray(img), (img_size, img_size))).astype(np.uint8)
        if sharpen:
            img = np.asarray(sharpen_pil(jnp.asarray(img).astype(jnp.float32))).astype(np.uint8)
        pidx = 0
        for y0 in range(0, img_size - patch_hr + 1, stride):
            for x0 in range(0, img_size - patch_hr + 1, stride):
                hr = img[y0 : y0 + patch_hr, x0 : x0 + patch_hr]
                blurred = np.asarray(
                    jnp.clip(jnp.round(gaussian_blur(jnp.asarray(hr).astype(jnp.float32), 0.5)), 0, 255)
                ).astype(np.uint8)
                lr = np.asarray(
                    resize_pil_uint8(jnp.asarray(blurred), (patch_hr // scale, patch_hr // scale))
                ).astype(np.uint8)
                if not true_upscale:
                    lr = np.asarray(
                        resize_pil_uint8(jnp.asarray(lr), (patch_hr, patch_hr))
                    ).astype(np.uint8)
                name = f"{idx}_{pidx}.png"
                imwrite(os.path.join(y_dir, name), hr)
                imwrite(os.path.join(x_dir, name), lr)
                pidx += 1
                count += 1
        log.info("%s: %d patches", os.path.basename(path), pidx)
    return count


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="materialise LR/HR patch dirs")
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--stride", type=int, default=16)
    p.add_argument("--true-upscale", action="store_true")
    p.add_argument("--no-sharpen", action="store_true")
    p.add_argument("--max-images", type=int, default=None,
                   help="process at most N source images")
    args = p.parse_args(argv)
    n = prepare(
        args.input_dir,
        args.output_dir,
        scale=args.scale,
        img_size=args.img_size,
        stride=args.stride,
        true_upscale=args.true_upscale,
        sharpen=not args.no_sharpen,
        max_images=args.max_images,
    )
    log.info("wrote %d patch pairs", n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
