"""Training data plane — on-the-fly patch sampling + on-device degradation.

The reference materialises patch files to disk (img_utils.py:44-123:
resize-to-256, sharpen, stride-16 patch grid, per-patch gaussian blur +
bicubic downsample, one PNG pair per patch) and replays them with a
single-threaded imread generator (img_utils.py:290-372).

TPU-native redesign: the host only slices uint8 HR patches out of decoded
images (cheap memcpy); the degradation (blur sigma=0.5 + PIL-bicubic /scale,
img_utils.py:101-111) runs *inside the jitted train step* on device, so the
input pipeline is never the bottleneck and LR/HR pairs are always consistent
(the committed reference trains on an inconsistent 16x16->x4 pairing,
SURVEY.md section 2.5 — superseded here).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from image_enhance_keras_tpu.ops.filters import gaussian_blur
from image_enhance_keras_tpu.ops.resize import resize_weight_matrix
from image_enhance_keras_tpu.data.io import imread, list_images

__all__ = ["PatchSampler", "degrade_batch_on_device", "load_image_dir", "synthetic_images"]


def load_image_dir(path: str, limit: int | None = None) -> list[np.ndarray]:
    files = list_images(path)
    if limit:
        files = files[:limit]
    return [imread(f) for f in files]


def synthetic_images(n: int = 8, size: int = 128, seed: int = 0) -> list[np.ndarray]:
    """Structured synthetic HR images (gradients + edges + texture) for smoke
    training when no dataset is mounted."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack(
            [
                127 + 80 * np.sin(2 * np.pi * (rng.uniform(1, 4) * xx + rng.uniform())),
                127 + 80 * np.cos(2 * np.pi * (rng.uniform(1, 4) * yy + rng.uniform())),
                255 * ((xx * rng.uniform(2, 8)).astype(int) % 2 == 0),
            ],
            axis=-1,
        )
        img += rng.normal(0, 8, img.shape)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


class PatchSampler:
    """Random HR patch batches from a list of uint8 images (host side)."""

    def __init__(
        self,
        images: list[np.ndarray],
        hr_patch: int = 96,
        batch_size: int = 10,
        seed: int = 0,
        augment: bool = False,
    ):
        if not images:
            raise ValueError("no training images")
        self.images = [im for im in images if im.shape[0] >= hr_patch and im.shape[1] >= hr_patch]
        if not self.images:
            raise ValueError(f"no image is at least {hr_patch}px on both sides")
        self.hr_patch = hr_patch
        self.batch_size = batch_size
        self.augment = augment
        self.rng = np.random.default_rng(seed)

    def sample(self) -> np.ndarray:
        """-> uint8 (B, hr_patch, hr_patch, 3)."""
        p = self.hr_patch
        out = np.empty((self.batch_size, p, p, 3), np.uint8)
        idx = self.rng.integers(0, len(self.images), self.batch_size)
        for i, k in enumerate(idx):
            im = self.images[k]
            y = self.rng.integers(0, im.shape[0] - p + 1)
            x = self.rng.integers(0, im.shape[1] - p + 1)
            patch = im[y : y + p, x : x + p]
            if self.augment:
                if self.rng.random() < 0.5:
                    patch = patch[:, ::-1]
                if self.rng.random() < 0.5:
                    patch = patch[::-1]
                if self.rng.random() < 0.5:
                    patch = patch.transpose(1, 0, 2)
            out[i] = patch
        return out

    def __iter__(self):
        while True:
            yield self.sample()


def degrade_batch_on_device(hr_u8: jnp.ndarray, scale: int = 4, blur_sigma: float = 0.5) -> jnp.ndarray:
    """HR uint8 batch -> LR float in [0,1], jittable.

    Mirrors the reference degradation (img_utils.py:101-111): gaussian blur
    sigma=0.5 on the uint8 image, then PIL-bicubic downsample with uint8
    per-pass clamping semantics, then /255.
    """
    x = hr_u8.astype(jnp.float32)
    if blur_sigma > 0:
        x = jnp.clip(jnp.round(gaussian_blur(x, blur_sigma)), 0.0, 255.0)
    h, w = int(x.shape[-3]), int(x.shape[-2])
    oh, ow = h // scale, w // scale
    ww = jnp.asarray(resize_weight_matrix(w, ow, "pil_bicubic"))
    wh = jnp.asarray(resize_weight_matrix(h, oh, "pil_bicubic"))
    from jax import lax

    y = jnp.einsum("pw,...hwc->...hpc", ww, x, precision=lax.Precision.HIGHEST)
    y = jnp.clip(jnp.round(y), 0.0, 255.0)
    y = jnp.einsum("oh,...hpc->...opc", wh, y, precision=lax.Precision.HIGHEST)
    y = jnp.clip(jnp.round(y), 0.0, 255.0)
    return y / 255.0
