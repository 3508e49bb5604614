"""Primitive on-device ops: resizes, color transforms, filters, pixel-shuffle, metrics.

This is the parity layer with the reference's third-party native surface
(SURVEY.md section 2.9): TF1 in-graph resizes, scipy/PIL resampling, skimage
color/SSIM, scipy filters — all rebuilt as jittable JAX ops so the whole
pipeline stays on device.
"""

from image_enhance_keras_tpu.ops.resize import (  # noqa: F401
    resize2d,
    resize_bilinear_tf1,
    resize_bicubic_pil,
    upscale_bilinear_x4,
)
from image_enhance_keras_tpu.ops.color import (  # noqa: F401
    rgb2ycbcr,
    ycbcr2rgb,
    rgb2y,
    im2double,
)
from image_enhance_keras_tpu.ops.filters import (  # noqa: F401
    gaussian_blur,
    uniform_filter,
    sharpen_pil,
)
from image_enhance_keras_tpu.ops.pixel_shuffle import (  # noqa: F401
    depth_to_space,
    space_to_depth,
)
from image_enhance_keras_tpu.ops.metrics import (  # noqa: F401
    psnr_nitre,
    psnr_vdsr,
    psnr_shave,
    psnr_peak1,
    ssim,
)
