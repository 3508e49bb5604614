"""On-device PSNR / SSIM with the reference's exact formulations.

PSNR family (reference PSNR.py):
  * :func:`psnr_nitre`  — the NTIRE/Matlab form used by the scoring script
    (PSNR.py:54-84): optional border shave, scale-to-[0,1] if data > 1,
    ``10*log10(N / sum(diff^2))``.
  * :func:`psnr_vdsr`   — 255-peak with border shave (PSNR.py:7-18).
  * :func:`psnr_shave`  — parameterised shave, 255 peak (PSNR.py:24-32).
  * :func:`psnr_peak1`  — im2double + ``-10*log10(mse)`` (PSNR.py:36-49).

SSIM: a jittable reimplementation of skimage ``compare_ssim`` semantics
(scorpath.py:226-228): uniform 7x7 window by default, K1=0.01/K2=0.03,
sample covariance (N/(N-1)), edge-cropped mean.  ``channel_axis`` handling
mirrors ``multichannel=True`` (per-channel SSIM, averaged).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from image_enhance_keras_tpu.ops.filters import separable_filter2d, _gaussian_kernel1d

__all__ = ["psnr_nitre", "psnr_vdsr", "psnr_shave", "psnr_peak1", "ssim", "mse", "gmsd"]


def _shave(x: jnp.ndarray, border: int) -> jnp.ndarray:
    """Crop ``border`` px from the SPATIAL axes: (H, W), (H, W, C) and
    batched (N, H, W, C) all shave H/W (never the batch axis)."""
    if border <= 0:
        return x
    sp = slice(border, -border)
    if x.ndim == 2:
        return x[sp, sp]
    return x[..., sp, sp, :]


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr_nitre(pred: jnp.ndarray, target: jnp.ndarray, shave_border: int = 0) -> jnp.ndarray:
    """NTIRE-2017 PSNR (PSNR.py:54-84).

    Data with max value > 1 is treated as 0..255 and rescaled by ``im2double``
    (per input, like the reference); implemented as a jittable ``where``.
    """
    p = _shave(pred.astype(jnp.float32), shave_border)
    t = _shave(target.astype(jnp.float32), shave_border)
    p = jnp.where(jnp.max(p) > 1.0, p / 255.0, p)
    t = jnp.where(jnp.max(t) > 1.0, t / 255.0, t)
    d = (p - t).reshape(-1)
    n = d.shape[0]
    return 10.0 * jnp.log10(n / jnp.sum(d * d))


def psnr_vdsr(pred: jnp.ndarray, target: jnp.ndarray, scale_border: int = 4) -> jnp.ndarray:
    """255-peak PSNR with a `scale`-pixel shave (PSNR.py:7-18)."""
    return psnr_shave(pred, target, shave_border=scale_border)


def psnr_shave(pred: jnp.ndarray, target: jnp.ndarray, shave_border: int = 0) -> jnp.ndarray:
    """255-peak PSNR with configurable border shave (PSNR.py:24-32)."""
    p = _shave(pred.astype(jnp.float32), shave_border)
    t = _shave(target.astype(jnp.float32), shave_border)
    m = mse(p, t)
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(m))


def psnr_peak1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """im2double + -10*log10(mse) (PSNR.py:36-49)."""
    m = mse(pred.astype(jnp.float32) / 255.0, target.astype(jnp.float32) / 255.0)
    return -10.0 * jnp.log10(m)


def _ssim_single(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float,
    win_size: int,
    k1: float,
    k2: float,
    gaussian_weights: bool,
    sigma: float,
    use_sample_covariance: bool,
) -> jnp.ndarray:
    """SSIM over one 2-D channel; skimage compare_ssim semantics."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    if gaussian_weights:
        kern = _gaussian_kernel1d(sigma, truncate=3.5)
        win_size = len(kern)
    else:
        kern = np.full((win_size,), 1.0 / win_size, dtype=np.float32)

    def filt(a):
        return separable_filter2d(a, kern, kern, pad_mode="symmetric")

    ux = filt(x)
    uy = filt(y)
    uxx = filt(x * x)
    uyy = filt(y * y)
    uxy = filt(x * y)

    if use_sample_covariance:
        np_pts = win_size * win_size
        cov_norm = np_pts / (np_pts - 1.0)
    else:
        cov_norm = 1.0
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    # slice arithmetic that stays full-array at pad=0 (win_size=1):
    # s[0:-0] would be empty and jnp.mean of it silently NaN
    return jnp.mean(s[pad : s.shape[0] - pad, pad : s.shape[1] - pad])


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    gaussian_weights: bool = False,
    sigma: float = 1.5,
    use_sample_covariance: bool = True,
    multichannel: bool | None = None,
) -> jnp.ndarray:
    """skimage ``compare_ssim`` parity, jittable.

    2-D inputs: plain SSIM.  3-D (H, W, C) inputs with ``multichannel`` truthy
    (or left None): per-channel SSIM averaged, exactly like
    ``compare_ssim(..., multichannel=True)`` (scorpath.py:228).
    """
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch {x.shape} vs {y.shape}")
    if win_size < 3 or win_size % 2 == 0:
        # skimage contract: an even window errors ('Window size must be
        # odd') and win_size=1 divides by zero in the sample-covariance
        # normalisation — fail loudly instead of returning a wrong score
        raise ValueError(f"win_size must be odd and >= 3, got {win_size}")
    kwargs = dict(
        data_range=data_range,
        win_size=win_size,
        k1=k1,
        k2=k2,
        gaussian_weights=gaussian_weights,
        sigma=sigma,
        use_sample_covariance=use_sample_covariance,
    )
    if x.ndim == 2:
        return _ssim_single(x, y, **kwargs)
    if x.ndim == 3:
        if multichannel is False:
            raise ValueError("3-D input requires multichannel SSIM")
        vals = [
            _ssim_single(x[..., c], y[..., c], **kwargs) for c in range(x.shape[-1])
        ]
        return jnp.mean(jnp.stack(vals))
    raise ValueError(f"expected 2-D or 3-D input, got {x.ndim}-D")


def gmsd(x: jnp.ndarray, y: jnp.ndarray, c: float = 170.0) -> jnp.ndarray:
    """Gradient Magnitude Similarity Deviation (Xue et al. 2013) — the
    perceptual-metric extension of the eval harness (ROADMAP "Quality");
    unlike LPIPS it needs no pretrained network, so it runs in the same
    jitted on-device harness as PSNR/SSIM.

    Protocol per the paper: inputs are luminance in [0, 255]; both images
    are mean-pooled 2x2 (stride 2), gradient magnitudes come from 3x3
    Prewitt kernels, the similarity map is ``(2 m1 m2 + c)/(m1^2 + m2^2 +
    c)`` with c = 170, and the score is the map's standard deviation.
    Lower is better; 0 = identical gradients.
    """
    if x.shape != y.shape or x.ndim != 2:
        raise ValueError(f"expected equal 2-D luminance inputs, got {x.shape} vs {y.shape}")

    def pool2(a):
        h, w = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
        a = a[:h, :w].astype(jnp.float32)
        return (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]) / 4.0

    px = jnp.asarray([[1, 0, -1], [1, 0, -1], [1, 0, -1]], jnp.float32) / 3.0
    py = px.T

    def grad_mag(a):
        from jax import lax

        a4 = a[None, :, :, None]
        k = jnp.stack([px, py], axis=-1)[:, :, None, :]  # (3, 3, 1, 2)
        g = lax.conv_general_dilated(
            a4, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[0]
        return jnp.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2)

    m1 = grad_mag(pool2(x))
    m2 = grad_mag(pool2(y))
    gms = (2.0 * m1 * m2 + c) / (m1**2 + m2**2 + c)
    return jnp.std(gms)
