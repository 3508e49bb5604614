"""Filter/color parity tests against scipy (available) and known constants."""

import numpy as np
from scipy import ndimage

import jax.numpy as jnp

from image_enhance_keras_tpu.ops.filters import gaussian_blur, uniform_filter, sharpen_pil
from image_enhance_keras_tpu.ops.color import rgb2ycbcr, ycbcr2rgb, rgb2y


def test_gaussian_blur_matches_scipy():
    rng = np.random.default_rng(0)
    img = (rng.random((21, 17)) * 255).astype(np.float32)
    for sigma in [0.5, 1.0, 2.0]:
        want = ndimage.gaussian_filter(img, sigma=sigma)
        got = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_gaussian_blur_per_channel():
    rng = np.random.default_rng(1)
    img = (rng.random((12, 13, 3)) * 255).astype(np.float32)
    want = np.stack(
        [ndimage.gaussian_filter(img[..., c], sigma=0.5) for c in range(3)], axis=-1
    )
    got = np.asarray(gaussian_blur(jnp.asarray(img), 0.5))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_uniform_filter_matches_scipy():
    rng = np.random.default_rng(2)
    img = (rng.random((19, 23)) * 255).astype(np.float32)
    for size in [3, 7]:
        want = ndimage.uniform_filter(img, size=size)
        got = np.asarray(uniform_filter(jnp.asarray(img), size))
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_sharpen_preserves_border():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 11, 3)).astype(np.float32)
    out = np.asarray(sharpen_pil(jnp.asarray(img)))
    np.testing.assert_array_equal(out[0], img[0])
    np.testing.assert_array_equal(out[-1], img[-1])
    np.testing.assert_array_equal(out[:, 0], img[:, 0])
    np.testing.assert_array_equal(out[:, -1], img[:, -1])
    # Interior follows the PIL SHARPEN kernel.
    k = np.array([[-2, -2, -2], [-2, 32, -2], [-2, -2, -2]], np.float64) / 16.0
    want = np.clip(
        np.round(
            sum(
                k[dy + 1, dx + 1] * img[1 + dy : 8 + dy, 1 + dx : 10 + dx]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            )
        ),
        0,
        255,
    )
    np.testing.assert_allclose(out[1:-1, 1:-1], want, atol=0.51)


def test_rgb2ycbcr_known_values():
    # Pure white -> Y=235, Cb=Cr=128; pure black -> Y=16.
    white = jnp.full((1, 1, 3), 255.0)
    black = jnp.zeros((1, 1, 3))
    yw = np.asarray(rgb2ycbcr(white))[0, 0]
    yb = np.asarray(rgb2ycbcr(black))[0, 0]
    np.testing.assert_allclose(yw, [235.0, 128.0, 128.0], atol=1e-3)
    np.testing.assert_allclose(yb, [16.0, 128.0, 128.0], atol=1e-3)
    # Pure red: Y = 16 + 65.481
    red = jnp.asarray([[[255.0, 0.0, 0.0]]])
    np.testing.assert_allclose(np.asarray(rgb2y(red))[0, 0], 16 + 65.481, atol=1e-3)


def test_ycbcr_roundtrip():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (8, 8, 3)).astype(np.float32)
    back = np.asarray(ycbcr2rgb(rgb2ycbcr(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-2)
