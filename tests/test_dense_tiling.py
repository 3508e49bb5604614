"""Dense patch plane + adjustment ops tests (sklearn-order oracle loops)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.tiling.dense import (
    extract_dense_patches,
    reconstruct_average,
)
from image_enhance_keras_tpu.ops.adjust import set_gamma, set_contrast, smooth_gan_labels


def _extract_oracle(img, p, step):
    out = []
    for y in range(0, img.shape[0] - p + 1, step):
        for x in range(0, img.shape[1] - p + 1, step):
            out.append(img[y : y + p, x : x + p])
    return np.stack(out)


@pytest.mark.parametrize("step", [1, 3])
def test_extract_dense_matches_oracle(step):
    rng = np.random.default_rng(0)
    img = rng.random((12, 14, 3)).astype(np.float32)
    got = np.asarray(extract_dense_patches(jnp.asarray(img), 5, step))
    want = _extract_oracle(img, 5, step)
    np.testing.assert_array_equal(got, want)


def test_reconstruct_average_identity_stride1():
    """Dense stride-1 extract -> average rebuild is the identity (the sklearn
    reconstruct_from_patches_2d property, img_utils.py:189-238)."""
    rng = np.random.default_rng(1)
    img = rng.random((10, 12, 3)).astype(np.float32)
    patches = extract_dense_patches(jnp.asarray(img), 4, 1)
    back = reconstruct_average(patches, (10, 12), step=1, pad=0)
    np.testing.assert_allclose(np.asarray(back), img, atol=1e-5)


@pytest.mark.parametrize("h,w", [(16, 16), (20, 24)])
def test_reconstruct_average_oracle_with_pad(h, w):
    """Stride grid with the reference's all-or-nothing edge trim matches a
    loop oracle mirroring reconstruct_from_patches_2dlocal
    (img_utils.py:469-481: trim only fully-interior patches, paste whole if
    the patch is first/last in either axis)."""
    rng = np.random.default_rng(2)
    p, step, pad = 8, 4, 2
    img = rng.random((h, w, 3)).astype(np.float32)
    patches = np.asarray(extract_dense_patches(jnp.asarray(img), p, step))

    acc = np.zeros((h, w, 3))
    cnt = np.zeros((h, w, 1))
    ys = list(range(0, h - p + 1, step))
    xs = list(range(0, w - p + 1, step))
    k = 0
    for y in ys:
        for x in xs:
            interior = y > 0 and x > 0 and y < ys[-1] and x < xs[-1]
            t = pad if interior else 0
            acc[y + t : y + p - t, x + t : x + p - t] += patches[k, t : p - t, t : p - t]
            cnt[y + t : y + p - t, x + t : x + p - t] += 1
            k += 1
    assert cnt.min() > 0  # full coverage (the repo's last-stride rule)
    want = acc / cnt

    got = np.asarray(reconstruct_average(jnp.asarray(patches), (h, w), step=step, pad=pad))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_set_gamma_contrast():
    img = jnp.asarray([[[0.0, 127.5, 255.0]]])
    np.testing.assert_allclose(np.asarray(set_gamma(img, 1.0))[0, 0], [0, 128, 255], atol=1)
    out = np.asarray(set_contrast(img, 0.5))[0, 0]
    np.testing.assert_allclose(out, [64, 128, 191], atol=1)


def test_smooth_gan_labels_ranges():
    y = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    s = np.asarray(smooth_gan_labels(y, jax.random.PRNGKey(0)))
    assert (s[y == 0] <= 0.3).all() and (s[y == 0] >= 0.0).all()
    assert (s[np.asarray(y) == 1] >= 0.7).all() and (s[np.asarray(y) == 1] <= 1.2).all()


def test_reconstruct_average_uint8_patches():
    """Integer patches accumulate in f32 (review r3: uint8 scatter-add
    wrapped at 256 across overlaps)."""
    import numpy as np
    import jax.numpy as jnp

    from image_enhance_keras_tpu.tiling.dense import (
        extract_dense_patches,
        reconstruct_average,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(200, 256, (12, 12, 3), dtype=np.uint8)  # high values
    patches = extract_dense_patches(jnp.asarray(img), 6, 2)
    back = np.asarray(reconstruct_average(patches.astype(jnp.uint8), (12, 12), step=2))
    np.testing.assert_allclose(back, img.astype(np.float32), atol=1e-3)
