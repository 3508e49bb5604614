"""TF1 resize kernels vs the REAL TensorFlow ops (truth gate, r4).

The production didbl graph upsamples in-graph with TF1
``resize_bilinear`` align_corners=False (reference models.py:1193,
1392-1399), and difv4 with two x2 calls (models.py:1033,1041).  This
repo restates that kernel three independent ways (dense MXU matmices in
``resize_weight_matrix``, the phase-interleave ``upsample_phase_tf1``,
and the NumPy oracle) — previously cross-checked only against each
other.  TF being importable closes the loop: every construction must
match ``tf.compat.v1.image.resize_*`` — the very ops the reference's
Lambdas call — bit-tight in f32 across a sweep of shapes including
non-integer ratios, upscales, and downscales.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from image_enhance_keras_tpu.ops.resize import (  # noqa: E402
    resize2d,
    resize_bilinear_tf1,
    upsample_phase_tf1,
)

# (in_h, in_w, out_h, out_w): integer up, integer down, non-integer both ways
SHAPES = [
    (5, 7, 20, 28),     # x4 up (the production didbl geometry)
    (12, 12, 24, 24),   # x2 up (difv4 geometry)
    (9, 13, 27, 26),    # x3 / x2 mixed integer up
    (10, 11, 7, 5),     # non-integer down
    (8, 8, 11, 13),     # non-integer up
    (16, 9, 16, 9),     # identity
    (1, 6, 4, 3),       # degenerate 1-px axis
]


def _tf1_resize(x, out_hw, method):
    fn = {
        "bilinear": tf.compat.v1.image.resize_bilinear,
        "bicubic": tf.compat.v1.image.resize_bicubic,
        "nearest": tf.compat.v1.image.resize_nearest_neighbor,
    }[method]
    return fn(tf.constant(x[None]), out_hw).numpy()[0]


@pytest.mark.parametrize("shape", SHAPES)
def test_resize2d_tf1_bilinear_matches_tf(shape):
    ih, iw, oh, ow = shape
    rng = np.random.default_rng(ih * 100 + ow)
    x = rng.standard_normal((ih, iw, 3)).astype(np.float32)
    want = _tf1_resize(x, (oh, ow), "bilinear")
    got = np.asarray(resize2d(jnp.asarray(x), (oh, ow), method="tf1_bilinear"))
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("shape", SHAPES)
def test_resize2d_tf1_bicubic_matches_tf(shape):
    ih, iw, oh, ow = shape
    rng = np.random.default_rng(ih * 100 + ow + 1)
    x = rng.standard_normal((ih, iw, 3)).astype(np.float32)
    want = _tf1_resize(x, (oh, ow), "bicubic")
    got = np.asarray(resize2d(jnp.asarray(x), (oh, ow), method="tf1_bicubic"))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_resize2d_tf1_nearest_matches_tf(shape):
    ih, iw, oh, ow = shape
    rng = np.random.default_rng(ih * 100 + ow + 2)
    x = rng.standard_normal((ih, iw, 3)).astype(np.float32)
    want = _tf1_resize(x, (oh, ow), "nearest")
    got = np.asarray(resize2d(jnp.asarray(x), (oh, ow), method="tf1_nearest"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("factor", [2, 4])
def test_phase_interleave_matches_tf(factor):
    """The production forward's upsampler (phase interleave, not a matmul)
    == the genuine TF1 kernel at the graph's integer factors."""
    rng = np.random.default_rng(factor)
    x = rng.standard_normal((2, 6, 9, 5)).astype(np.float32)
    got = np.asarray(upsample_phase_tf1(jnp.asarray(x), factor))
    for b in range(2):
        want = _tf1_resize(x[b], (6 * factor, 9 * factor), "bilinear")
        np.testing.assert_allclose(got[b], want, atol=2e-6)


def test_resize_bilinear_tf1_alias_matches_tf():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 7, 3)).astype(np.float32)
    want = _tf1_resize(x, (20, 28), "bilinear")
    got = np.asarray(resize_bilinear_tf1(jnp.asarray(x), (20, 28)))
    np.testing.assert_allclose(got, want, atol=2e-6)
