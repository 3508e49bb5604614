"""Winograd conv correctness.

Gate 1: the generated transforms satisfy the minimal-filtering identity
EXACTLY (float64 algebra) — A^T[(Gg) . (B^T d)] == valid correlation for
random d, g at every supported (m, k).

Gate 2: winograd_conv2d_same matches lax.conv SAME numerically in f32
(transform conditioning only), including non-multiple-of-m sizes and bias.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from image_enhance_keras_tpu.ops.winograd import (
    winograd_matrices,
    winograd_conv2d_same,
    flops_ratio,
    _matrices_np,
)


@pytest.mark.parametrize("m,k", [(2, 3), (4, 3), (2, 5), (3, 3), (2, 7)])
def test_transform_identity_1d(m, k):
    A_t, G, B_t = _matrices_np(m, k)
    rng = np.random.default_rng(0)
    n = m + k - 1
    for _ in range(20):
        d = rng.standard_normal(n)
        g = rng.standard_normal(k)
        y = A_t @ ((G @ g) * (B_t @ d))
        ref = np.array([np.dot(d[i : i + k], g) for i in range(m)])
        np.testing.assert_allclose(y, ref, rtol=1e-9, atol=1e-9)


def _conv_ref(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    return y + b


@pytest.mark.parametrize("m,k", [(2, 3), (4, 3), (2, 5)])
@pytest.mark.parametrize("hw", [(16, 16), (13, 17), (8, 30)])
def test_conv2d_same_matches_xla(m, k, hw):
    rng = np.random.default_rng(1)
    h, w_ = hw
    x = jnp.asarray(rng.standard_normal((2, h, w_, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 8, 16)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    y = winograd_conv2d_same(x, w, b, m=m)
    ref = _conv_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flops_ratio():
    assert flops_ratio(2, 3) == pytest.approx(2.25)
    assert flops_ratio(2, 5) == pytest.approx(100 / 36)
    assert flops_ratio(4, 3) == pytest.approx(4.0)


def test_bf16_dots_reasonable():
    """bf16 dot path stays within quantization-comparable error of f32."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.1, jnp.float32)
    ref = np.asarray(_conv_ref(x, w, jnp.zeros(32)))
    y = np.asarray(
        winograd_conv2d_same(x, w, None, m=2, dtype=jnp.bfloat16)
    )
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel
