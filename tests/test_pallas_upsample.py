"""Streaming Pallas TF1-bilinear upsample vs the XLA phase interleave
(ops/pallas/upsample.py; reference semantics models.py:1392-1399)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1
from image_enhance_keras_tpu.ops.pallas.upsample import upsample_phase_tf1_pallas


@pytest.mark.parametrize(
    "shape,f",
    [
        ((1, 8, 16, 128), 4),
        ((2, 6, 8, 128), 2),
        ((1, 5, 8, 128), 4),   # H not divisible by default block_rows path
        ((1, 12, 8, 64), 4),   # C != 128
        ((1, 14, 14, 128), 4),  # W not x8: single padded 16-col block
        ((2, 134, 134, 128), 4),  # the split2d halo-tile shape (W8=136)
        ((1, 10, 150, 128), 4),  # W8=152 > 136: multi-block 128-col padding
    ],
)
def test_matches_xla_interleave(shape, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = np.asarray(upsample_phase_tf1(x, f))
    out = np.asarray(upsample_phase_tf1_pallas(x, f))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_bf16_bit_identical():
    """The serving dtype: same weighted sums in the same dtype — bitwise."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)), jnp.bfloat16)
    ref = np.asarray(upsample_phase_tf1(x, 4).astype(jnp.float32))
    out = np.asarray(upsample_phase_tf1_pallas(x, 4).astype(jnp.float32))
    np.testing.assert_array_equal(out, ref)


def test_edge_clamp_semantics():
    """Last row/column clamp (align_corners=False closed form)."""
    x = jnp.broadcast_to(
        jnp.arange(4.0)[None, :, None, None], (1, 4, 4, 128)
    ).astype(jnp.float32)
    out = np.asarray(upsample_phase_tf1_pallas(x, 4))[0, :, 0, 0]
    want = np.asarray(upsample_phase_tf1(x, 4))[0, :, 0, 0]
    np.testing.assert_allclose(out, want, atol=1e-6)
    assert out[-1] == out[-2] == out[-3] == 3.0  # clamped tail


def test_factor_one_identity():
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(upsample_phase_tf1_pallas(x, 1)), np.asarray(x)
    )


def test_env_dispatch_cpu_stays_xla(monkeypatch):
    """IEK_PALLAS_UPSAMPLE=1 must NOT reroute on non-TPU backends (the
    kernel targets Mosaic; CPU keeps the XLA construction)."""
    monkeypatch.setenv("IEK_PALLAS_UPSAMPLE", "1")
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 4, 8)),
                    jnp.float32)
    out = upsample_phase_tf1(x, 4)  # would only differ in lowering, but must run
    assert out.shape == (1, 16, 16, 8)


def test_pallas_route_is_differentiable():
    """The serving opt-in must not break jax.grad on the shared op: the
    custom_vjp wrapper backs the kernel with the XLA construction's
    transpose (the op is linear), so train graphs survive
    IEK_PALLAS_UPSAMPLE=1."""
    from image_enhance_keras_tpu.ops.resize import (
        _upsample_pallas_ad,
        _upsample_phase_xla,
    )

    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 4, 8, 8)), jnp.float32
    )
    w = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 16, 32, 8)), jnp.float32
    )
    g_pallas = jax.grad(lambda t: jnp.sum(_upsample_pallas_ad(t, 4) * w))(x)
    g_xla = jax.grad(lambda t: jnp.sum(_upsample_phase_xla(t, 4) * w))(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=1e-5)
