"""Pallas fused blocks vs the flax reference modules (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.models.blocks import LightBlock, Light53Block
from image_enhance_keras_tpu.ops.pallas.blocks import (
    fused_light_block,
    fused_light53_block,
)


def test_fused_light_matches_flax():
    c = 128
    mod = LightBlock(c)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, c)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = mod.apply({"params": params}, x)
    got = fused_light_block(
        x,
        params["conv_a"]["kernel"], params["conv_a"]["bias"],
        params["conv_b"]["kernel"], params["conv_b"]["bias"],
        res_scale=0.1,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_light53_matches_flax():
    c = 128
    mod = Light53Block(c)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, c)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = mod.apply({"params": params}, x)
    got = fused_light53_block(
        x,
        params["conv_a1"]["kernel"], params["conv_a1"]["bias"],
        params["conv_a2"]["kernel"], params["conv_a2"]["bias"],
        params["conv_b1"]["kernel"], params["conv_b1"]["bias"],
        params["conv_b2"]["kernel"], params["conv_b2"]["bias"],
        res_scale=0.1,
        identity_scale=0.9,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_im2col_layout_matches_shifted():
    """The im2col single-dot contraction produces the same block output as
    the shifted-dot layout (ROADMAP r1 MFU experiment)."""
    import jax

    rng = np.random.default_rng(7)
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 8, 16, c)).astype(np.float32) * 0.3)
    ws = [jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
          for s in ((3, 3, c, c), (c,), (5, 5, c, c), (c,),
                    (5, 5, c, c), (c,), (3, 3, c, c), (c,))]
    a = np.asarray(fused_light53_block(x, *ws, interpret=True))
    b = np.asarray(fused_light53_block(x, *ws, interpret=True, im2col=True))
    np.testing.assert_allclose(a, b, atol=2e-5)

    ws2 = ws[:2] + ws[6:]
    a = np.asarray(fused_light_block(x, *ws2, interpret=True))
    b = np.asarray(fused_light_block(x, *ws2, interpret=True, im2col=True))
    np.testing.assert_allclose(a, b, atol=2e-5)
