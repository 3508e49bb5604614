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
