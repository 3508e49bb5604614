"""Weight-streaming chain kernels vs sequential flax blocks (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.models.blocks import LightBlock, Light53Block
from image_enhance_keras_tpu.ops.pallas.tower import (
    fused_light53_chain,
    fused_light_chain,
)


def test_light53_chain_matches_sequential_flax():
    c, k = 128, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, c)).astype(np.float32))
    mods = [Light53Block(c) for _ in range(k)]
    params = [m.init(jax.random.PRNGKey(i), x)["params"] for i, m in enumerate(mods)]
    want = x
    for m, p in zip(mods, params):
        want = m.apply({"params": p}, want)
    got = fused_light53_chain(
        x,
        jnp.stack([p["conv_a1"]["kernel"] for p in params]),
        jnp.stack([p["conv_a1"]["bias"] for p in params]),
        jnp.stack([p["conv_a2"]["kernel"] for p in params]),
        jnp.stack([p["conv_a2"]["bias"] for p in params]),
        jnp.stack([p["conv_b1"]["kernel"] for p in params]),
        jnp.stack([p["conv_b1"]["bias"] for p in params]),
        jnp.stack([p["conv_b2"]["kernel"] for p in params]),
        jnp.stack([p["conv_b2"]["bias"] for p in params]),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_light_chain_matches_sequential_flax():
    c, k = 128, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 10, 6, c)).astype(np.float32))
    mods = [LightBlock(c) for _ in range(k)]
    params = [m.init(jax.random.PRNGKey(10 + i), x)["params"] for i, m in enumerate(mods)]
    want = x
    for m, p in zip(mods, params):
        want = m.apply({"params": p}, want)
    got = fused_light_chain(
        x,
        jnp.stack([p["conv_a"]["kernel"] for p in params]),
        jnp.stack([p["conv_a"]["bias"] for p in params]),
        jnp.stack([p["conv_b"]["kernel"] for p in params]),
        jnp.stack([p["conv_b"]["bias"] for p in params]),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)
