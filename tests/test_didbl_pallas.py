"""Pallas-fused didbl forward == flax forward (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
from image_enhance_keras_tpu.models.didbl_pallas import apply_didbl_pallas


def test_apply_didbl_pallas_matches_flax():
    module = DifvdsrDouble(features=128, n_body53=2, n_light=1, n_tail53=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 12, 12, 3)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    want = module.apply({"params": params}, x)
    got = apply_didbl_pallas(
        params, x, n_body53=2, n_light=1, n_tail53=1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_apply_didbl_pallas_chain_matches_flax():
    module = DifvdsrDouble(features=128, n_body53=2, n_light=2, n_tail53=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 10, 10, 3)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(1), x)["params"]
    want = module.apply({"params": params}, x)
    got = apply_didbl_pallas(
        params, x, n_body53=2, n_light=2, n_tail53=1, interpret=True, chain=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
