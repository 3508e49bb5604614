"""depth_to_space vs the REAL tf.nn.depth_to_space (truth gate, r4).

``ops/pixel_shuffle.depth_to_space(order="dcr")`` claims TF's
``tf.depth_to_space`` channel convention — the op the reference's
``SubpixelConv2D`` Lambda wraps (advanced.py:173-199).  Previously checked
only against a hand-written NumPy restatement; with TF importable, pin it
to the genuine op, plus the space_to_depth inverse.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from image_enhance_keras_tpu.ops.pixel_shuffle import (  # noqa: E402
    depth_to_space,
    space_to_depth,
)


@pytest.mark.parametrize("r", [2, 3, 4])
@pytest.mark.parametrize("c", [1, 3])
def test_dcr_matches_tf_depth_to_space(r, c):
    rng = np.random.default_rng(r * 10 + c)
    x = rng.standard_normal((2, 5, 7, r * r * c)).astype(np.float32)
    want = tf.nn.depth_to_space(tf.constant(x), r).numpy()
    got = np.asarray(depth_to_space(jnp.asarray(x), r, order="dcr"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("r", [2, 4])
def test_space_to_depth_matches_tf(r):
    rng = np.random.default_rng(r)
    x = rng.standard_normal((1, 4 * r, 3 * r, 5)).astype(np.float32)
    want = tf.nn.space_to_depth(tf.constant(x), r).numpy()
    got = np.asarray(space_to_depth(jnp.asarray(x), r, order="dcr"))
    np.testing.assert_array_equal(got, want)
