"""int8 Pallas block kernels (interpret mode on CPU) vs the f32 graph.

Quantization error budget: per-tile symmetric int8 activations + per-channel
int8 weights give conv outputs within ~1-2% relative of f32; the residual
epilogue (identity in full precision, branches scaled by 0.1) shrinks the
block-output error by another 10x.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.ops.pallas.int8_blocks import (
    quantize_weights_per_channel,
    light53_int8,
    light_int8,
)


def _f32_light53(x, ws, res=0.1, ident=0.9):
    from jax import lax

    def conv(x, w, b):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + b

    (wa1, ba1), (wa2, ba2), (wb1, bb1), (wb2, bb2) = ws
    a = conv(jnp.maximum(conv(x, wa1, ba1), 0.0), wa2, ba2)
    b = conv(jnp.maximum(conv(x, wb1, bb1), 0.0), wb2, bb2)
    return ident * x + res * (a + b)


def _f32_light(x, ws, res=0.1):
    from jax import lax

    def conv(x, w, b):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + b

    (w1, b1), (w2, b2) = ws
    return x + res * conv(jnp.maximum(conv(x, w1, b1), 0.0), w2, b2)


def _mk(shape, rng, scale=0.05):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


@pytest.mark.parametrize("hw,tile", [((16, 16), (8, 16)), ((12, 24), (12, 8))])
def test_light53_int8_close_to_f32(hw, tile):
    rng = np.random.default_rng(0)
    c = 128
    x = _mk((2, *hw, c), rng, 0.5)
    ws = [(_mk((k, k, c, c), rng), _mk((c,), rng, 0.01))
          for k in (3, 5, 5, 3)]
    want = np.asarray(_f32_light53(x, ws))

    qs = []
    for w, b in ws:
        q, s = quantize_weights_per_channel(w)
        qs += [q, s, b]
    got = np.asarray(
        light53_int8(x, *qs, tile=tile, interpret=True), dtype=np.float32
    )
    # relative error vs the signal's scale
    denom = np.abs(want).mean() + 1e-6
    rel = np.abs(got - want).mean() / denom
    assert rel < 0.01, f"mean rel err {rel:.4f}"
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-6) < 0.05


def test_light_int8_close_to_f32():
    rng = np.random.default_rng(1)
    c = 128
    x = _mk((1, 16, 16, c), rng, 0.5)
    ws = [(_mk((3, 3, c, c), rng), _mk((c,), rng, 0.01)) for _ in range(2)]
    want = np.asarray(_f32_light(x, ws))
    qs = []
    for w, b in ws:
        q, s = quantize_weights_per_channel(w)
        qs += [q, s, b]
    got = np.asarray(light_int8(x, *qs, tile=(8, 16), interpret=True),
                     dtype=np.float32)
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-6)
    assert rel < 0.01, f"mean rel err {rel:.4f}"


def test_tiling_invariance():
    """Same math regardless of the spatial tile split (per-tile activation
    scales differ, so allow the int8 LSB, not exact equality)."""
    rng = np.random.default_rng(2)
    c = 128
    x = _mk((1, 16, 16, c), rng, 0.5)
    ws = [(_mk((k, k, c, c), rng), _mk((c,), rng, 0.01)) for k in (3, 5, 5, 3)]
    qs = []
    for w, b in ws:
        q, s = quantize_weights_per_channel(w)
        qs += [q, s, b]
    a = np.asarray(light53_int8(x, *qs, tile=(16, 16), interpret=True), np.float32)
    b = np.asarray(light53_int8(x, *qs, tile=(8, 8), interpret=True), np.float32)
    assert np.abs(a - b).mean() < 0.01 * (np.abs(a).mean() + 1e-6)


def test_full_int8_forward_runs_and_tracks_f32():
    """apply_didbl_int8 on a tiny didbl vs the f32 module output."""
    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.didbl_pallas import (
        quantize_didbl_params,
        apply_didbl_int8,
    )

    module = DifvdsrDouble(features=128, n_body53=1, n_light=1, n_tail53=1)
    params = init_params(module, jax.random.PRNGKey(0), input_hw=(8, 8))
    qp = quantize_didbl_params(params, n_body53=1, n_light=1, n_tail53=1)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    want = np.asarray(module.apply({"params": params}, x))
    got = np.asarray(
        apply_didbl_int8(qp, x, n_body53=1, n_light=1, n_tail53=1,
                         tile=(8, 8), interpret=True)
    )
    assert got.shape == want.shape == (1, 32, 32, 3)
    # int8 quantization noise at image scale [0,1]: well under 1/255
    assert np.abs(got - want).mean() < 2e-3
    assert np.abs(got - want).max() < 2e-2


def test_full_int8_forward_with_static_calibrated_scales():
    """calib_x embeds per-block activation scales ("act"); the static-scale
    kernels must track f32 as closely as dynamic quantization."""
    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.didbl_pallas import (
        quantize_didbl_params,
        apply_didbl_int8,
    )

    module = DifvdsrDouble(features=128, n_body53=1, n_light=1, n_tail53=1)
    params = init_params(module, jax.random.PRNGKey(0), input_hw=(8, 8))
    rng = np.random.default_rng(4)
    calib = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    qp = quantize_didbl_params(
        params, n_body53=1, n_light=1, n_tail53=1, calib_x=calib
    )
    assert "act" in qp["body53_0"] and qp["body53_0"]["act"].shape == (3,)
    assert qp["light_0"]["act"].shape == (2,)
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    want = np.asarray(module.apply({"params": params}, x))
    got = np.asarray(
        apply_didbl_int8(qp, x, n_body53=1, n_light=1, n_tail53=1,
                         tile=(8, 8), interpret=True)
    )
    assert np.abs(got - want).mean() < 2e-3
    assert np.abs(got - want).max() < 2e-2


def test_xla_int8_forward_tracks_f32():
    """forward='int8' (XLA native-rate conv path, 2x bf16 measured on v5e)
    must track the f32 module like the Pallas int8 path."""
    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.didbl_pallas import (
        quantize_didbl_params,
        apply_didbl_int8_xla,
    )

    module = DifvdsrDouble(features=128, n_body53=1, n_light=1, n_tail53=1)
    params = init_params(module, jax.random.PRNGKey(0), input_hw=(8, 8))
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    qp = quantize_didbl_params(
        params, n_body53=1, n_light=1, n_tail53=1, calib_x=calib
    )
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    want = np.asarray(module.apply({"params": params}, x))
    got = np.asarray(apply_didbl_int8_xla(qp, x, n_body53=1, n_light=1, n_tail53=1))
    assert got.shape == want.shape
    assert np.abs(got - want).mean() < 2e-3
    assert np.abs(got - want).max() < 2e-2


def test_xla_int8_requires_calibration():
    import pytest
    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.didbl_pallas import (
        quantize_didbl_params,
        apply_didbl_int8_xla,
    )

    module = DifvdsrDouble(features=16, n_body53=1, n_light=1, n_tail53=1)
    params = init_params(module, jax.random.PRNGKey(0), input_hw=(8, 8))
    qp = quantize_didbl_params(params, n_body53=1, n_light=1, n_tail53=1)
    with pytest.raises(ValueError, match="calib"):
        apply_didbl_int8_xla(qp, jnp.zeros((1, 8, 8, 3)),
                             n_body53=1, n_light=1, n_tail53=1)


def test_difv4_int8_tracks_f32():
    """Zoo int8: Difvdsr4 via the generic XLA-int8 path."""
    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.difv4 import Difvdsr4
    from image_enhance_keras_tpu.models.zoo_int8 import (
        quantize_difv4_params,
        apply_difv4_int8,
    )

    module = Difvdsr4(features=64, n_head=1, n_mid=2, n_tail=1)
    params = init_params(module, jax.random.PRNGKey(1), input_hw=(8, 8))
    rng = np.random.default_rng(6)
    calib = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    qp = quantize_difv4_params(params, calib, n_head=1, n_mid=2, n_tail=1)
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    want = np.asarray(module.apply({"params": params}, x))
    got = np.asarray(apply_difv4_int8(qp, x, n_head=1, n_mid=2, n_tail=1))
    assert got.shape == want.shape == (1, 32, 32, 3)
    assert np.abs(got - want).mean() < 2e-3
    assert np.abs(got - want).max() < 2e-2


def test_difvdsr_int8_tracks_f32():
    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.difvdsr import Difvdsr
    from image_enhance_keras_tpu.models.zoo_int8 import (
        quantize_difvdsr_params,
        apply_difvdsr_int8,
    )

    module = Difvdsr(features=64, n_blocks=2)
    params = init_params(module, jax.random.PRNGKey(2), input_hw=(12, 12))
    rng = np.random.default_rng(7)
    calib = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    qp = quantize_difvdsr_params(params, calib, n_blocks=2)
    x = jnp.asarray(rng.random((1, 12, 12, 3)).astype(np.float32))
    want = np.asarray(module.apply({"params": params}, x))
    got = np.asarray(apply_difvdsr_int8(qp, x, n_blocks=2))
    assert got.shape == want.shape
    assert np.abs(got - want).mean() < 2e-3
    assert np.abs(got - want).max() < 2e-2


def test_int8_support_dispatch():
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.difv4 import Difvdsr4
    from image_enhance_keras_tpu.models.difvdsr import Difvdsr
    from image_enhance_keras_tpu.models.zoo_int8 import int8_support

    assert int8_support(DifvdsrDouble(features=16)) is not None
    assert int8_support(Difvdsr4(features=16)) is not None
    sup = int8_support(Difvdsr(features=16))
    assert sup is not None and sup[2] is None  # no split decomposition
    # subpixel head gained int8 support in r3 (folded subpixel conv)
    assert int8_support(DifvdsrDouble(features=16, upsampler="subpixel")) is not None
