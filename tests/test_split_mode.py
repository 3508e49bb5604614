"""Split-mode (whole-frame body + halo-striped tail) and phase-upsample tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.ops.resize import (
    resize2d,
    upsample_phase_tf1,
    resize_weight_matrix,
)
from tests.test_engine_e2e import _tiny_resolver


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("hw", [(5, 7), (8, 8)])
def test_phase_upsample_matches_matmul_resize(factor, hw):
    """The phase-interleave closed form equals the dense TF1 resize matmul
    (same align_corners=False semantics, reference models.py:1392-1399)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, *hw, 3)).astype(np.float32))
    got = upsample_phase_tf1(x, factor)
    want = resize2d(x, (hw[0] * factor, hw[1] * factor), "tf1_bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_phase_upsample_weights_exact():
    """Spot-check the TF1 weight table: out[4k+r] = (1-r/4) in[k] + r/4 in[k+1]."""
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 4, 1, 1))
    up = np.asarray(upsample_phase_tf1(x, 4))[0, :, 0, 0]
    k = np.arange(16) // 4
    r = np.arange(16) % 4
    want = (1 - r / 4) * k + (r / 4) * np.minimum(k + 1, 3)
    np.testing.assert_allclose(up, want, atol=1e-6)


@pytest.mark.parametrize("hw", [(40, 56), (64, 48), (13, 24), (7, 16)])
def test_split_equals_fast_bitexact(hw):
    """mode='split' must reproduce the whole-frame forward bit-for-bit: the
    stripe halo covers the tail receptive field and edge clamping/zero
    padding coincide with the whole-frame program at image borders."""
    r = _tiny_resolver()
    r.split_tile = 16
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    fast = np.asarray(r._fast_fn(hw)(r.params, jnp.asarray(img)))
    split = np.asarray(r._split_fn(hw)(r.params, jnp.asarray(img)))
    np.testing.assert_array_equal(split, fast)


def test_split_mode_dispatch():
    r = _tiny_resolver()
    r.mode = "split"
    r.split_tile = 8
    img = np.random.default_rng(4).integers(0, 256, (20, 20, 3), dtype=np.uint8)
    out = r.upscale(img)
    assert out.shape == (80, 80, 3) and out.dtype == np.uint8


def test_split_equals_fast_subpixel_head():
    """The depth_to_space alternative head is also halo-exact."""
    from tests.test_engine_e2e import _tiny_resolver as mk

    r = mk()
    import jax as _jax
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models import init_params

    module = DifvdsrDouble(
        features=16, n_body53=2, n_light=1, n_tail53=1, upsampler="subpixel"
    )
    r.module = module
    r.params = init_params(module, _jax.random.PRNGKey(1), input_hw=(16, 16))
    hw = (26, 20)
    img = np.random.default_rng(5).integers(0, 256, (*hw, 3), dtype=np.uint8)
    r.split_tile = 8
    fast = np.asarray(r._fast_fn(hw)(r.params, jnp.asarray(img)))
    split = np.asarray(r._split_fn(hw)(r.params, jnp.asarray(img)))
    np.testing.assert_array_equal(split, fast)


def test_split_int8_matches_fast_int8():
    """mode='split' + forward='pallas_int8' (bounded-memory int8 serving):
    the int8 tail sees different quantization windows per stripe, so parity
    vs the whole-frame int8 forward is near-exact, not bitwise — bound the
    deviation to a couple of uint8 levels on a tiny model."""
    r = _tiny_resolver()
    r.forward_mode = "pallas_int8"
    r.split_tile = 8
    hw = (24, 24)
    img = np.random.default_rng(7).integers(0, 256, (*hw, 3), dtype=np.uint8)
    qp = r._fwd_params()
    fast = np.asarray(r._fast_fn(hw)(qp, jnp.asarray(img))).astype(np.int32)
    split = np.asarray(r._split_fn(hw)(qp, jnp.asarray(img))).astype(np.int32)
    assert np.abs(split - fast).max() <= 3
    assert (split != fast).mean() < 0.05


def test_pipeline_chunking_no_waste():
    """Tiled pipeline output is identical for any tile_chunk (the chunking
    must never change results, only the schedule) including non-divisor
    chunks that previously padded the batch with dummy tiles."""
    outs = []
    img = np.random.default_rng(6).integers(0, 256, (70, 90, 3), dtype=np.uint8)
    for chunk in (1, 3, 5, 16, 64):
        r = _tiny_resolver()
        r.tile_chunk = chunk
        outs.append(r.upscale(img))
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])


def test_param_tree_unchanged_by_setup_refactor():
    """The setup()-style didbl module must keep the exact scope names the
    checkpoints/importer rely on (level1, body53_i, light_i, tail53_i, out)."""
    r = _tiny_resolver()
    names = set(r.params.keys())
    assert names == {
        "level1", "body53_0", "body53_1", "light_0", "tail53_0", "out",
    }
    assert set(r.params["body53_0"].keys()) == {
        "conv_a1", "conv_a2", "conv_b1", "conv_b2",
    }


@pytest.mark.parametrize("hw", [(24, 20), (17, 16)])
def test_difv4_split_equals_fast_bitexact(hw):
    """difv4's progressive 2x+2x graph also splits exactly: body through the
    mid tower at 2x, tail (second upsample + 6 blocks, RF 13) over halo'd
    stripes of the 2x map."""
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models.difv4 import Difvdsr4
    from image_enhance_keras_tpu.models.zoo import ModelSpec
    from image_enhance_keras_tpu.models import init_params

    module = Difvdsr4(features=16, n_head=1, n_mid=2, n_tail=2)
    r = SuperResolver.__new__(SuperResolver)
    r.model_name = "difv4_tiny"
    r.module = module
    r.spec = ModelSpec("difv4_tiny", lambda **k: module, 4, False, "tiny", "w")
    r.patch, r.step, r.crop = 48, 32, 8
    r.scalemulti = 4
    r.tile_chunk = 8
    r.mode = "split"
    r.fast_max_pixels = 1 << 20
    r.split_tile = 16
    r.forward_mode = "xla"
    r._dtype = None
    r._jitted = {}
    r._jitted_fast = {}
    r.params = init_params(module, jax.random.PRNGKey(2), input_hw=(16, 16))

    img = np.random.default_rng(8).integers(0, 256, (*hw, 3), dtype=np.uint8)
    fast = np.asarray(r._fast_fn(hw)(r.params, jnp.asarray(img)))
    split = np.asarray(r._split_fn(hw)(r.params, jnp.asarray(img)))
    assert split.shape == (hw[0] * 4, hw[1] * 4, 3)
    np.testing.assert_array_equal(split, fast)


def test_difv4_split_int8_matches_fast_int8():
    """difv4 split + forward='int8': striped tail tracks whole-frame int8."""
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models.difv4 import Difvdsr4
    from image_enhance_keras_tpu.models.zoo import ModelSpec
    from image_enhance_keras_tpu.models import init_params

    module = Difvdsr4(features=16, n_head=1, n_mid=2, n_tail=2)
    r = SuperResolver.__new__(SuperResolver)
    r.model_name = "difv4_tiny"
    r.module = module
    r.spec = ModelSpec("difv4_tiny", lambda **k: module, 4, False, "tiny", "w")
    r.patch, r.step, r.crop = 48, 32, 8
    r.scalemulti = 4
    r.tile_chunk = 8
    r.mode = "split"
    r.fast_max_pixels = 1 << 20
    r.split_tile = 16
    r.forward_mode = "int8"
    r._dtype = None
    r._jitted = {}
    r._jitted_fast = {}
    r.params = init_params(module, jax.random.PRNGKey(2), input_hw=(16, 16))

    hw = (24, 24)
    img = np.random.default_rng(9).integers(0, 256, (*hw, 3), dtype=np.uint8)
    qp = r._fwd_params()
    fast = np.asarray(r._fast_fn(hw)(qp, jnp.asarray(img))).astype(np.int32)
    split = np.asarray(r._split_fn(hw)(qp, jnp.asarray(img))).astype(np.int32)
    assert split.shape == (96, 96, 3)
    assert np.abs(split - fast).max() <= 1


@pytest.mark.parametrize("hw", [(40, 56), (13, 24), (24, 24), (7, 16)])
def test_split2d_equals_fast_bitexact(hw):
    """The 2-D tiled tail (split_tile_w) must also be bit-exact vs fast:
    shifted uniform tiles keep full receptive-field context around every
    owned pixel, and tile borders only coincide with true image borders."""
    r = _tiny_resolver()
    r.split_tile = 8
    r.split_tile_w = 8
    r.split2d_chunk = 3  # force full-chunks + remainder path
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    fast = np.asarray(r._fast_fn(hw)(r.params, jnp.asarray(img)))
    split = np.asarray(r._split_fn(hw)(r.params, jnp.asarray(img)))
    np.testing.assert_array_equal(split, fast)


def test_split2d_nondivisor_chunk_warns(caplog, monkeypatch):
    """A chunk that leaves a remainder tile batch compiles a second tail
    program — measured ~2.4x slower (ROADMAP.md late-r3 sweep: 96/10 = 14.0
    vs 33.3 out-Mpix/s).  The engine must say so instead of silently
    serving the slow program (ADVICE r3)."""
    import logging

    monkeypatch.setattr(
        logging.getLogger("image_enhance_keras_tpu"), "propagate", True
    )
    img = np.random.default_rng(13).integers(0, 256, (40, 56, 3), dtype=np.uint8)

    r = _tiny_resolver(mode="split")
    r.split_tile = 8
    r.split_tile_w = 8
    r.split2d_chunk = 3  # 5x7=35 tiles -> remainder 2
    with caplog.at_level(logging.WARNING):
        r.upscale(img)
    assert any("does not divide" in rec.getMessage() for rec in caplog.records)

    # divisor geometry stays silent
    caplog.clear()
    r2 = _tiny_resolver(mode="split")
    r2.split_tile = 8
    r2.split_tile_w = 8
    r2.split2d_chunk = 7  # 35 tiles -> exact
    with caplog.at_level(logging.WARNING):
        r2.upscale(img)
    assert not any("does not divide" in rec.getMessage()
                   for rec in caplog.records)


def test_split2d_difv4_equals_fast_bitexact():
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models.difv4 import Difvdsr4
    from image_enhance_keras_tpu.models.zoo import ModelSpec
    from image_enhance_keras_tpu.models import init_params

    module = Difvdsr4(features=16, n_head=1, n_mid=2, n_tail=2)
    r = SuperResolver.__new__(SuperResolver)
    r.model_name = "difv4_tiny"
    r.module = module
    r.spec = ModelSpec("difv4_tiny", lambda **k: module, 4, False, "tiny", "w")
    r.patch, r.step, r.crop = 48, 32, 8
    r.scalemulti = 4
    r.tile_chunk = 8
    r.mode = "split"
    r.fast_max_pixels = 1 << 20
    r.split_tile = 16
    r.split_tile_w = 12
    r.forward_mode = "xla"
    r._dtype = None
    r._jitted = {}
    r._jitted_fast = {}
    r.params = init_params(module, jax.random.PRNGKey(2), input_hw=(16, 16))

    hw = (24, 20)
    img = np.random.default_rng(12).integers(0, 256, (*hw, 3), dtype=np.uint8)
    fast = np.asarray(r._fast_fn(hw)(r.params, jnp.asarray(img)))
    split = np.asarray(r._split_fn(hw)(r.params, jnp.asarray(img)))
    np.testing.assert_array_equal(split, fast)


def test_split2d_hlo_size_is_tile_count_invariant():
    """The gather-based split2d build must not grow the traced program with
    the tile count (VERDICT r2 weak 5: the old slice/stack build put ~1k
    slice ops in the HLO at poster sizes).  Compare lowered HLO text sizes
    at 4 tiles vs 64 tiles: same program shape, only constants change."""
    r = _tiny_resolver()
    r.split_tile = 8
    r.split_tile_w = 8

    def hlo_len(hw):
        fn = r._split_fn_2d(hw)
        img = jnp.zeros((*hw, 3), jnp.uint8)
        return len(fn.lower(r.params, img).as_text())

    small = hlo_len((16, 16))   # 2x2 tiles
    large = hlo_len((64, 64))   # 8x8 tiles
    assert large < 1.5 * small, (small, large)


def test_split2d_trace_cost_tile_count_invariant():
    """The separable-gather split2d build keeps trace+lower cost flat in
    tile count (SERVING.md): a 16x-tile program must not cost more than
    ~3x the small one to lower, and the HLO op count must not scale with
    tiles (only the constant index vectors grow)."""
    import re
    import time

    r = _tiny_resolver()
    r.split_tile = 8
    r.split_tile_w = 8

    def lower_one(hw):
        t0 = time.perf_counter()
        fn = r._split_fn_2d(hw)
        img = jnp.zeros((*hw, 3), jnp.uint8)
        low = fn.lower(r.params, img)
        dt = time.perf_counter() - t0
        txt = low.as_text()
        n_ops = len(re.findall(r"= \w+\[", txt))
        return dt, n_ops

    dt_small, ops_small = lower_one((32, 32))     # 4x4 = 16 tiles
    dt_big, ops_big = lower_one((128, 128))       # 16x16 = 256 tiles
    assert ops_big <= ops_small * 1.5, (ops_small, ops_big)
    assert dt_big <= max(3.0 * dt_small, dt_small + 2.0), (dt_small, dt_big)


def test_split2d_mixed_profile_bitexact():
    """The mixed profile (bf16 dots, f32 epilogues) keeps the split
    bit-exactness contract: split2d == fast on the same mixed module."""
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec
    from image_enhance_keras_tpu.models import init_params

    module = DifvdsrDouble(features=16, n_body53=2, n_light=1, n_tail53=1,
                           dtype=jnp.bfloat16, mixed=True)
    r = SuperResolver.__new__(SuperResolver)
    r.model_name = "didbl_tiny_mixed"
    r.module = module
    r.spec = ModelSpec("didbl_tiny_mixed", lambda **k: module, 4, False, "t", "w")
    r.patch, r.step, r.crop = 48, 32, 8
    r.scalemulti, r.tile_chunk = 4, 4
    r.mode = "split"
    r.fast_max_pixels = 1 << 20
    r.split_tile, r.split_tile_w = 8, 8
    r.forward_mode = "xla"
    r._dtype = jnp.bfloat16
    r._jitted, r._jitted_fast = {}, {}
    r.params = init_params(module, jax.random.PRNGKey(3), input_hw=(16, 16))

    hw = (40, 56)
    img = np.random.default_rng(19).integers(0, 256, (*hw, 3), dtype=np.uint8)
    fast = np.asarray(r._fast_fn(hw)(r.params, jnp.asarray(img)))
    split = np.asarray(r._split_fn(hw)(r.params, jnp.asarray(img)))
    np.testing.assert_array_equal(split, fast)
