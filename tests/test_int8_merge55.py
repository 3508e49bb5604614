"""Merged first-stage conv (IEK_INT8_MERGE55=1): each light53 block's two
first convs (branch a 3x3, branch b 5x5 — the reference's dual-kernel block,
/root/reference/models.py:1156-1199) run as ONE 5x5 conv with 2C output
channels, the 3x3 zero-padded.  BIT-exact vs the unmerged pair under
IEK_INT8_ACC=s32 (order-invariant accumulation; zero taps contribute exact
zeros); under the default bf16 accumulator the wider reduction tree reorders
bf16 rounding, so uint8 outputs may flip by ±1 LSB (didbl_pallas._merge55)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_engine_e2e import _tiny_resolver


def _int8_out(img, merge, monkeypatch, **opts):
    monkeypatch.setenv("IEK_INT8_MERGE55", merge)
    r = _tiny_resolver(mode=opts.pop("mode", "fast"))
    r.forward_mode = "int8"
    for k, v in opts.items():
        setattr(r, k, v)
    return r.upscale(img).astype(np.int32)


def test_merge55_bitexact_fast_s32(monkeypatch):
    monkeypatch.setenv("IEK_INT8_ACC", "s32")
    img = np.random.default_rng(71).integers(0, 256, (40, 48, 3), dtype=np.uint8)
    base = _int8_out(img, "0", monkeypatch)
    merged = _int8_out(img, "1", monkeypatch)
    np.testing.assert_array_equal(merged, base)


def test_merge55_lsb_fast_bf16(monkeypatch):
    """Default bf16 accumulator: reduction-tree reorder flips at most
    ±1 LSB at the uint8 output (measured ~6% of pixels)."""
    monkeypatch.setenv("IEK_INT8_ACC", "bf16")
    img = np.random.default_rng(71).integers(0, 256, (40, 48, 3), dtype=np.uint8)
    base = _int8_out(img, "0", monkeypatch)
    merged = _int8_out(img, "1", monkeypatch)
    assert np.abs(merged - base).max() <= 1


def test_merge55_bitexact_dynamic_split_s32(monkeypatch):
    """The merged path composes with the dynamic-per-tile tail (split2d's
    scheme): requant epilogues stay per-branch on the accumulator halves."""
    monkeypatch.setenv("IEK_INT8_ACC", "s32")
    img = np.random.default_rng(72).integers(0, 256, (40, 48, 3), dtype=np.uint8)
    base = _int8_out(img, "0", monkeypatch, mode="split",
                     split_tile=8, split_tile_w=8, int8_dynamic_tail=True)
    merged = _int8_out(img, "1", monkeypatch, mode="split",
                       split_tile=8, split_tile_w=8, int8_dynamic_tail=True)
    np.testing.assert_array_equal(merged, base)


def test_merge55_block_level_bitexact_s32(monkeypatch):
    """Straight on the forward fns, both emit modes, s32 accumulator
    (the order-invariant mode where exact equality is claimed)."""
    from image_enhance_keras_tpu.models import didbl_pallas as dp

    r = _tiny_resolver(mode="fast")
    r.forward_mode = "int8"
    qp = r._fwd_params()
    m = r.module
    x = jnp.asarray(
        np.random.default_rng(73).random((1, 24, 24, 3)), jnp.float32
    )
    monkeypatch.setenv("IEK_INT8_ACC", "s32")
    for emit in ("wide", "s8"):
        monkeypatch.setenv("IEK_INT8_EMIT", emit)
        monkeypatch.setenv("IEK_INT8_MERGE55", "0")
        base = np.asarray(dp.apply_didbl_int8_xla(
            qp, x, n_body53=m.n_body53, n_light=m.n_light,
            n_tail53=m.n_tail53).astype(jnp.float32))
        monkeypatch.setenv("IEK_INT8_MERGE55", "1")
        merged = np.asarray(dp.apply_didbl_int8_xla(
            qp, x, n_body53=m.n_body53, n_light=m.n_light,
            n_tail53=m.n_tail53).astype(jnp.float32))
        np.testing.assert_array_equal(merged, base), emit


def test_merge55_recompiles_on_toggle(monkeypatch):
    """Toggling IEK_INT8_MERGE55 on a live resolver must key a fresh
    program (the stale-program bug class from ADVICE r2)."""
    monkeypatch.delenv("IEK_INT8_MERGE55", raising=False)
    img = np.random.default_rng(74).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    r = _tiny_resolver(mode="fast")
    r.forward_mode = "int8"
    a = r.upscale(img).astype(np.int32)
    n = len(r._jitted) + len(r._jitted_fast)
    monkeypatch.setenv("IEK_INT8_MERGE55", "1")
    b = r.upscale(img).astype(np.int32)
    assert len(r._jitted) + len(r._jitted_fast) == n + 1
    assert np.abs(b - a).max() <= 1  # bf16-acc reduction reorder


def test_merged_w55_geometry():
    """The merged kernel is the centered zero-pad of the smaller kernel
    concatenated with the larger on cout."""
    from image_enhance_keras_tpu.models.didbl_pallas import _merged_w55

    p = {
        "conv_a1": {"q": jnp.arange(3 * 3 * 2 * 4, dtype=jnp.int8
                                    ).reshape(3, 3, 2, 4)},
        "conv_b1": {"q": jnp.arange(5 * 5 * 2 * 4, dtype=jnp.int8
                                    ).reshape(5, 5, 2, 4)},
    }
    w = _merged_w55(p, "q")
    assert w.shape == (5, 5, 2, 8)
    np.testing.assert_array_equal(np.asarray(w[1:4, 1:4, :, :4]),
                                  np.asarray(p["conv_a1"]["q"]))
    assert np.asarray(w[0, :, :, :4]).sum() == 0  # padded ring is zero
    np.testing.assert_array_equal(np.asarray(w[..., 4:]),
                                  np.asarray(p["conv_b1"]["q"]))
