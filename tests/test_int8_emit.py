"""s8 branch-intermediate emission (IEK_INT8_EMIT=s8): the requantize is
fused into the conv epilogue so the a1/b1 branch legs are emitted as int8
instead of a materialised f32 intermediate.  Must be BIT-exact vs the
unfused path — the requant math is the same f32 ops, and clip(round(y/s),
0, 127) subsumes the relu (didbl_pallas._requant_c)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_engine_e2e import _tiny_resolver


def _int8_out(img, emit, monkeypatch, **opts):
    monkeypatch.setenv("IEK_INT8_EMIT", emit)
    r = _tiny_resolver(mode=opts.pop("mode", "fast"))
    r.forward_mode = "int8"
    for k, v in opts.items():
        setattr(r, k, v)
    return r.upscale(img).astype(np.int32)


def test_s8_emit_bitexact_fast(monkeypatch):
    img = np.random.default_rng(61).integers(0, 256, (40, 48, 3), dtype=np.uint8)
    wide = _int8_out(img, "wide", monkeypatch)
    s8 = _int8_out(img, "s8", monkeypatch)
    np.testing.assert_array_equal(s8, wide)


def test_s8_emit_bitexact_split2d(monkeypatch):
    img = np.random.default_rng(62).integers(0, 256, (40, 48, 3), dtype=np.uint8)
    wide = _int8_out(img, "wide", monkeypatch, mode="split",
                     split_tile=8, split_tile_w=8)
    s8 = _int8_out(img, "s8", monkeypatch, mode="split",
                   split_tile=8, split_tile_w=8)
    np.testing.assert_array_equal(s8, wide)


def test_s8_emit_block_level_bitexact(monkeypatch):
    """Block-level check straight on the forward fns (no engine plumbing):
    both light53 and light blocks, both accumulator dtypes."""
    from image_enhance_keras_tpu.models import didbl_pallas as dp

    r = _tiny_resolver(mode="fast")
    r.forward_mode = "int8"
    qp = r._fwd_params()
    m = r.module
    x = jnp.asarray(
        np.random.default_rng(63).random((1, 24, 24, 3)), jnp.float32
    )
    for acc in ("bf16", "s32"):
        monkeypatch.setenv("IEK_INT8_ACC", acc)
        monkeypatch.setenv("IEK_INT8_EMIT", "wide")
        wide = np.asarray(dp.apply_didbl_int8_xla(
            qp, x, n_body53=m.n_body53, n_light=m.n_light,
            n_tail53=m.n_tail53).astype(jnp.float32))
        monkeypatch.setenv("IEK_INT8_EMIT", "s8")
        s8 = np.asarray(dp.apply_didbl_int8_xla(
            qp, x, n_body53=m.n_body53, n_light=m.n_light,
            n_tail53=m.n_tail53).astype(jnp.float32))
        np.testing.assert_array_equal(s8, wide), acc


def test_s8_emit_recompiles_on_toggle(monkeypatch):
    """Toggling IEK_INT8_EMIT on a live resolver must key a fresh program
    (the stale-program bug class from ADVICE r2)."""
    monkeypatch.delenv("IEK_INT8_EMIT", raising=False)
    img = np.random.default_rng(64).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    r = _tiny_resolver(mode="fast")
    r.forward_mode = "int8"
    a = r.upscale(img).astype(np.int32)
    n = len(r._jitted) + len(r._jitted_fast)
    monkeypatch.setenv("IEK_INT8_EMIT", "s8")
    b = r.upscale(img).astype(np.int32)
    assert len(r._jitted) + len(r._jitted_fast) == n + 1
    np.testing.assert_array_equal(b, a)


def test_cli_int8_emit_flag(tmp_path, monkeypatch):
    """--int8-emit routes to the IEK_INT8_EMIT env knob."""
    from image_enhance_keras_tpu.cli.main_dirpath import build_parser

    monkeypatch.delenv("IEK_INT8_EMIT", raising=False)
    args = build_parser().parse_args([str(tmp_path), "--int8-emit", "s8"])
    assert args.int8_emit == "s8"


def test_s8_emit_bitexact_dynamic_tail(monkeypatch):
    """s8 emission composes with the dynamic-per-tile tail (the requant
    scale is computed from the same fused relu'd dequant): bit-exact."""
    img = np.random.default_rng(65).integers(0, 256, (40, 48, 3), dtype=np.uint8)
    wide = _int8_out(img, "wide", monkeypatch, int8_dynamic_tail=True)
    s8 = _int8_out(img, "s8", monkeypatch, int8_dynamic_tail=True)
    np.testing.assert_array_equal(s8, wide)

    wide2 = _int8_out(img, "wide", monkeypatch, mode="split",
                      split_tile=8, split_tile_w=8, int8_dynamic_tail=True)
    s82 = _int8_out(img, "s8", monkeypatch, mode="split",
                    split_tile=8, split_tile_w=8, int8_dynamic_tail=True)
    np.testing.assert_array_equal(s82, wide2)


def test_s8_emit_export_roundtrip(tmp_path, monkeypatch):
    """IEK_INT8_EMIT=s8 bakes into exported StableHLO artifacts at trace
    time; the reloaded program matches the live wide-path output."""
    from image_enhance_keras_tpu.runtime.export import export_forward, load_forward

    img = np.random.default_rng(66).integers(0, 256, (24, 20, 3), dtype=np.uint8)
    monkeypatch.setenv("IEK_INT8_EMIT", "wide")
    r = _tiny_resolver()
    r.forward_mode = "int8"
    live_wide = np.asarray(
        r._fast_fn((24, 20))(r._fwd_params(), img)
    ).astype(np.int32)

    monkeypatch.setenv("IEK_INT8_EMIT", "s8")
    r8 = _tiny_resolver()
    r8.forward_mode = "int8"
    path = str(tmp_path / "tiny_int8_s8.iekx")
    export_forward(r8, (24, 20), path)
    monkeypatch.setenv("IEK_INT8_EMIT", "wide")  # artifact must not care
    out = np.asarray(load_forward(path)(img)).astype(np.int32)
    # fresh compile of identical math: at most .5-boundary uint8 flips
    assert np.abs(out - live_wide).max() <= 1
