"""int8 calibration sources: real-image calibration (the serving default),
synthetic fallback, and the dynamic-tail hybrid (VERDICT r2 next-4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_engine_e2e import _tiny_resolver


def test_calib_from_images_shapes():
    """Real-data calibration crops: common-size LR batch in [0,1] from an
    EXPLICIT image dir (the committed Set5 GTs), serving degradation
    applied.  The unset default reads no dir at all (eval-clean, r4)."""
    r = _tiny_resolver()
    assert r.int8_calib_dir is None  # shipped default: no eval images
    assert r._calib_from_images() is None
    r.int8_calib_dir = "data_set5"
    calib = r._calib_from_images()
    assert calib is not None
    n, h, w, c = calib.shape
    assert n == 5 and c == 3  # the five Set5 images
    assert h == w and 16 <= h <= 128
    assert float(calib.min()) >= 0.0 and float(calib.max()) <= 1.0


def test_calib_images_fallback_chain(caplog, monkeypatch):
    """Missing calibration dir falls back to real package-bundled photos
    (builtin_photos — never eval images), then to degraded rich procedural
    images (NOT the plain tiles — those measured 0.0052 FAIL on full
    Set5), each with a log."""
    import logging

    from image_enhance_keras_tpu import engine as engine_mod
    from image_enhance_keras_tpu.data.pipeline import builtin_photos

    monkeypatch.setattr(
        logging.getLogger("image_enhance_keras_tpu"), "propagate", True
    )
    have_photos = bool(builtin_photos())
    r = _tiny_resolver()
    r.forward_mode = "int8"
    r.int8_calib_dir = "/nonexistent_calib_dir"
    with caplog.at_level(logging.WARNING):
        qp = r._fwd_params()
    assert qp is not None and "actc" in qp["body53_0"]
    expect = ("package-bundled real photos" if have_photos
              else "procedural dead-leaves")
    assert any(expect in rec.getMessage() for rec in caplog.records)

    # with photos unavailable the chain must land on the procedural corpus
    import image_enhance_keras_tpu.data.pipeline as pipeline_mod

    monkeypatch.setattr(pipeline_mod, "builtin_photos", lambda *a, **k: [])
    caplog.clear()
    r2 = _tiny_resolver()
    r2.forward_mode = "int8"
    r2.int8_calib_dir = "/nonexistent_calib_dir"
    with caplog.at_level(logging.WARNING):
        qp2 = r2._fwd_params()
    assert qp2 is not None and "actc" in qp2["body53_0"]
    assert any("procedural dead-leaves" in rec.getMessage()
               for rec in caplog.records)


def test_default_calibration_is_eval_clean(caplog, monkeypatch):
    """The SHIPPED int8 calibration default must never read eval images
    (VERDICT r3 weak 5): with int8_calib_dir unset, quantization calibrates
    on the package-bundled photos / procedural chain, touches no image
    directory on disk, and logs info (not a warning — nothing is wrong)."""
    import logging

    monkeypatch.setattr(
        logging.getLogger("image_enhance_keras_tpu"), "propagate", True
    )
    r = _tiny_resolver()
    r.forward_mode = "int8"
    assert r.int8_calib == "images" and r.int8_calib_dir is None

    def _no_dir_reads(*a, **k):  # any dir listing = an eval-set leak
        raise AssertionError("default int8 calibration read an image dir")

    import image_enhance_keras_tpu.data.io as io_mod

    monkeypatch.setattr(io_mod, "list_images", _no_dir_reads)
    with caplog.at_level(logging.INFO):
        qp = r._fwd_params()
    assert qp is not None and "actc" in qp["body53_0"]
    assert not any(rec.levelno >= logging.WARNING for rec in caplog.records)
    assert any("eval-clean default" in rec.getMessage()
               for rec in caplog.records)


def test_int8_images_calib_forward_runs():
    """int8 forward with the images calibration source produces sane output
    close to the f32 forward."""
    r = _tiny_resolver(mode="fast")
    img = np.random.default_rng(31).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    f32 = r.upscale(img).astype(np.int32)

    r8 = _tiny_resolver(mode="fast")
    r8.forward_mode = "int8"
    assert r8.int8_calib == "images"  # the serving default
    out = r8.upscale(img).astype(np.int32)
    assert out.shape == f32.shape
    assert np.mean(np.abs(out - f32)) < 8.0  # quantization noise, not garbage


def test_int8_dynamic_tail_matches_static_closely():
    """The dynamic-tail hybrid runs and tracks the static-scale int8 output;
    programs must not share a jit cache entry (distinct _fwd_key)."""
    img = np.random.default_rng(32).integers(0, 256, (24, 24, 3), dtype=np.uint8)

    r_static = _tiny_resolver(mode="fast")
    r_static.forward_mode = "int8"
    a = r_static.upscale(img).astype(np.int32)

    r_dyn = _tiny_resolver(mode="fast")
    r_dyn.forward_mode = "int8"
    r_dyn.int8_dynamic_tail = True
    b = r_dyn.upscale(img).astype(np.int32)
    assert b.shape == a.shape
    assert np.mean(np.abs(b - a)) < 4.0

    # toggling the option on the SAME resolver recompiles (cache-key test)
    n = len(r_dyn._jitted) + len(r_dyn._jitted_fast)
    r_dyn.int8_dynamic_tail = False
    c = r_dyn.upscale(img).astype(np.int32)
    assert len(r_dyn._jitted) + len(r_dyn._jitted_fast) == n + 1
    np.testing.assert_array_equal(c, a)


def test_int8_dynamic_tail_split2d():
    """Dynamic per-tile tail in the split2d serving mode (the scheme the r2
    measurement scored at 0.0004): runs and stays close to whole-frame."""
    r = _tiny_resolver(mode="split")
    r.split_tile, r.split_tile_w = 8, 8
    r.forward_mode = "int8"
    r.int8_dynamic_tail = True
    img = np.random.default_rng(33).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = r.upscale(img)
    assert out.shape == (96, 96, 3)

    r_fast = _tiny_resolver(mode="fast")
    r_fast.forward_mode = "int8"
    r_fast.int8_dynamic_tail = True
    fast = r_fast.upscale(img)
    # per-tile scales differ from per-frame scales -> small quantization
    # noise between the two programs, not equality
    assert np.mean(np.abs(out.astype(np.int32) - fast.astype(np.int32))) < 4.0


def test_int8_body_tiling_bitexact():
    """The per-segment tiled int8 body must be BIT-exact vs the whole-frame
    int8 body (shifted-grid halo argument, didbl_pallas._tiled_chain), and
    the engine option must dispatch it."""
    from image_enhance_keras_tpu.models import didbl_pallas as dp
    from image_enhance_keras_tpu.models.zoo_int8 import int8_support

    r = _tiny_resolver(mode="fast")
    r.forward_mode = "int8"
    qp = r._fwd_params()
    m = r.module

    x = jnp.asarray(
        np.random.default_rng(41).random((1, 40, 48, 3)), jnp.float32
    )
    whole = np.asarray(dp.apply_didbl_int8_xla_body(
        qp, x, n_body53=m.n_body53, n_light=m.n_light).astype(jnp.float32))
    for tile, seg in [(8, 1), (8, 2), (16, 3), (8, 99)]:
        tiled = np.asarray(dp.apply_didbl_int8_xla_body_tiled(
            qp, x, n_body53=m.n_body53, n_light=m.n_light, tile=tile, seg=seg,
        ).astype(jnp.float32))
        np.testing.assert_array_equal(tiled, whole), (tile, seg)

    # engine dispatch: int8_body_tile routes the tiled body; output matches
    # the untiled engine program
    img = np.random.default_rng(42).integers(0, 256, (40, 48, 3), dtype=np.uint8)
    base = r.upscale(img).astype(np.int32)
    r_t = _tiny_resolver(mode="fast")
    r_t.forward_mode = "int8"
    r_t.int8_body_tile, r_t.int8_body_seg = 8, 2
    out = r_t.upscale(img).astype(np.int32)
    assert np.abs(out - base).max() <= 1  # fresh program; rounding boundary

    # split2d composes with the tiled body
    r_s = _tiny_resolver(mode="split")
    r_s.split_tile, r_s.split_tile_w = 8, 8
    r_s.forward_mode = "int8"
    r_s.int8_body_tile, r_s.int8_body_seg = 8, 2
    out_s = r_s.upscale(img).astype(np.int32)
    assert np.abs(out_s - base).max() <= 1


def test_int8_subpixel_head():
    """didbl_subpixel now has an int8 path (VERDICT r2 missing 7): the
    subpixel conv quantizes with folded input scales; output tracks f32."""
    import jax as _jax

    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec
    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.zoo_int8 import int8_support

    module = DifvdsrDouble(features=16, n_body53=2, n_light=1, n_tail53=1,
                           upsampler="subpixel")
    assert int8_support(module) is not None

    def build(mode="fast", fwd="xla"):
        r = SuperResolver.__new__(SuperResolver)
        r.model_name = "didbl_subpixel_tiny"
        r.module = module
        r.spec = ModelSpec("didbl_subpixel_tiny", lambda **k: module, 4,
                           False, "tiny", "w")
        r.patch, r.step, r.crop = 48, 32, 8
        r.scalemulti = 4
        r.tile_chunk = 4
        r.mode = mode
        r.fast_max_pixels = 1 << 20
        r.split_tile = 8
        r.forward_mode = fwd
        r._dtype = None
        r._jitted = {}
        r._jitted_fast = {}
        r.params = init_params(module, _jax.random.PRNGKey(5), input_hw=(16, 16))
        return r

    img = np.random.default_rng(51).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    f32 = build().upscale(img).astype(np.int32)
    r8 = build(fwd="int8")
    out = r8.upscale(img).astype(np.int32)
    assert "subpixel_conv" in r8._qparams and "qf" in r8._qparams["subpixel_conv"]
    assert out.shape == f32.shape
    assert np.mean(np.abs(out - f32)) < 8.0

    # split mode with the int8 subpixel tail stays close to whole-frame
    rs = build(mode="split", fwd="int8")
    out_s = rs.upscale(img).astype(np.int32)
    assert np.mean(np.abs(out_s.astype(np.int32) - out)) < 2.0

    # dynamic tail composes with the subpixel head
    rd = build(fwd="int8")
    rd.int8_dynamic_tail = True
    out_d = rd.upscale(img).astype(np.int32)
    assert np.mean(np.abs(out_d - f32)) < 8.0


def test_calib_cap_counts_only_usable_images(tmp_path):
    """A calib dir whose first 8+ listed files are unusable thumbnails must
    still reach the usable larger images — the cap counts only images that
    pass the min-side filter (review r3 finding)."""
    from image_enhance_keras_tpu.data.io import imwrite

    rng = np.random.default_rng(71)
    # 9 thumbnails that sort FIRST (min side < s*16 = 64 at scale 4)
    for i in range(9):
        imwrite(str(tmp_path / f"a{i}.png"),
                rng.integers(0, 256, (20, 20, 3), dtype=np.uint8))
    # one usable image sorting last
    imwrite(str(tmp_path / "z.png"),
            rng.integers(0, 256, (96, 96, 3), dtype=np.uint8))

    r = _tiny_resolver()
    r.int8_calib_dir = str(tmp_path)
    calib = r._calib_from_images()
    assert calib is not None
    assert calib.shape[0] == 1  # the single usable image


def test_pinned_mass_weights_helper():
    """Shared sampling-mass helper (dedup of cli/learn.py and
    scripts/train_loo.py): clamps, guards empty sides, sums to 1."""
    from image_enhance_keras_tpu.data.pipeline import pinned_mass_weights

    w = pinned_mass_weights(4, 16, 0.5)
    assert len(w) == 20
    assert abs(sum(w[:4]) - 0.5) < 1e-9 and abs(sum(w) - 1.0) < 1e-9
    assert pinned_mass_weights(0, 16, 0.5) is None
    assert pinned_mass_weights(4, 0, 0.5) is None
    w = pinned_mass_weights(2, 2, 7.0)  # clamped to 1.0
    assert abs(sum(w[:2]) - 1.0) < 1e-9


def test_int8_upq_fused_upsample_boundary(monkeypatch):
    """IEK_INT8_UPQ=1 (r4 perf lever): the tail's first block fuses the x4
    interleave into the quant chain and the identity leg.  Not bit-exact
    (0.9 before vs after the interleave reorders rounding) but must track
    the default program closely, key the jit caches, and hold in split2d."""
    img = np.random.default_rng(61).integers(0, 256, (24, 24, 3), dtype=np.uint8)

    r = _tiny_resolver(mode="fast")
    r.forward_mode = "int8"
    base = r.upscale(img).astype(np.int32)

    monkeypatch.setenv("IEK_INT8_UPQ", "1")
    # same resolver must RECOMPILE (env keys _fwd_key)
    n = len(r._jitted) + len(r._jitted_fast)
    fused = r.upscale(img).astype(np.int32)
    assert len(r._jitted) + len(r._jitted_fast) == n + 1
    assert fused.shape == base.shape
    assert np.mean(np.abs(fused - base)) < 1.0
    assert np.abs(fused - base).max() <= 16  # rounding reorder, not rewiring

    # split2d under UPQ stays close to fast under UPQ
    rs = _tiny_resolver(mode="split")
    rs.split_tile, rs.split_tile_w = 8, 8
    rs.forward_mode = "int8"
    out_s = rs.upscale(img).astype(np.int32)
    assert np.mean(np.abs(out_s - fused)) < 1.0

    # dynamic tail ignores UPQ (falls back to the unfused upsample)
    rd = _tiny_resolver(mode="fast")
    rd.forward_mode = "int8"
    rd.int8_dynamic_tail = True
    out_d = rd.upscale(img).astype(np.int32)
    assert np.mean(np.abs(out_d - base)) < 4.0


def test_int8_upmm_matmul_upsample(monkeypatch):
    """IEK_INT8_UPMM=1: the int8 tail's x4 upsample as dense MXU matmuls
    (same TF1 closed form as the interleave; r4 attribution measured the
    fused interleave at ~49 GB/s effective).  Must track the default
    program closely and key the jit caches."""
    img = np.random.default_rng(67).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    r = _tiny_resolver(mode="fast")
    r.forward_mode = "int8"
    base = r.upscale(img).astype(np.int32)
    monkeypatch.setenv("IEK_INT8_UPMM", "1")
    n = len(r._jitted) + len(r._jitted_fast)
    mm = r.upscale(img).astype(np.int32)
    assert len(r._jitted) + len(r._jitted_fast) == n + 1
    assert np.mean(np.abs(mm - base)) < 1.0 and np.abs(mm - base).max() <= 4
