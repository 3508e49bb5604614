"""Trainer tests: loss decreases on a tiny synthetic fit; checkpoints/history
round-trip; the disk-based prepare_data + generator compat path works."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.utils.config import Config


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        model="didbl",
        batch_size=4,
        lr=1e-3,
        lr_patch=8,
        steps_per_epoch=4,
        epochs=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    base.update(kw)
    return Config(**base)


def _tiny_trainer(tmp_path, mesh=None, **kw):
    # patch the zoo didbl to a small config for CPU speed
    from image_enhance_keras_tpu.train import trainer as trainer_mod
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec

    cfg = _tiny_cfg(tmp_path, **kw)
    tiny_module = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    orig = trainer_mod.get_model
    trainer_mod.get_model = lambda name, dtype=None: (
        tiny_module,
        ModelSpec(name, lambda **k: tiny_module, 4, False, "tiny", "w"),
    )
    try:
        t = trainer_mod.Trainer(cfg, mesh=mesh)
    finally:
        trainer_mod.get_model = orig
    return t


def test_degrade_batch_matches_reference_ops():
    from image_enhance_keras_tpu.data.pipeline import degrade_batch_on_device
    from image_enhance_keras_tpu.ops.filters import gaussian_blur
    from image_enhance_keras_tpu.ops.resize import resize_pil_uint8

    rng = np.random.default_rng(0)
    hr = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    got = np.asarray(degrade_batch_on_device(jnp.asarray(hr), scale=4))
    blurred = jnp.clip(jnp.round(gaussian_blur(jnp.asarray(hr).astype(jnp.float32), 0.5)), 0, 255)
    want = np.asarray(resize_pil_uint8(blurred, (8, 8))) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fit_decreases_loss_and_checkpoints(tmp_path):
    t = _tiny_trainer(tmp_path, epochs=3, steps_per_epoch=8)
    hist = t.fit()
    assert hist["loss"][-1] < hist["loss"][0]
    # checkpoints + history exist
    assert os.path.exists(os.path.join(t.config.checkpoint_dir, "latest"))
    assert os.path.exists(os.path.join(t.config.checkpoint_dir, "best"))
    with open(os.path.join(t.config.checkpoint_dir, "history.json")) as f:
        h = json.load(f)
    assert len(h["epoch"]) == 3
    assert "val_psnr" in h


def test_resume_restores_step(tmp_path):
    t = _tiny_trainer(tmp_path, epochs=1, steps_per_epoch=3)
    t.fit()
    step_after = int(t.state.step)
    t2 = _tiny_trainer(tmp_path, epochs=1, steps_per_epoch=3)
    assert t2.resume()
    assert int(t2.state.step) == step_after


def test_data_parallel_matches_single_device(tmp_path):
    """DP over the 8-device CPU mesh computes the same updates as 1 device."""
    from image_enhance_keras_tpu.parallel import make_mesh

    t1 = _tiny_trainer(tmp_path / "a", epochs=1, steps_per_epoch=4, batch_size=8)
    mesh = make_mesh(8)
    t8 = _tiny_trainer(tmp_path / "b", mesh=mesh, epochs=1, steps_per_epoch=4, batch_size=8)
    h1 = t1.fit()
    h8 = t8.fit()
    np.testing.assert_allclose(h1["loss"], h8["loss"], rtol=2e-4)
    # resulting params identical up to numerics
    import jax

    l1 = jax.tree_util.tree_leaves(t1.state.params)
    l8 = jax.tree_util.tree_leaves(t8.state.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_npz_export_roundtrip(tmp_path):
    import jax
    from image_enhance_keras_tpu.models import get_model, init_params
    from image_enhance_keras_tpu.train.checkpoints import export_params_npz, load_params_npz

    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble

    module = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    params = init_params(module, jax.random.PRNGKey(0), input_hw=(8, 8))
    p = str(tmp_path / "w.npz")
    export_params_npz(p, params)
    back = load_params_npz(p, params)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # structure-free load too
    free = load_params_npz(p)
    assert "level1" in free and "kernel" in free["level1"]


def test_engine_loads_full_trainstate_checkpoint(tmp_path):
    """SuperResolver.load_weights on a full TrainState orbax dir extracts
    the params subtree."""
    t = _tiny_trainer(tmp_path, epochs=1, steps_per_epoch=2)
    t.fit()
    import jax

    from tests.test_engine_e2e import _tiny_resolver

    r = _tiny_resolver()
    # same tiny architecture as _tiny_trainer? they differ (features 8 vs 16)
    # -> use the trainer's module/params template directly
    r.module = t.module
    r.params = t.state.params
    r.model_name = "tiny"
    r.load_weights(os.path.join(t.config.checkpoint_dir, "best"))
    a = jax.tree_util.tree_leaves(r.params)
    b = jax.tree_util.tree_leaves(t.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_prepare_data_and_generator(tmp_path):
    from image_enhance_keras_tpu.cli.prepare_data import prepare
    from image_enhance_keras_tpu.data.generator import image_count, paired_patch_generator
    from image_enhance_keras_tpu.data.io import imwrite

    src = tmp_path / "src"
    os.makedirs(src)
    rng = np.random.default_rng(0)
    imwrite(str(src / "a.png"), rng.integers(0, 256, (64, 80, 3), dtype=np.uint8))
    out = str(tmp_path / "patches")
    n = prepare(str(src), out, scale=2, img_size=64, stride=32)
    assert n == image_count(out) > 0
    gen = paired_patch_generator(out, batch_size=2, seed=0)
    bx, by = next(gen)
    assert bx.shape == (2, 32, 32, 3)  # not true_upscale: LR re-upsampled to HR size
    assert by.shape == (2, 32, 32, 3)
    assert bx.dtype == np.float32 and bx.max() <= 1.0


def test_frozen_params_not_updated(tmp_path):
    """difvdsr's entry conv is frozen (reference models.py:1305
    trainable=False): the optimizer must leave it bit-identical while the
    rest of the net trains."""
    from image_enhance_keras_tpu.train import trainer as trainer_mod
    from image_enhance_keras_tpu.models.difvdsr import Difvdsr
    from image_enhance_keras_tpu.models.zoo import ModelSpec

    cfg = _tiny_cfg(tmp_path, epochs=1)
    tiny = Difvdsr(features=8, n_blocks=1)
    orig = trainer_mod.get_model
    trainer_mod.get_model = lambda name, dtype=None: (
        tiny,
        ModelSpec(name, lambda **k: tiny, 1, True, "tiny", "w"),
    )
    try:
        t = trainer_mod.Trainer(cfg)
    finally:
        trainer_mod.get_model = orig
    level1_before = jax.tree_util.tree_map(np.asarray, t.state.params["level1"])
    diff_before = np.asarray(
        jax.tree_util.tree_leaves(t.state.params["diff_0"])[0]
    ).copy()
    t.fit(epochs=1, steps_per_epoch=4)
    level1_after = t.state.params["level1"]
    for a, b in zip(
        jax.tree_util.tree_leaves(level1_before),
        jax.tree_util.tree_leaves(level1_after),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diff_after = np.asarray(jax.tree_util.tree_leaves(t.state.params["diff_0"])[0])
    assert not np.array_equal(diff_before, diff_after)  # rest of net trained


def test_ssim_y_monitor_gates_best_checkpoint(tmp_path):
    """monitor='val_ssim_y' computes the full-image scoring-protocol metric
    per epoch and drives best-checkpoint selection (learn.py default)."""
    t = _tiny_trainer(tmp_path, monitor="val_ssim_y", epochs=1)
    assert t.ckpt.monitor == "val_ssim_y"
    assert t.metric_images  # synthetic val frames qualify
    hist = t.fit(epochs=1, steps_per_epoch=2)
    ssim_y = hist["val_ssim_y"][0]
    assert -1.0 <= ssim_y <= 1.0
    assert "val_psnr_y" in hist
    idx = json.load(open(os.path.join(t.config.checkpoint_dir, "index.json")))
    assert idx["best_metric"] == pytest.approx(ssim_y)


def test_trainer_x2_model_smoke(tmp_path):
    """The trainer is no longer x4-only (r2 VERDICT next-10): a difv4-at-x2
    config (the reference's x2 dev-note family, models.py:1061-1069) trains
    smoke epochs with the degradation scale taken from spec.net_scale."""
    from image_enhance_keras_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(
        tmp_path,
        model="difv4_x2",
        model_kwargs=dict(features=8, n_head=1, n_mid=1, n_tail=1),
        epochs=2,
        steps_per_epoch=4,
    )
    t = Trainer(cfg)
    assert t.train_scale == 2
    hist = t.fit()
    assert np.isfinite(hist["loss"][-1])
    assert hist["loss"][-1] < hist["loss"][0]
    assert os.path.exists(os.path.join(t.config.checkpoint_dir, "best"))


def test_difv4_x2_forward_and_split(tmp_path):
    """difv4_x2 is a real zoo entry: net_scale 2, split-mode decomposition
    (tail at the body-map resolution, halo 14) matches the fast forward."""
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models import get_model, init_params
    from image_enhance_keras_tpu.models.zoo import MODEL_REGISTRY

    module, spec = get_model("difv4_x2", features=8, n_head=1, n_mid=1, n_tail=1)
    assert spec.net_scale == 2 and module.scale == 2
    assert module.tail_upscale == 1 and module.split_halo == 14

    r = SuperResolver.__new__(SuperResolver)
    r.model_name = "difv4_x2"
    r.module = module
    r.spec = spec
    r.patch, r.step, r.crop = 48, 32, 8
    r.scalemulti = 2
    r.tile_chunk = 8
    r.mode = "split"
    r.fast_max_pixels = 1 << 20
    r.split_tile = 16
    r.forward_mode = "xla"
    r._dtype = None
    r._jitted = {}
    r._jitted_fast = {}
    r.params = init_params(module, jax.random.PRNGKey(3), input_hw=(16, 16))

    hw = (24, 20)
    img = np.random.default_rng(13).integers(0, 256, (*hw, 3), dtype=np.uint8)
    fast = np.asarray(r._fast_fn(hw)(r.params, jnp.asarray(img)))
    assert fast.shape == (48, 40, 3)
    split = np.asarray(r._split_fn(hw)(r.params, jnp.asarray(img)))
    np.testing.assert_array_equal(split, fast)


def test_rich_synthetic_corpus_properties():
    """Dead-leaves / pink-noise corpus: deterministic, well-conditioned
    uint8 images with nontrivial structure (data/pipeline.py)."""
    from image_enhance_keras_tpu.data.pipeline import (
        dead_leaves_images,
        pink_noise_images,
        rich_synthetic_images,
    )

    pal = [np.random.default_rng(1).integers(0, 256, (32, 32, 3), dtype=np.uint8)]
    imgs = rich_synthetic_images(8, 64, seed=0, palette_images=pal)
    assert len(imgs) == 8
    for im in imgs:
        assert im.shape == (64, 64, 3) and im.dtype == np.uint8
        assert im.std() > 5.0  # not flat
    # deterministic per seed
    a = dead_leaves_images(1, 48, seed=7)[0]
    b = dead_leaves_images(1, 48, seed=7)[0]
    np.testing.assert_array_equal(a, b)
    c = dead_leaves_images(1, 48, seed=8)[0]
    assert not np.array_equal(a, c)
    # pink noise has falling spectra: low-freq energy dominates high-freq
    p = pink_noise_images(1, 64, seed=3)[0].astype(np.float32).mean(axis=-1)
    spec = np.abs(np.fft.rfft2(p - p.mean()))
    lo = spec[:8, :8].sum()
    hi = spec[24:32, 24:32].sum()
    assert lo > 5 * hi


def test_fiber_corpus_properties():
    """Fiber generator: deterministic uint8 strands with anisotropic fine
    structure; rich_synthetic_images(fibers=True) keeps count and stays
    byte-stable for the default (fibers=False) recorded protocol."""
    from image_enhance_keras_tpu.data.pipeline import (
        fiber_images,
        rich_synthetic_images,
    )

    imgs = fiber_images(2, 64, seed=0)
    assert len(imgs) == 2
    for im in imgs:
        assert im.shape == (64, 64, 3) and im.dtype == np.uint8
        assert im.std() > 3.0  # strands over background, not flat
        # fine structure: many nonzero first-difference pixels
        g = im.mean(-1).astype(np.float32)
        assert (np.abs(np.diff(g, axis=0)) > 2).mean() > 0.05
    np.testing.assert_array_equal(
        fiber_images(1, 48, seed=3)[0], fiber_images(1, 48, seed=3)[0]
    )
    pal = [np.random.default_rng(1).integers(0, 256, (16, 16, 3), dtype=np.uint8)]
    mix = rich_synthetic_images(16, 48, seed=0, palette_images=pal, fibers=True)
    assert len(mix) == 16
    # fibers=False must reproduce the recorded-protocol corpus exactly
    base = rich_synthetic_images(8, 48, seed=0, palette_images=pal)
    again = rich_synthetic_images(8, 48, seed=0, palette_images=pal, fibers=False)
    for x, y in zip(base, again):
        np.testing.assert_array_equal(x, y)


def test_builtin_photos_real_corpus():
    """Package-bundled real photos (data/pipeline.builtin_photos): RGB
    uint8, large enough to patch-sample, and never a Set5 eval image —
    the zero-egress substitute for the reference's unpublished real
    training corpus (README.md:10)."""
    from image_enhance_keras_tpu.data.pipeline import (
        PatchSampler,
        builtin_photos,
    )

    photos = builtin_photos()
    if not photos:  # environment without sklearn/matplotlib
        import pytest

        pytest.skip("no package-bundled photos in this environment")
    for im in photos:
        assert im.ndim == 3 and im.shape[2] == 3 and im.dtype == np.uint8
        assert min(im.shape[:2]) >= 96  # PatchSampler-compatible
        assert im.std() > 10.0  # a photograph, not a flat graphic
    # must not be any Set5 eval image (same shape + near-identical pixels)
    from image_enhance_keras_tpu.data.io import imread
    from image_enhance_keras_tpu.utils.paths import find_repo_asset

    set5_dir = find_repo_asset("data_set5")
    if set5_dir:
        import os

        for name in ("baby", "bird", "butterfly", "head", "woman"):
            gt_path = os.path.join(set5_dir, f"{name}_GT.png")
            if not os.path.exists(gt_path):
                continue
            gt = imread(gt_path)
            for im in photos:
                assert im.shape != gt.shape or not np.array_equal(im, gt)
    # patch sampling over the photo corpus works end-to-end
    s = PatchSampler(photos, hr_patch=96, batch_size=4, seed=0)
    batch = s.sample()
    assert batch.shape == (4, 96, 96, 3) and batch.dtype == np.uint8


def test_patch_sampler_weights_pin_image_mass():
    """Weighted sampling: weights=[1,0] must draw every patch from image 0;
    a pinned 50/50 split over a 1-vs-9 corpus must hold to a few percent
    (the IEK_LOO_GT_MASS mechanism for large procedural corpora)."""
    from image_enhance_keras_tpu.data.pipeline import PatchSampler

    a = np.zeros((32, 32, 3), np.uint8)
    b = np.full((32, 32, 3), 255, np.uint8)
    s = PatchSampler([a, b], hr_patch=8, batch_size=64, seed=0,
                     weights=[1.0, 0.0])
    assert s.sample().max() == 0

    imgs = [a] + [b] * 9
    s = PatchSampler(imgs, hr_patch=8, batch_size=512, seed=1,
                     weights=[0.5] + [0.5 / 9] * 9)
    frac_a = float((s.sample().max(axis=(1, 2, 3)) == 0).mean())
    assert 0.4 < frac_a < 0.6, frac_a

    with pytest.raises(ValueError):
        PatchSampler([a, b], hr_patch=8, weights=[1.0])


def test_ema_recurrence_and_artifacts(tmp_path):
    """EMA shadow params: one train step advances ema by exactly
    d*ema + (1-d)*new_params; fit() exports {latest,best}_ema.npz serving
    artifacts; resume round-trips the ema leaves; metrics are scored on
    the EMA weights (net-new vs the reference trainer)."""
    import jax

    t = _tiny_trainer(tmp_path, ema_decay=0.5, epochs=2)
    assert t.state.ema is not None
    # at init the shadow equals the raw params
    for e, p in zip(jax.tree_util.tree_leaves(t.state.ema),
                    jax.tree_util.tree_leaves(t.state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    s0 = t.state
    s1, _ = t.train_step(s0, jnp.asarray(t.sampler.sample()))
    want = jax.tree_util.tree_map(
        lambda e, p: 0.5 * np.asarray(e) + 0.5 * np.asarray(p),
        s0.ema, s1.params,
    )
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(s1.ema)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-6, atol=1e-7)
    # the shadow lags the raw params after an update
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s1.ema),
                        jax.tree_util.tree_leaves(s1.params))
    )
    assert moved

    t.fit()
    ck = t.config.checkpoint_dir
    assert os.path.exists(os.path.join(ck, "latest_ema.npz"))
    assert os.path.exists(os.path.join(ck, "best_ema.npz"))

    # the exported npz holds the EMA (not the raw) weights and loads back
    from image_enhance_keras_tpu.train.checkpoints import load_params_npz

    back = load_params_npz(os.path.join(ck, "latest_ema.npz"), t.state.params)
    for x, y in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(t.state.ema)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)

    # resume restores the ema leaves (template includes the shadow)
    t2 = _tiny_trainer(tmp_path, ema_decay=0.5, epochs=2)
    assert t2.resume()
    for x, y in zip(jax.tree_util.tree_leaves(t2.state.ema),
                    jax.tree_util.tree_leaves(t.state.ema)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_ema_data_parallel_matches_single_device(tmp_path):
    """The EMA shadow advances identically under the 8-device DP mesh
    (state is replicated; the shadow update is deterministic given the
    same batches)."""
    import jax

    from image_enhance_keras_tpu.parallel import make_mesh

    t1 = _tiny_trainer(tmp_path / "a", ema_decay=0.9, epochs=1,
                       steps_per_epoch=4, batch_size=8)
    t8 = _tiny_trainer(tmp_path / "b", mesh=make_mesh(8), ema_decay=0.9,
                       epochs=1, steps_per_epoch=4, batch_size=8)
    t1.fit()
    t8.fit()
    assert t8.state.ema is not None
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.ema),
                    jax.tree_util.tree_leaves(t8.state.ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_export_params_npz_fp16_roundtrip(tmp_path):
    """fp16 demo-artifact storage: export casts, load restores the
    consumer tree's dtype; values match to fp16 resolution."""
    import numpy as np

    from image_enhance_keras_tpu.train.checkpoints import (
        export_params_npz,
        load_params_npz,
    )

    params = {"a": {"kernel": np.random.default_rng(0).random((3, 3, 4, 4))
                    .astype(np.float32),
                    "bias": np.zeros((4,), np.float32)}}
    p = str(tmp_path / "w.npz")
    export_params_npz(p, params, dtype=np.float16)
    raw = np.load(p)
    assert raw["a/kernel"].dtype == np.float16
    back = load_params_npz(p, like=params)
    assert back["a"]["kernel"].dtype == np.float32
    np.testing.assert_allclose(back["a"]["kernel"], params["a"]["kernel"],
                               atol=5e-4)


def test_checkpoint_monitor_val_loss_minimises(tmp_path):
    """monitor='val_loss' must promote the LOWEST loss (review r3: the
    trainer hard-coded mode='max', serving the most-diverged epoch)."""
    from image_enhance_keras_tpu.train.checkpoints import CheckpointManager

    m = CheckpointManager(str(tmp_path / "ck"), monitor="val_loss", mode="min")
    state = {"w": np.zeros((2,), np.float32)}
    assert m.save_epoch(state, 1, {"val_loss": 0.5})
    assert not m.save_epoch(state, 2, {"val_loss": 0.9})  # worse
    assert m.save_epoch(state, 3, {"val_loss": 0.1})
    assert m.index["best_epoch"] == 3

    # the Trainer wires mode from the monitor name
    import inspect

    from image_enhance_keras_tpu.train import trainer as trainer_mod

    src = inspect.getsource(trainer_mod)
    assert 'mode = "min" if monitor.endswith("loss") else "max"' in src


def test_checkpoint_nan_never_best(tmp_path):
    """A NaN monitor value must not be reported as best (review r3: diverged
    runs exported NaN weights as best_ema.npz every epoch)."""
    from image_enhance_keras_tpu.train.checkpoints import CheckpointManager

    m = CheckpointManager(str(tmp_path / "ck"), monitor="val_psnr", mode="max")
    state = {"w": np.zeros((2,), np.float32)}
    assert not m.save_epoch(state, 1, {"val_psnr": float("nan")})
    assert m.index["best_metric"] is None
    assert m.save_epoch(state, 2, {"val_psnr": 30.0})


def test_resume_continues_epoch_numbering(tmp_path):
    """resume() + fit() continues the epoch labels instead of re-running
    epoch 1.. (review r3: history/index got duplicate epoch rows)."""
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec
    from image_enhance_keras_tpu.train import trainer as trainer_mod
    from image_enhance_keras_tpu.train.trainer import Trainer
    from image_enhance_keras_tpu.utils.config import Config

    tiny = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    spec = ModelSpec("didbl", lambda **k: tiny, 4, False, "tiny", "w")
    import unittest.mock as mock

    imgs = [np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)]
    cfg = Config(model="didbl", epochs=2, steps_per_epoch=2, batch_size=2,
                 lr_patch=16, checkpoint_dir=str(tmp_path / "ck"),
                 monitor="val_psnr")
    with mock.patch.object(trainer_mod, "get_model",
                           lambda name, dtype=None: (tiny, spec)):
        t = Trainer(cfg, train_images=imgs, val_images=imgs)
        t.fit()
        epochs1 = [e["epoch"] for e in t.ckpt.index["epochs"]]
        assert epochs1 == [1, 2]

        t2 = Trainer(cfg, train_images=imgs, val_images=imgs)
        assert t2.resume()
        t2.fit()  # budget already trained: must be a no-op
        epochs2 = [e["epoch"] for e in t2.ckpt.index["epochs"]]
        assert epochs2 == [1, 2]  # no duplicate labels

        t3 = Trainer(cfg, train_images=imgs, val_images=imgs)
        assert t3.resume()
        t3.fit(epochs=3)  # one MORE epoch: labeled 3
        epochs3 = [e["epoch"] for e in t3.ckpt.index["epochs"]]
        assert epochs3 == [1, 2, 3]


def test_pixel_loss_fn_values():
    """Analytic check of each loss on a known diff vector (one element off
    by d=0.3, three exact, N=4; every loss means over all elements)."""
    from image_enhance_keras_tpu.train.trainer import pixel_loss_fn

    pred = jnp.array([0.5, 0.2, 0.0, 1.0])
    y = jnp.array([0.2, 0.2, 0.0, 1.0])
    d = 0.3
    np.testing.assert_allclose(
        pixel_loss_fn("mse")(pred, y), d * d / 4, rtol=1e-6)
    np.testing.assert_allclose(
        pixel_loss_fn("l1")(pred, y), d / 4, rtol=1e-6)
    eps = 1e-3
    expected = (np.sqrt(d * d + eps * eps) + 3 * eps) / 4
    np.testing.assert_allclose(
        pixel_loss_fn("charbonnier", eps)(pred, y), expected, rtol=1e-6)
    with pytest.raises(ValueError, match="unknown loss"):
        pixel_loss_fn("huber")


@pytest.mark.parametrize("loss", ["charbonnier", "l1"])
def test_fit_with_robust_losses(tmp_path, loss):
    """Non-MSE losses train end-to-end and still report PSNR from the MSE
    (comparable across losses)."""
    t = _tiny_trainer(tmp_path, epochs=2, steps_per_epoch=8, loss=loss)
    hist = t.fit()
    assert hist["loss"][-1] < hist["loss"][0]
    assert np.isfinite(hist["psnr"][-1])
