"""CLI integration tests on CPU with a tiny model (monkeypatched zoo)."""

import json
import os

import numpy as np
import pytest

from image_enhance_keras_tpu.data.io import imwrite, imread


@pytest.fixture()
def tiny_zoo(monkeypatch):
    """Patch the registry didbl to a small config so CLI runs fast on CPU."""
    from image_enhance_keras_tpu.models import zoo
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    import image_enhance_keras_tpu.engine as engine_mod

    tiny = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    spec = zoo.ModelSpec("didbl", lambda **k: tiny, 4, False, "tiny", "w")
    monkeypatch.setattr(engine_mod, "get_model", lambda name, dtype=None: (tiny, spec))
    return tiny


def test_main_dirpath_cli(tmp_path, tiny_zoo):
    from image_enhance_keras_tpu.cli.main_dirpath import main

    rng = np.random.default_rng(0)
    for name in ["a.png", "b.bmp"]:
        imwrite(str(tmp_path / name), rng.integers(0, 256, (40, 48, 3), dtype=np.uint8))
    rc = main([str(tmp_path), "--weights", "none", "--mode", "fast",
               "--patch_size", "32", "--step", "16", "--save_intermediate"])
    assert rc == 0
    assert os.path.exists(tmp_path / "a_scaled(1x).png")
    assert os.path.exists(tmp_path / "b_scaled(1x).bmp")
    assert os.path.exists(tmp_path / "a_intermediate_.png")
    out = imread(str(tmp_path / "a_scaled(1x).png"))
    assert out.shape == (160, 192, 3)
    inter = imread(str(tmp_path / "a_intermediate_.png"))
    assert inter.shape == (160, 192, 3)
    # rerun skips outputs and intermediates
    rc = main([str(tmp_path), "--weights", "none", "--mode", "fast",
               "--patch_size", "32", "--step", "16"])
    assert rc == 0


def test_main_dirpath_cli_sharded(tmp_path, tiny_zoo):
    """--devices N routes through ShardedResolver on the virtual mesh."""
    from image_enhance_keras_tpu.cli.main_dirpath import main

    rng = np.random.default_rng(5)
    imwrite(str(tmp_path / "c.png"), rng.integers(0, 256, (48, 48, 3), dtype=np.uint8))
    rc = main([str(tmp_path), "--weights", "none", "--devices", "2",
               "--patch_size", "32", "--step", "16"])
    assert rc == 0
    out = imread(str(tmp_path / "c_scaled(1x).png"))
    assert out.shape == (192, 192, 3)


def test_scorpath_cli(tmp_path):
    from image_enhance_keras_tpu.cli.scorpath import main

    rng = np.random.default_rng(1)
    gt = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    imwrite(str(tmp_path / "x.png"), gt)
    noisy = np.clip(gt.astype(int) + rng.integers(-6, 7, gt.shape), 0, 255).astype(np.uint8)
    imwrite(str(tmp_path / "x_scaled(1x).png"), noisy)
    js = str(tmp_path / "m.json")
    rc = main([str(tmp_path), "--json", js])
    assert rc == 0
    means = json.load(open(js))
    assert 20 < means["psnr_y"] < 60
    assert 0.5 < means["ssim_y"] <= 1.0


def test_scorpath_cli_empty_dir(tmp_path):
    from image_enhance_keras_tpu.cli.scorpath import main

    assert main([str(tmp_path)]) == 1


def test_unified_front_door(tmp_path, capsys):
    from image_enhance_keras_tpu.__main__ import main

    assert main([]) == 0
    assert "upscale" in capsys.readouterr().out
    assert main(["bogus"]) == 2
    rng = np.random.default_rng(9)
    gt = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    imwrite(str(tmp_path / "x.png"), gt)
    imwrite(str(tmp_path / "x_scaled(1x).png"), gt)
    assert main(["score", str(tmp_path)]) == 0


def test_learn_cli_synthetic_corpus(tmp_path, monkeypatch):
    """--synthetic N trains with the rich procedural corpus and no dataset
    (cli/learn.py; corpus in data/pipeline.py)."""
    from image_enhance_keras_tpu.train import trainer as trainer_mod
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec

    tiny = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    spec = ModelSpec("didbl", lambda **k: tiny, 4, False, "tiny", "w")
    monkeypatch.setattr(
        trainer_mod, "get_model", lambda name, dtype=None: (tiny, spec)
    )
    from image_enhance_keras_tpu.cli.learn import main

    ckpt = tmp_path / "ck"
    rc = main([
        "--synthetic", "4", "--epochs", "1", "--steps-per-epoch", "2",
        "--batch-size", "2", "--lr-patch", "16", "--monitor", "val_psnr",
        "--checkpoint-dir", str(ckpt),
    ])
    assert rc == 0
    assert (ckpt / "history.json").exists()


def test_learn_cli_blur_sigma_flag():
    """--blur-sigma threads the training degradation blur into Config
    (0 = train on the eval protocol's plain-bicubic degradation)."""
    from image_enhance_keras_tpu.cli.learn import build_parser

    p = build_parser()
    assert p.parse_args([]).blur_sigma == 0.5  # reference prep default
    assert p.parse_args(["--blur-sigma", "0"]).blur_sigma == 0.0


def test_learn_cli_builtin_photos(tmp_path, monkeypatch):
    """--builtin-photos adds the package-bundled real photos to the corpus
    (real side of the pinned mass when --synthetic is also given)."""
    import pytest

    from image_enhance_keras_tpu.data.pipeline import builtin_photos

    if not builtin_photos():
        pytest.skip("no package-bundled photos in this environment")

    from image_enhance_keras_tpu.train import trainer as trainer_mod
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec

    tiny = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    spec = ModelSpec("didbl", lambda **k: tiny, 4, False, "tiny", "w")
    monkeypatch.setattr(
        trainer_mod, "get_model", lambda name, dtype=None: (tiny, spec)
    )
    from image_enhance_keras_tpu.cli.learn import main

    ckpt = tmp_path / "ck"
    rc = main([
        "--builtin-photos", "--synthetic", "4", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "2", "--lr-patch", "16",
        "--monitor", "val_psnr", "--checkpoint-dir", str(ckpt),
    ])
    assert rc == 0
    assert (ckpt / "history.json").exists()


def test_main_dirpath_int8_acc_flag(tmp_path, tiny_zoo, monkeypatch):
    """--int8-acc routes to the IEK_INT8_ACC env knob and the int8 forward
    runs under both accumulator settings (s8xs8 convs with bf16/s32
    preferred_element_type lower on the CPU backend too)."""
    from image_enhance_keras_tpu.cli.main_dirpath import main

    rng = np.random.default_rng(1)
    imwrite(str(tmp_path / "x.png"), rng.integers(0, 256, (40, 48, 3), dtype=np.uint8))
    monkeypatch.delenv("IEK_INT8_ACC", raising=False)
    rc = main([str(tmp_path), "--weights", "none", "--mode", "fast",
               "--forward", "int8", "--dtype", "bfloat16", "--int8-acc", "s32"])
    assert rc == 0
    # the knob is scoped to the run: no leak into the caller's process env
    assert "IEK_INT8_ACC" not in os.environ
    out_s32 = imread(str(tmp_path / "x_scaled(1x).png"))
    os.remove(tmp_path / "x_scaled(1x).png")
    rc = main([str(tmp_path), "--weights", "none", "--mode", "fast",
               "--forward", "int8", "--dtype", "bfloat16", "--int8-acc", "bf16"])
    assert rc == 0
    out_bf16 = imread(str(tmp_path / "x_scaled(1x).png"))
    assert out_s32.shape == out_bf16.shape == (160, 192, 3)
    # accumulator emission is a numerics knob, not a semantics change
    assert np.mean(np.abs(out_s32.astype(int) - out_bf16.astype(int))) < 2.0


def test_learn_cli_real_mass_pins_sampler_weights(tmp_path, monkeypatch):
    """--train-dir + --synthetic wires PatchSampler weights so the real
    corpus keeps --real-mass of the sampling probability (the measured
    dilution regression of uniform sampling over mixed corpora)."""
    from image_enhance_keras_tpu.train import trainer as trainer_mod
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec

    tiny = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    spec = ModelSpec("didbl", lambda **k: tiny, 4, False, "tiny", "w")
    monkeypatch.setattr(
        trainer_mod, "get_model", lambda name, dtype=None: (tiny, spec)
    )
    seen = {}
    orig_init = trainer_mod.Trainer.__init__

    def spy(self, config=None, train_images=None, val_images=None, mesh=None,
            train_weights=None):
        seen["weights"] = train_weights
        seen["n_images"] = len(train_images)
        orig_init(self, config, train_images, val_images, mesh, train_weights)

    monkeypatch.setattr(trainer_mod.Trainer, "__init__", spy)

    rng = np.random.default_rng(0)
    real_dir = tmp_path / "real"
    real_dir.mkdir()
    for i in range(2):
        imwrite(str(real_dir / f"r{i}.png"),
                rng.integers(0, 256, (128, 128, 3), dtype=np.uint8))
    from image_enhance_keras_tpu.cli.learn import main

    rc = main([
        "--train-dir", str(real_dir), "--synthetic", "6", "--real-mass", "0.5",
        "--epochs", "1", "--steps-per-epoch", "2", "--batch-size", "2",
        "--lr-patch", "16", "--monitor", "val_psnr",
        "--checkpoint-dir", str(tmp_path / "ck"),
    ])
    assert rc == 0
    w = seen["weights"]
    assert w is not None and len(w) == seen["n_images"] == 8
    assert abs(sum(w[:2]) - 0.5) < 1e-9 and abs(sum(w[2:]) - 0.5) < 1e-9


def test_scorpath_generate_int8_forward(tmp_path, tiny_zoo):
    """--generate --forward int8 scores the serving profile under the
    scorpath protocol (generate + score in one run)."""
    from image_enhance_keras_tpu.cli.scorpath import main

    rng = np.random.default_rng(5)
    imwrite(str(tmp_path / "g.png"),
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8))
    js = str(tmp_path / "m.json")
    rc = main([str(tmp_path), "--generate", "--forward", "int8",
               "--weights", "none", "--dtype", "bfloat16", "--json", js])
    assert rc == 0
    means = json.load(open(js))
    assert "ssim_y" in means


def test_main_dirpath_weight_default_resolution(tmp_path, tiny_zoo, monkeypatch):
    """Omitted --weights resolves the zoo's committed demo checkpoint from
    ANY working directory, or fails loudly — never a silent random-init
    serve (reference hard-loads its checkpoint, models.py:1217)."""
    from image_enhance_keras_tpu.cli.main_dirpath import main
    from image_enhance_keras_tpu.models import zoo

    monkeypatch.chdir(tmp_path)  # a foreign CWD must not break resolution
    p = zoo.resolve_default_weights(zoo.MODEL_REGISTRY["didbl"])
    assert p is not None and os.path.exists(p)

    # a family with no committed artifact still fails loudly
    rng = np.random.default_rng(7)
    imwrite(str(tmp_path / "y.png"),
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    spec = zoo.ModelSpec("noart", lambda **k: tiny_zoo, 4, False, "t", None)
    monkeypatch.setitem(zoo.MODEL_REGISTRY, "noart", spec)
    with pytest.raises(SystemExit, match="no committed demo checkpoint"):
        main([str(tmp_path), "--model", "noart"])


def test_scorpath_and_export_never_silent_random_init(tmp_path, tiny_zoo, monkeypatch):
    """Every resolver-building CLI shares the --weights policy (cli/common):
    omitted --weights on a family with no committed artifact exits loudly —
    scoring or exporting random-init weights silently is the r2-weak-1 bug
    class."""
    from image_enhance_keras_tpu.cli.scorpath import main as scor_main
    from image_enhance_keras_tpu.cli.export_model import main as export_main
    from image_enhance_keras_tpu.models import zoo

    spec = zoo.ModelSpec("noart", lambda **k: tiny_zoo, 4, False, "t", None)
    monkeypatch.setitem(zoo.MODEL_REGISTRY, "noart", spec)
    rng = np.random.default_rng(9)
    imwrite(str(tmp_path / "h.png"),
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    with pytest.raises(SystemExit, match="no committed demo checkpoint"):
        scor_main([str(tmp_path), "--generate", "--model", "noart"])
    with pytest.raises(SystemExit, match="no committed demo checkpoint"):
        export_main([str(tmp_path / "x.iekx"), "--model", "noart",
                     "--hw", "16", "16"])


def test_scorpath_generate_gmsd(tmp_path, tiny_zoo):
    """--gmsd is honored in --generate mode (review r3: it was silently
    dropped there)."""
    from image_enhance_keras_tpu.cli.scorpath import main

    rng = np.random.default_rng(11)
    imwrite(str(tmp_path / "g.png"),
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8))
    js = str(tmp_path / "m.json")
    rc = main([str(tmp_path), "--generate", "--weights", "none",
               "--gmsd", "--json", js])
    assert rc == 0
    means = json.load(open(js))
    assert "gmsd_y" in means and 0.0 <= means["gmsd_y"] <= 1.0
