"""Eval harness tests: pairing logic, crop protocol, end-to-end scoring of
synthetic golden files."""

import os

import pytest

import numpy as np

from image_enhance_keras_tpu.data.io import imwrite
from image_enhance_keras_tpu.eval import score_directory, score_pair, degrade
from image_enhance_keras_tpu.eval.scorer import find_pairs
from image_enhance_keras_tpu.eval.evaluate import BicubicResolver


def test_find_pairs_and_suffix_skip(tmp_path):
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    imwrite(str(tmp_path / "img_GT.png"), gt)
    imwrite(str(tmp_path / "img_GT_scaled(1x).png"), gt)
    imwrite(str(tmp_path / "orphan.png"), gt)
    pairs = find_pairs(str(tmp_path))
    assert len(pairs) == 1
    assert pairs[0][0].endswith("img_GT.png")
    assert pairs[0][1].endswith("img_GT_scaled(1x).png")


def test_score_directory_identical_pair_is_perfect(tmp_path):
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    imwrite(str(tmp_path / "a_GT.png"), gt)
    imwrite(str(tmp_path / "a_GT_scaled(1x).png"), gt)
    scores, means = score_directory(str(tmp_path), verbose=False)
    assert len(scores) == 1
    assert means["ssim_y"] > 0.9999
    assert means["psnr_y"] > 80  # identical -> ~inf, capped by float eps


def test_crop_border_changes_score(tmp_path):
    rng = np.random.default_rng(2)
    gt = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    pred = gt.copy()
    pred[:5] = 0  # corrupt a border strip
    s_nocrop = score_pair(gt, pred, crop_border=0)
    s_crop = score_pair(gt, pred, crop_border=10)
    assert s_crop.psnr_y > s_nocrop.psnr_y  # crop removes the corruption
    assert s_crop.ssim_y > 0.9999


def test_degrade_shapes_and_range():
    rng = np.random.default_rng(3)
    gt = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    lr = degrade(gt, scale=4)
    assert lr.shape == (16, 16, 3)
    assert lr.dtype == np.uint8


def test_bicubic_resolver_contract():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    out = BicubicResolver(4).upscale(img)
    assert out.shape == (80, 96, 3)
    assert out.dtype == np.uint8


def test_shape_mismatch_raises_by_default():
    rng = np.random.default_rng(5)
    gt = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    pred = rng.integers(0, 256, (44, 40, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="shape mismatch"):
        score_pair(gt, pred, name="x")
    s = score_pair(gt, pred, name="x", allow_shape_mismatch=True)
    assert np.isfinite(s.psnr_y)


def test_divisible_eval_driver(tmp_path):
    """The distinct _evaluate_denoise driver (reference models.py:1625-1721):
    non-conformant GTs are bicubic-RESIZED to ((dim//scale)//4)*4*scale (not
    cropped), the forward is whole-frame, and outputs are saved as
    <model>_<stem>_generated.png."""
    from image_enhance_keras_tpu.eval import (
        evaluate_resolver_on_dir_divisible,
        evaluate_model,
    )
    from tests.test_engine_e2e import _tiny_resolver

    rng = np.random.default_rng(9)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    imwrite(str(gt_dir / "odd.png"), rng.integers(0, 256, (70, 90, 3), dtype=np.uint8))

    r = _tiny_resolver()
    calls = []
    orig = r.upscale_frame
    r.upscale_frame = lambda im: calls.append(im.shape) or orig(im)
    scores, means = evaluate_resolver_on_dir_divisible(
        r, str(gt_dir), scale=4, save_dir=str(tmp_path / "pred"),
        model_name="tiny", verbose=False,
    )
    # 70x90 -> coerced to ((70//4)//4)*16 x ((90//4)//4)*16 = 64x80 -> LR 16x20
    assert calls == [(16, 20, 3)]  # whole-frame forward, coerced size
    assert len(scores) == 1 and np.isfinite(means["psnr_y"])
    assert os.path.exists(str(tmp_path / "pred" / "tiny_odd_generated.png"))

    # dispatch: flag off -> standard driver (tiled upscale, no upscale_frame)
    calls.clear()
    evaluate_model(r, str(gt_dir), verbose=False)
    assert calls == []


def test_divisible_eval_coerces_mod_scale_sizes(tmp_path, monkeypatch):
    """Sizes like 34 at scale 4 must coerce (review r3: (34//4)%4==0 slipped
    through and the driver crashed on shape mismatch)."""
    from image_enhance_keras_tpu.data.io import imwrite
    from image_enhance_keras_tpu.eval.evaluate import (
        evaluate_resolver_on_dir_divisible,
    )
    from tests.test_engine_e2e import _tiny_pre_upscaled_resolver

    rng = np.random.default_rng(7)
    imwrite(str(tmp_path / "odd.png"),
            rng.integers(0, 256, (34, 34, 3), dtype=np.uint8))
    r = _tiny_pre_upscaled_resolver()
    r.mode = "fast"
    scores, means = evaluate_resolver_on_dir_divisible(
        r, str(tmp_path), scale=4, verbose=False
    )
    assert len(scores) == 1  # coerced to 32x32, no crash
