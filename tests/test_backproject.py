"""Iterative back-projection (ops/backproject.py): LR-consistency
refinement properties, engine wiring, CLI flag."""

import numpy as np
import pytest

import jax.numpy as jnp

from image_enhance_keras_tpu.ops.backproject import back_project
from image_enhance_keras_tpu.ops.resize import resize_bicubic_pil, resize_pil_uint8


def _pair(seed=0, hw=(40, 48), scale=4):
    """(gt, lr, bicubic-sr) triple with the eval degradation model."""
    from image_enhance_keras_tpu.data.pipeline import dead_leaves_images

    gt = dead_leaves_images(1, max(hw), seed=seed)[0][: hw[0], : hw[1]]
    lr = np.asarray(
        resize_pil_uint8(jnp.asarray(gt), (hw[0] // scale, hw[1] // scale))
    ).astype(np.uint8)
    sr0 = np.asarray(
        resize_pil_uint8(jnp.asarray(lr), hw)
    ).astype(np.uint8)
    return gt, lr, sr0


def _psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0**2 / (d**2).mean())


def _residual(sr, lr):
    down = np.asarray(
        resize_bicubic_pil(jnp.asarray(sr, jnp.float32), lr.shape[:2])
    )
    return float(np.abs(down - lr.astype(np.float32)).mean())


def test_back_project_tightens_lr_consistency_and_psnr():
    """Each IBP iteration shrinks |downscale(sr) - lr|; PSNR vs GT improves
    over the bicubic start (the classic Irani-Peleg property)."""
    gt, lr, sr0 = _pair(seed=3)
    res = [_residual(sr0, lr)]
    prev = sr0
    for it in (1, 2, 3):
        cur = np.asarray(back_project(jnp.asarray(sr0), jnp.asarray(lr), iters=it))
        assert cur.shape == sr0.shape and cur.dtype == np.uint8
        res.append(_residual(cur, lr))
        prev = cur
    assert res[1] < res[0] * 0.7 and res[2] < res[1] and res[3] < res[2]
    assert _psnr(prev, gt) > _psnr(sr0, gt)


def test_back_project_iters_zero_is_identity():
    _, lr, sr0 = _pair(seed=4)
    out = np.asarray(back_project(jnp.asarray(sr0), jnp.asarray(lr), iters=0))
    np.testing.assert_array_equal(out, sr0)


def test_back_project_rejects_non_integer_factor():
    with pytest.raises(ValueError):
        back_project(jnp.zeros((30, 30, 3)), jnp.zeros((8, 8, 3)), iters=1)


def test_engine_back_projection_composes():
    """Engine wiring: back_projection=N post-processes upscale() output;
    the result is LR-consistent beyond the raw network output and the knob
    composes with self_ensemble."""
    from tests.test_engine_e2e import _tiny_resolver

    img = np.random.default_rng(61).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    r = _tiny_resolver(mode="fast")
    base = r.upscale(img)

    r_bp = _tiny_resolver(mode="fast")
    r_bp.back_projection = 3
    out = r_bp.upscale(img)
    assert out.shape == base.shape and out.dtype == np.uint8
    assert _residual(out, img) < _residual(base, img)

    # composes with the x8 self-ensemble (applied after the average)
    r_se = _tiny_resolver(mode="fast")
    r_se.self_ensemble = True
    r_se.back_projection = 2
    out_se = r_se.upscale(img)
    assert out_se.shape == base.shape
    assert _residual(out_se, img) < _residual(base, img)


def test_back_project_batched_matches_per_frame():
    """(T, H, W, C) IBP == per-frame IBP (video path wiring)."""
    _, lr0, sr0 = _pair(seed=8)
    _, lr1, sr1 = _pair(seed=9)
    batch = np.asarray(
        back_project(
            jnp.asarray(np.stack([sr0, sr1])),
            jnp.asarray(np.stack([lr0, lr1])),
            iters=2,
        )
    )
    one0 = np.asarray(back_project(jnp.asarray(sr0), jnp.asarray(lr0), iters=2))
    one1 = np.asarray(back_project(jnp.asarray(sr1), jnp.asarray(lr1), iters=2))
    np.testing.assert_array_equal(batch[0], one0)
    np.testing.assert_array_equal(batch[1], one1)


def test_engine_frame_and_video_back_projection():
    """upscale_frame / upscale_video honor back_projection."""
    from tests.test_engine_e2e import _tiny_resolver

    frames = np.random.default_rng(71).integers(
        0, 256, (2, 16, 16, 3), dtype=np.uint8
    )
    r = _tiny_resolver(mode="fast")
    base_f = r.upscale_frame(frames[0])
    base_v = r.upscale_video(frames)

    r_bp = _tiny_resolver(mode="fast")
    r_bp.back_projection = 2
    out_f = r_bp.upscale_frame(frames[0])
    out_v = r_bp.upscale_video(frames)
    assert out_f.shape == base_f.shape and out_v.shape == base_v.shape
    assert _residual(out_f, frames[0]) < _residual(base_f, frames[0])
    assert _residual(out_v[1], frames[1]) < _residual(base_v[1], frames[1])
    # frame and video paths agree with each other under IBP
    np.testing.assert_array_equal(out_v[0], r_bp._back_project(
        base_v[0], frames[0], 2))


def test_cli_back_projection_flag(tmp_path, monkeypatch):
    """--back-projection N reaches the resolver on both CLI branches."""
    from image_enhance_keras_tpu.cli.main_dirpath import build_parser

    args = build_parser().parse_args(["d", "--back-projection", "2"])
    assert args.back_projection == 2
    args = build_parser().parse_args(["d"])
    assert args.back_projection == 0
