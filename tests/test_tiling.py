"""Tiling property tests against an independent NumPy paste-loop oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from image_enhance_keras_tpu.tiling import (
    plan_tiles,
    pad_to_plan,
    extract_tiles,
    stitch_tiles,
    crop_output,
)


def _extract_oracle(img, patch, step):
    """Loop transliteration of the spec: tiles at multiples of `step` strictly
    below dim-patch, column-major (w outer, h inner)."""
    h, w = img.shape[:2]
    tiles = []
    for x in range(0, w - patch, step) if w - patch > 0 else []:
        for y in range(0, h - patch, step) if h - patch > 0 else []:
            tiles.append(img[y : y + patch, x : x + patch])
    return np.stack(tiles)


def _stitch_oracle(tiles, plan):
    """Paste loop with overwrite order and the 8-px first-row/col-exempt crop."""
    ps = plan.patch * plan.scale
    ss = plan.step * plan.scale
    out = np.zeros((plan.padded_h * plan.scale, plan.padded_w * plan.scale, tiles.shape[-1]))
    i = 0
    for x in range(plan.cnt_w):
        cw = 0 if x == 0 else plan.crop
        for y in range(plan.cnt_h):
            ch = 0 if y == 0 else plan.crop
            t = tiles[i][ch : ps - ch, cw : ps - cw]
            out[y * ss + ch : y * ss + ps - ch, x * ss + cw : x * ss + ps - cw] = t
            i += 1
    return out


@pytest.mark.parametrize("hw", [(100, 150), (64, 64), (255, 101), (97, 300)])
def test_plan_matches_reference_arithmetic(hw):
    h, w = hw
    plan = plan_tiles(h, w)
    # pad by patch then round up (both dims) when either not divisible
    h1, w1 = h + 96, w + 96
    if h1 % 64 or w1 % 64:
        h1 = (h1 // 64 + 1) * 64
        w1 = (w1 // 64 + 1) * 64
    assert (plan.padded_h, plan.padded_w) == (h1, w1)
    assert plan.cnt_h == len(range(0, h1 - 96, 64))
    assert plan.cnt_w == len(range(0, w1 - 96, 64))


@pytest.mark.parametrize("hw", [(40, 56), (100, 150)])
def test_extract_matches_oracle(hw):
    rng = np.random.default_rng(0)
    plan = plan_tiles(*hw, patch=24, step=16, scale=2, crop=4)
    img = rng.random((hw[0], hw[1], 3)).astype(np.float32)
    padded = np.asarray(pad_to_plan(jnp.asarray(img), plan))
    got = np.asarray(extract_tiles(jnp.asarray(padded), plan))
    want = _extract_oracle(padded, plan.patch, plan.step)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("hw,patch,step,scale,crop", [
    ((40, 56), 24, 16, 2, 4),
    ((100, 150), 96, 64, 4, 8),
    ((33, 47), 24, 16, 4, 4),
    ((300, 420), 192, 176, 4, 8),  # "perf" geometry (engine.TILE_GEOMETRIES)
    ((90, 110), 64, 48, 4, 8),     # pallas-chain geometry
])
def test_stitch_matches_oracle_on_cropped_region(hw, patch, step, scale, crop):
    rng = np.random.default_rng(1)
    plan = plan_tiles(*hw, patch=patch, step=step, scale=scale, crop=crop)
    tiles = rng.random((plan.n_tiles, patch * scale, patch * scale, 3)).astype(np.float32)
    got = crop_output(stitch_tiles(jnp.asarray(tiles), plan), plan)
    want = _stitch_oracle(tiles, plan)[: plan.out_h, : plan.out_w]
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("hw", [(100, 150), (128, 96)])
def test_extract_stitch_identity_bypassing_network(hw):
    """Tile -> upscale-free stitch must reproduce the original interior
    (scale=1 round trip; the reference's manual check, imgpatch.py:341-358)."""
    rng = np.random.default_rng(2)
    plan = plan_tiles(*hw, patch=96, step=64, scale=1, crop=8)
    img = rng.random((hw[0], hw[1], 3)).astype(np.float32)
    padded = pad_to_plan(jnp.asarray(img), plan)
    tiles = extract_tiles(padded, plan)
    back = crop_output(stitch_tiles(tiles, plan), plan)
    np.testing.assert_array_equal(np.asarray(back), img)
