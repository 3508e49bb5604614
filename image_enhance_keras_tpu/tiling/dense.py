"""Dense sliding-window patch plane — the `upscalePatch`/`upscale` legacy
capabilities (reference models.py:419-604, 606-853).

Reference machinery: sklearn-style dense `extract_patches_2d`
(img_utils.py:561-599, imgpatch.py:164-248), stride-filtered grids
(`extract_patches_2dlocal`, img_utils.py:513-556), and overlap-**average**
reconstruction with a per-pixel Python division loop
(`reconstruct_from_patches_2dlocal`, img_utils.py:442-511; sklearn
`reconstruct_from_patches_2d`, img_utils.py:189-238).

TPU-native: extraction is the same separable-gather trick as tiles.py on a
stride-1 (or stride-s) grid; averaging reconstruction is a scatter-add of
patches plus a precomputed hit-count divide — one `segment_sum`-style
scatter, no host loops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["dense_patch_grid", "extract_dense_patches", "reconstruct_average"]


def dense_patch_grid(h: int, w: int, patch: int, step: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Top-left corners (row-major: h outer, w inner — sklearn order) of a
    stride-`step` dense grid, always including every position where the patch
    fits (`range(0, dim - patch + 1, step)`)."""
    ys = np.arange(0, h - patch + 1, step)
    xs = np.arange(0, w - patch + 1, step)
    return ys, xs


def extract_dense_patches(
    img: jnp.ndarray, patch: int, step: int = 1
) -> jnp.ndarray:
    """(H, W, C) -> (N, patch, patch, C), sklearn `extract_patches_2d` order
    (row-major over positions)."""
    h, w, c = img.shape
    ys, xs = dense_patch_grid(h, w, patch, step)
    rows = (ys[:, None] + np.arange(patch)[None, :]).reshape(-1)
    cols = (xs[:, None] + np.arange(patch)[None, :]).reshape(-1)
    g = jnp.take(img, jnp.asarray(rows), axis=0)
    g = jnp.take(g, jnp.asarray(cols), axis=1)
    g = g.reshape(len(ys), patch, len(xs), patch, c)
    return g.transpose(0, 2, 1, 3, 4).reshape(len(ys) * len(xs), patch, patch, c)


@functools.lru_cache(maxsize=None)
def _scatter_plan(h: int, w: int, patch: int, step: int, pad: int):
    """Flattened output indices for every (patch, pixel) pair + hit counts.

    ``pad``: fully-interior patches contribute only their central
    (patch-2*pad)² window; a patch at the FIRST or LAST grid position in
    EITHER axis is pasted whole — the reference's all-or-nothing edge
    exemption in reconstruct_from_patches_2dlocal (img_utils.py:469-481:
    trim iff ``i>0 and j>0 and i<n_h-1 and j<n_w-1``).

    One deliberate deviation: the reference's "last" check uses the dense
    index ``n_h-1``, which is only ever a stride position when
    ``(H-patch) % step == 0`` — otherwise its bottom/right rows get zero
    coverage and the final per-pixel divide is 0/0.  We treat the last
    *stride* position as "last", which coincides with the reference
    whenever the reference is well-defined and guarantees full coverage
    otherwise.
    """
    ys, xs = dense_patch_grid(h, w, patch, step)
    n = len(ys) * len(xs)
    idx = np.zeros((n, patch, patch), np.int64)
    mask = np.zeros((n, patch, patch), np.float32)
    k = 0
    for y in ys:
        for x in xs:
            edge = y == 0 or x == 0 or y == ys[-1] or x == xs[-1]
            trim = 0 if edge else pad
            rows = y + np.arange(patch)
            cols = x + np.arange(patch)
            idx[k] = rows[:, None] * w + cols[None, :]
            m = np.zeros((patch, patch), np.float32)
            m[trim : patch - trim, trim : patch - trim] = 1.0
            mask[k] = m
            k += 1
    counts = np.zeros((h * w,), np.float32)
    np.add.at(counts, idx.reshape(-1), mask.reshape(-1))
    counts = np.maximum(counts, 1.0)
    return idx.reshape(-1), mask.reshape(-1, 1), counts


def reconstruct_average(
    patches: jnp.ndarray, out_hw: tuple[int, int], step: int = 1, pad: int = 0
) -> jnp.ndarray:
    """(N, p, p, C) -> (H, W, C) overlap-averaged reconstruction.

    pad=0 reproduces sklearn `reconstruct_from_patches_2d`
    (img_utils.py:189-238); pad=4 with a stride grid reproduces
    `reconstruct_from_patches_2dlocal` (img_utils.py:442-511).
    """
    h, w = out_hw
    n, p, _, c = patches.shape
    idx, mask, counts = _scatter_plan(h, w, p, step, pad)
    # accumulate in f32 regardless of patch dtype: integer patches would
    # wrap at the dtype max as overlaps add up, and bf16 loses ~2 decimal
    # digits over dozens of contributions at step=1
    vals = patches.reshape(-1, c).astype(jnp.float32) * jnp.asarray(mask)
    acc = jnp.zeros((h * w, c), jnp.float32).at[jnp.asarray(idx)].add(vals)
    out = acc / jnp.asarray(counts)[:, None]
    return out.reshape(h, w, c).astype(
        patches.dtype
        if jnp.issubdtype(patches.dtype, jnp.floating)
        else jnp.float32
    )
