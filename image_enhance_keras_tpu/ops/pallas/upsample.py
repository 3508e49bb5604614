"""Streaming Pallas kernel for the TF1 integer-factor bilinear upsample.

The didbl/difv4 tails upsample the LR feature map in-graph with TF1
``resize_bilinear`` semantics (reference models.py:1392-1399), which
``ops.resize.upsample_phase_tf1`` implements as XLA phase interleaving.
Measured on v5e in isolation (scripts/bench_upsample.py, r3): that XLA
program runs at 20.9 GB/s (54.6 ms for the 512^2 x 128ch bf16 x4 frame) —
the stack/reshape interleaves materialise several output-sized
intermediates.  This kernel measures 110.6 GB/s / 10.3 ms at
block_rows=4 — 5.3x — one HBM read + one write.

MEASURED END-TO-END NEGATIVE (r3, v5e): inside the full didbl programs
the kernel LOSES — int8_split2d 32.6 -> 26.3 out-Mpix/s, int8_fast
23.4 -> 4.1.  In-program, XLA fuses the interleave's weighted sums into
the producing body epilogue and the consuming tail conv (the r2 phase
profile put the fused upsample at ~12 ms, not the isolated 54.6), while
the opaque pallas_call boundary forces the full 1 GB upsampled feature
map to materialise in HBM with layout copies on both sides.  The kernel
is therefore DEFAULT OFF (IEK_PALLAS_UPSAMPLE=1 to opt in) and kept as
measured-infrastructure: the right fusion target is quantize-into-
upsample (int8 out = half the bytes), not the interleave alone.

This kernel streams instead: one HBM read of the input, one HBM write of
the output, all interleaving in VMEM —

  * grid over (batch, input-row blocks, input-col blocks); each step DMAs
    a (B+1, WB+8) halo window (1 row / 1 col of closed-form halo, edges
    pre-duplicated by the wrapper so every window is in-bounds, W halo
    padded to 8 for DMA alignment),
  * H and W interleaves: f weighted sums stacked on a fresh axis and
    merged — Mosaic lowers the relayout for (block_rows=1, WB<=128)
    blocks, which is why the kernel blocks over W.

Same closed form as the XLA path: out[f*k + r] = (1-r/f)*in[k] +
(r/f)*in[k+1], last row/column clamped (align_corners=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["upsample_phase_tf1_pallas"]


def _kernel(in_hbm, out_ref, scratch, sem, *, f: int, block_rows: int,
            block_cols: int):
    n = pl.program_id(0)
    k = pl.program_id(1)
    j = pl.program_id(2)
    b, wb = block_rows, block_cols
    # (B+1, WB+8) halo window: +1 row for the H closed form's in[k+1]; the
    # W halo is padded to 8 columns so the DMA window's sublane extent is a
    # multiple of 8 (a 129-wide window fails to compile)
    dma = pltpu.make_async_copy(
        in_hbm.at[n, pl.ds(k * b, b + 1), pl.ds(j * wb, wb + 8)], scratch, sem
    )
    dma.start()
    dma.wait()
    z = scratch[:]                       # (B+1, WB+8, C)
    dt = z.dtype

    # Per input row (unrolled — amortises grid overhead ~b-fold while every
    # interleave relayout stays in the (1-row, WB<=128) regime Mosaic
    # lowers; a single b-row stack+reshape fails to compile for b >= 2):
    #   H interleave: f weighted sums of (cur, next) rows;
    #   W interleave: f weighted column sums stacked on a fresh axis and
    #   merged (NOTE: pltpu.repeat is tile-concat, not element-repeat —
    #   stack-then-merge IS the element interleave).
    for i in range(b):
        cur = z[i : i + 1]
        nxt = z[i + 1 : i + 2]
        rows = [
            cur * jnp.asarray(1.0 - r / f, dt) + nxt * jnp.asarray(r / f, dt)
            for r in range(f)
        ]
        zh = jnp.stack(rows, axis=1).reshape(f, wb + 8, z.shape[2])
        cw, nw = zh[:, :wb], zh[:, 1 : wb + 1]
        cols = [
            cw * jnp.asarray(1.0 - r / f, dt) + nw * jnp.asarray(r / f, dt)
            for r in range(f)
        ]
        out = jnp.stack(cols, axis=2).reshape(f, f * wb, z.shape[2])
        out_ref[0, i * f : (i + 1) * f] = out


@functools.partial(
    jax.jit, static_argnames=("factor", "block_rows", "block_cols", "interpret")
)
def upsample_phase_tf1_pallas(
    x: jnp.ndarray,
    factor: int = 4,
    block_rows: int = 4,
    block_cols: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(N, H, W, C) -> (N, f*H, f*W, C), TF1 bilinear (align_corners=False).

    Bit-compatible with ``ops.resize.upsample_phase_tf1`` (same weighted
    sums in the same dtype); gated by tests/test_pallas_upsample.py.
    Blocks over (rows, cols); rows are unrolled inside the kernel so the
    per-row interleave relayouts stay in the regime Mosaic lowers while
    grid overhead amortises (see _kernel).
    """
    f = int(factor)
    if f == 1:
        return x
    n, h, w, c = (int(d) for d in x.shape)
    b = int(block_rows)
    while h % b:
        b -= 1
    # Arbitrary W: pad columns (edge duplication == the closed form's edge
    # clamp, so the sliced result is bit-identical) up to a whole number of
    # W-blocks.  W8 <= 136 fits one block (136 = the largest multiple-of-8
    # width Mosaic still lowers the interleave relayout for — covers the
    # split2d 134-wide halo tiles); larger widths use 128-col blocks.
    w8 = -(-w // 8) * 8
    if w8 <= 136:
        wb = w8
    else:
        wb = min(int(block_cols), 128)
    wp = -(-w8 // wb) * wb
    # duplicated last row / duplicated last cols make every (B+1, WB+8)
    # DMA window in-bounds (the closed form clamps in[k+1] at the edges)
    xp = jnp.concatenate([x, x[:, -1:]], axis=1)
    pad_c = (wp - w) + 8
    xp = jnp.concatenate(
        [xp, jnp.repeat(xp[:, :, -1:], pad_c, axis=2)], axis=2
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(_kernel, f=f, block_rows=b, block_cols=wb),
        grid=(n, h // b, wp // wb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, f * b, f * wb, c), lambda ni, ki, ji: (ni, ki, ji, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, f * h, f * wp, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((b + 1, wb + 8, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out if wp == w else out[:, :, : f * w]
