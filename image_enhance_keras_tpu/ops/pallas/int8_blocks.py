"""Pallas TPU int8 residual-block kernels — the quantized serving path.

Why: v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), but XLA's
int8 conv path measured only ~16% over bf16 at our shapes (ROADMAP r1), so
the 2x needs a hand-written kernel.  These kernels quantize on the fly
inside VMEM and keep the whole residual block resident:

    bf16 window (HBM, halo'd DMA) -> per-tile abs-max -> int8
    -> k x k shifted-slice int8 MXU dots (int32 accumulation)
    -> dequant (s_x * s_w per output channel) + bias -> relu
    -> requant -> second conv -> f32 residual epilogue -> bf16 out

Quantization scheme:
  * weights: per-output-channel symmetric int8 (quantized once at load);
  * activations: per-tile symmetric int8, scale from the tile's abs-max —
    computed inside the kernel, zero host round-trips;
  * the identity path stays in bf16/f32 — residual-scale epilogues
    (0.9x + 0.1*branches, reference models.py:1248-1270) add NO
    quantization error on the skip connection, which is what keeps the
    SSIM delta small;
  * int32 accumulators cannot overflow: 25 taps x 128ch x 127^2 ~ 5e7 << 2^31.

Spatial tiling with EXACT SAME-chain semantics: the grid walks
(batch, H/th, W/tw); each step DMAs a (th+2*halo, tw+win_pad, C) window from
HBM (halo = sum of both convs' radii) and computes the block's FIRST conv
VALID on the extended window, so interior sub-tile boundaries see the real
intermediate values a whole-image SAME chain would produce.  Positions of
the intermediate ring that fall OUTSIDE the image are masked to zero — the
second SAME conv's zero padding at true image borders.  Overlapping windows
cannot be a BlockSpec, hence the manual halo DMA (the r1 roadmap item); DMA
is ~25x cheaper than the tile's MXU work, so no double buffering is needed.

Mosaic alignment rules (hardware-found, r2): a VMEM ``memref_slice`` must be
a multiple of the (8, 128) tiling on its last two dims, so the DMA'd window
width is ``tw + round_up(2*halo, 8)`` (halo columns on the left, the
remainder as extra right padding) and tile sizes th/tw are multiples of 8
dividing the 8-aligned padded image.  H/W are padded up to multiples of 8
in the wrapper; the kernel zeroes output positions outside the true image
so inter-block chains keep exact SAME zero-border semantics, and the
wrapper crops the pad back off.

Used by models/didbl_pallas.apply_didbl_int8 (engine --forward pallas_int8):
the same kernel serves the LR body tower and the 16x-pixel post-upsample
tail (reference models.py:1194-1199) — the tail is just a bigger grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "quantize_weights_per_channel",
    "light53_int8",
    "light_int8",
]


def quantize_weights_per_channel(w) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(k, k, Cin, Cout) f32 -> (int8 weights, (Cout,) f32 scales)."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize(x_f32):
    """symmetric int8 with the tensor's abs-max: (q_int8, scale_f32).

    The abs-max is a full reduction over the window and the divide is
    per-element — measured ~5x the cost of the conv dots themselves
    (bench_int8_parts, r2).  Serving uses :func:`_quantize_static`."""
    amax = jnp.max(jnp.abs(x_f32))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x_f32 / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _quantize_static(x_f32, scale):
    """symmetric int8 with a pre-calibrated scale: one fused mul+round+clip
    pass, no reduction, no divide (the scalar reciprocal is per-tile)."""
    inv = 1.0 / scale
    q = jnp.clip(jnp.round(x_f32 * inv), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _conv_int8(xq, wq, out_h: int, out_w: int, k: int):
    """VALID kxk conv of int8 xq (h, w, Cin) -> (out_h, out_w, Cout) int32
    via k*k shifted MXU dots."""
    cin = xq.shape[-1]
    cout = wq.shape[-1]
    acc = jnp.zeros((out_h * out_w, cout), jnp.int32)
    for dy in range(k):
        for dx in range(k):
            xs = xq[dy : dy + out_h, dx : dx + out_w, :].reshape(out_h * out_w, cin)
            acc += jax.lax.dot_general(
                xs,
                wq[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    return acc.reshape(out_h, out_w, cout)


def _border_mask(eh, ew, row0, col0, h_img, w_img):
    """1.0 where the (eh, ew) extended window position lies inside the image
    ([row0, row0+eh) x [col0, col0+ew) in global coords), else 0.0."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (eh, ew, 1), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (eh, ew, 1), 1) + col0
    inside = (rows >= 0) & (rows < h_img) & (cols >= 0) & (cols < w_img)
    return inside.astype(jnp.float32)


def _win_pad(halo: int) -> int:
    """Total extra width DMA'd beyond tw: 8-aligned so the VMEM slice width
    (tw + _win_pad) stays a multiple of the sublane tiling when tw is."""
    return -(-(2 * halo) // 8) * 8


def _dma_window(x_hbm, scratch, sem, i, ty, tx, th, tw, halo):
    dma = pltpu.make_async_copy(
        x_hbm.at[
            i,
            pl.ds(ty * th, th + 2 * halo),
            pl.ds(tx * tw, tw + _win_pad(halo)),
            :,
        ],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()


def _dequant(acc_i32, sx, sw, bias):
    return acc_i32.astype(jnp.float32) * (sx * sw) + bias


def _light53_int8_kernel(
    x_hbm,
    act_ref,
    wa1, sa1, ba1, wa2, sa2, ba2,
    wb1, sb1, bb1, wb2, sb2, bb2,
    out_ref,
    xwin, sem,
    *, th, tw, h_img, w_img, res_scale, identity_scale, static_scales,
):
    # halo = 3 (first-conv radius + second-conv radius, max over branches)
    i, ty, tx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    _dma_window(x_hbm, xwin, sem, i, ty, tx, th, tw, halo=3)
    x = xwin[:].astype(jnp.float32)  # (th+6, tw+_win_pad(3), C)

    def quant(t, idx):
        if static_scales:
            return _quantize_static(t, act_ref[idx])
        return _quantize(t)

    ident = x[3 : 3 + th, 3 : 3 + tw, :].reshape(th * tw, -1)
    xq, sx = quant(x, 0)
    r0, c0 = ty * th, tx * tw

    # branch a: conv3 VALID on the full window -> (th+4, tw+4) intermediate
    # (real values at interior sub-tile boundaries), mask positions outside
    # the image (the SAME chain's zero padding), requant, conv5 -> (th, tw).
    ta = _dequant(_conv_int8(xq, wa1[...], th + 4, tw + 4, 3), sx, sa1[...], ba1[...])
    ta = jnp.maximum(ta, 0.0) * _border_mask(th + 4, tw + 4, r0 - 2, c0 - 2, h_img, w_img)
    taq, sta = quant(ta, 1)
    a = _dequant(_conv_int8(taq, wa2[...], th, tw, 5), sta, sa2[...], ba2[...])

    # branch b: conv5 VALID on the full window -> (th+2, tw+2), mask,
    # requant, conv3 -> (th, tw)
    tb = _dequant(
        _conv_int8(xq, wb1[...], th + 2, tw + 2, 5), sx, sb1[...], bb1[...]
    )
    tb = jnp.maximum(tb, 0.0) * _border_mask(th + 2, tw + 2, r0 - 1, c0 - 1, h_img, w_img)
    tbq, stb = quant(tb, 2)
    b = _dequant(_conv_int8(tbq, wb2[...], th, tw, 3), stb, sb2[...], bb2[...])

    out = identity_scale * ident + res_scale * (a + b).reshape(th * tw, -1)
    # zero positions beyond the true image so the H/W-to-8 pad columns stay
    # exact SAME zero borders for the next block in the chain
    out = out.reshape(th, tw, -1) * _border_mask(th, tw, r0, c0, h_img, w_img)
    out_ref[0] = out.astype(out_ref.dtype)


def _light_int8_kernel(
    x_hbm, act_ref, w1, s1, b1, w2, s2, b2, out_ref, xwin, sem,
    *, th, tw, h_img, w_img, res_scale, static_scales,
):
    # halo = 2 (two 3x3 convs)
    i, ty, tx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    _dma_window(x_hbm, xwin, sem, i, ty, tx, th, tw, halo=2)
    x = xwin[:].astype(jnp.float32)  # (th+4, tw+4, C)

    def quant(t, idx):
        if static_scales:
            return _quantize_static(t, act_ref[idx])
        return _quantize(t)

    ident = x[2 : 2 + th, 2 : 2 + tw, :].reshape(th * tw, -1)
    xq, sx = quant(x, 0)
    r0, c0 = ty * th, tx * tw

    t = _dequant(_conv_int8(xq, w1[...], th + 2, tw + 2, 3), sx, s1[...], b1[...])
    t = jnp.maximum(t, 0.0) * _border_mask(th + 2, tw + 2, r0 - 1, c0 - 1, h_img, w_img)
    tq, st = quant(t, 1)
    u = _dequant(_conv_int8(tq, w2[...], th, tw, 3), st, s2[...], b2[...])
    out = ident + res_scale * u.reshape(th * tw, -1)
    out = out.reshape(th, tw, -1) * _border_mask(th, tw, r0, c0, h_img, w_img)
    out_ref[0] = out.astype(out_ref.dtype)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(dim: int, target: int) -> int:
    """Largest multiple-of-8 divisor of `dim` <= target (`dim` is 8-aligned
    by the wrappers, so 8 itself always qualifies).  Multiples of 8 keep
    every VMEM slice width on the (8, 128) tiling Mosaic requires."""
    for t in range(min(target, dim) // 8 * 8, 0, -8):
        if dim % t == 0:
            return t
    return dim


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def _pad_for_grid(x, halo: int):
    """Zero-pad (N, H, W, C) for the halo'd 8-aligned window grid.

    Returns (padded, h8, w8): top/left get `halo`, bottom fills H->h8 plus
    `halo`, right fills W->w8 plus the window-alignment remainder."""
    n, h, w, c = x.shape
    h8, w8 = _round8(h), _round8(w)
    wp = _win_pad(halo)
    xp = jnp.pad(
        x,
        ((0, 0), (halo, (h8 - h) + halo), (halo, (w8 - w) + wp - halo), (0, 0)),
    )
    return xp, h8, w8


def _full(shape):
    return pl.BlockSpec(shape, lambda i, j, k: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _smem_scales():
    return pl.BlockSpec((4,), lambda i, j, k: (0,), memory_space=pltpu.SMEM)


@functools.partial(
    jax.jit,
    static_argnames=("res_scale", "identity_scale", "tile", "interpret"),
)
def light53_int8(
    x,
    wa1q, sa1, ba1, wa2q, sa2, ba2,
    wb1q, sb1, bb1, wb2q, sb2, bb2,
    res_scale: float = 0.1,
    identity_scale: float = 0.9,
    tile: tuple[int, int] = (64, 128),
    interpret: bool | None = None,
    act_scales=None,
):
    """Fused int8 Light53 block over spatial tiles.

    x: (N, H, W, C) bf16/f32, SAME semantics; weights pre-quantized with
    :func:`quantize_weights_per_channel`.  H/W are tiled by divisors of
    ``tile`` (halo'd windows DMA'd from HBM); results match the whole-image
    SAME chain up to quantization noise for ANY tile split.

    ``act_scales``: optional (3,) f32 pre-calibrated activation scales
    (input, branch-a intermediate, branch-b intermediate) — the serving
    path (didbl_pallas.calibrate_didbl_act_scales); omitting them falls
    back to per-tile dynamic abs-max quantization (~5x the VPU cost).
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, w, c = x.shape
    halo = 3
    static = act_scales is not None
    act = (
        jnp.concatenate([act_scales.astype(jnp.float32), jnp.ones((1,), jnp.float32)])
        if static
        else jnp.ones((4,), jnp.float32)
    )
    xp, h8, w8 = _pad_for_grid(x, halo)
    th = _pick_tile(h8, tile[0])
    tw = _pick_tile(w8, tile[1])
    kernel = functools.partial(
        _light53_int8_kernel, th=th, tw=tw, h_img=h, w_img=w,
        res_scale=res_scale, identity_scale=identity_scale,
        static_scales=static,
    )
    conv_specs = [
        _full((3, 3, c, c)), _full((c,)), _full((c,)),
        _full((5, 5, c, c)), _full((c,)), _full((c,)),
        _full((5, 5, c, c)), _full((c,)), _full((c,)),
        _full((3, 3, c, c)), _full((c,)), _full((c,)),
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h8, w8, c), x.dtype),
        grid=(n, h8 // th, w8 // tw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), _smem_scales()]
        + conv_specs,
        out_specs=pl.BlockSpec(
            (1, th, tw, c), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * halo, tw + _win_pad(halo), c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        xp, act,
        wa1q, sa1, ba1.astype(jnp.float32), wa2q, sa2, ba2.astype(jnp.float32),
        wb1q, sb1, bb1.astype(jnp.float32), wb2q, sb2, bb2.astype(jnp.float32),
    )
    return out[:, :h, :w, :]


@functools.partial(jax.jit, static_argnames=("res_scale", "tile", "interpret"))
def light_int8(
    x, w1q, s1, b1, w2q, s2, b2,
    res_scale: float = 0.1,
    tile: tuple[int, int] = (64, 128),
    interpret: bool | None = None,
    act_scales=None,
):
    """Fused int8 Light block over spatial tiles (conv3-relu-conv3 residual).

    ``act_scales``: optional (2,) f32 calibrated scales (input,
    intermediate); None -> dynamic per-tile abs-max quantization."""
    if interpret is None:
        interpret = _interpret_default()
    n, h, w, c = x.shape
    halo = 2
    static = act_scales is not None
    act = (
        jnp.concatenate([act_scales.astype(jnp.float32), jnp.ones((2,), jnp.float32)])
        if static
        else jnp.ones((4,), jnp.float32)
    )
    xp, h8, w8 = _pad_for_grid(x, halo)
    th = _pick_tile(h8, tile[0])
    tw = _pick_tile(w8, tile[1])
    kernel = functools.partial(
        _light_int8_kernel, th=th, tw=tw, h_img=h, w_img=w,
        res_scale=res_scale, static_scales=static,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h8, w8, c), x.dtype),
        grid=(n, h8 // th, w8 // tw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), _smem_scales()]
        + [_full((3, 3, c, c)), _full((c,)), _full((c,)),
           _full((3, 3, c, c)), _full((c,)), _full((c,))],
        out_specs=pl.BlockSpec(
            (1, th, tw, c), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * halo, tw + _win_pad(halo), c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, act, w1q, s1, b1.astype(jnp.float32), w2q, s2, b2.astype(jnp.float32))
    return out[:, :h, :w, :]
