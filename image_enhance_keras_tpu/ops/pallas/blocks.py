"""Pallas TPU kernels: fused residual blocks.

The flagship tower is 16x Light53 + 6x Light blocks (reference
models.py:1177-1199) — per block, 2-4 SAME convs plus elementwise
scale/add epilogues.  XLA runs each conv as its own kernel with the
intermediate activations round-tripping through HBM; these kernels keep a
whole residual block VMEM-resident: the input tile (plus conv halo) is read
from HBM once, both branch towers run as shifted-slice MXU matmuls out of
VMEM scratch, and only the block output is written back.

HBM traffic per Light53 block drops from ~6 activation tensors (x, 4
intermediates, out) to 2 (x, out) — a 3x cut on the bandwidth-bound side of
the roofline while the matmuls stay on the MXU.

Layout notes (pallas_guide.md):
  * channel count 128 == lane width; im2col rows are (H*W, C) with C on the
    lane dimension, so every dot is a (H*W, 128) x (128, 128) MXU matmul;
  * accumulation in f32 (`preferred_element_type`), params f32, activations
    cast to the compute dtype outside;
  * grid = one program per tile in the batch; tiles up to ~64x64x128 fit
    the ~16MB of VMEM once f32 intermediates and the 5x5 weight copies are
    counted (_check_vmem fails fast above that — 96x96 bf16 needs ~12.8MB
    of halo'd buffers alone; use the XLA path or smaller tiles there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_light_block", "fused_light53_block"]


def _conv_shifted(x, w, out_h: int, out_w: int, k: int, im2col: bool = False):
    """VALID kxk conv of x (h, w, Cin) -> (out_h*out_w, Cout).

    Two MXU layouts (ROADMAP r1 "im2col contraction layout" experiment):
      * shifted (default): k*k accumulated (HW, Cin) x (Cin, Cout) dots —
        no data duplication, k*k MXU passes with short K=Cin contractions;
      * im2col: materialise the (HW, k*k*Cin) patch matrix in VMEM and run
        ONE (HW, k*k*Cin) x (k*k*Cin, Cout) dot — k*k x the VMEM footprint,
        but a single long-K contraction the MXU can stream.
    """
    cin = x.shape[-1]
    cout = w.shape[-1]
    if im2col:
        cols = [
            x[dy : dy + out_h, dx : dx + out_w, :].reshape(out_h * out_w, cin)
            for dy in range(k)
            for dx in range(k)
        ]
        mat = jnp.concatenate(cols, axis=1)  # (HW, k*k*Cin), dy-major
        return jnp.dot(
            mat,
            w.reshape(k * k * cin, cout).astype(mat.dtype),
            preferred_element_type=jnp.float32,
        )
    acc = jnp.zeros((out_h * out_w, cout), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            xs = x[dy : dy + out_h, dx : dx + out_w, :].reshape(out_h * out_w, cin)
            acc += jnp.dot(
                xs, w[dy, dx], preferred_element_type=jnp.float32
            )
    return acc


def _relu_pad(t_flat, h, w, pad, dtype):
    """(h*w, C) f32 -> relu -> zero-pad spatially by `pad` -> (h+2p, w+2p, C).

    SAME-conv chains zero-pad the *intermediate* activation — values in the
    halo ring are zeros, not conv outputs computed over padded input.
    """
    t = jnp.maximum(t_flat, 0.0).reshape(h, w, -1)
    return jnp.pad(t, ((pad, pad), (pad, pad), (0, 0))).astype(dtype)


def _light_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, h, w, res_scale, im2col=False):
    """x + res_scale * conv3(relu(conv3(x))); x_ref zero-padded by 1/side."""
    dt = x_ref.dtype
    x = x_ref[0]
    t = _conv_shifted(x, w1_ref[...], h, w, 3, im2col) + b1_ref[...].astype(jnp.float32)
    t = _relu_pad(t, h, w, 1, dt)
    u = _conv_shifted(t, w2_ref[...], h, w, 3, im2col) + b2_ref[...].astype(jnp.float32)
    ident = x[1 : 1 + h, 1 : 1 + w, :].reshape(h * w, -1).astype(jnp.float32)
    out = ident + res_scale * u
    out_ref[0] = out.reshape(h, w, -1).astype(dt)


def _light53_kernel(
    x_ref,
    wa1_ref, ba1_ref, wa2_ref, ba2_ref,
    wb1_ref, bb1_ref, wb2_ref, bb2_ref,
    out_ref,
    *, h, w, res_scale, identity_scale, im2col=False,
):
    """identity_scale*x + res_scale*(conv5(relu(conv3(x))) + conv3(relu(conv5(x))));
    x_ref zero-padded by 2 per side (the conv5 halo).

    VMEM discipline: one shared f32 accumulator carries
    ident*scale + branch_a + branch_b — intermediates are cast back to the
    compute dtype as soon as their conv finishes, keeping the peak footprint
    under the ~16MB scoped limit for 96x96x128 tiles.
    """
    dt = x_ref.dtype
    x = x_ref[0]
    ident = x[2 : 2 + h, 2 : 2 + w, :].reshape(h * w, -1).astype(jnp.float32)
    bias_sum = (ba2_ref[...] + bb2_ref[...]).astype(jnp.float32)
    acc = (identity_scale / res_scale) * ident + bias_sum

    # branch a: conv3 (1-padded interior) -> relu/zero-pad 2 -> conv5
    ta = _conv_shifted(
        x[1 : 1 + h + 2, 1 : 1 + w + 2, :], wa1_ref[...], h, w, 3, im2col
    ) + ba1_ref[...].astype(jnp.float32)
    ta = _relu_pad(ta, h, w, 2, dt)
    acc = acc + _conv_shifted(ta, wa2_ref[...], h, w, 5, im2col)

    # branch b: conv5 -> relu/zero-pad 1 -> conv3
    tb = _conv_shifted(x, wb1_ref[...], h, w, 5, im2col) + bb1_ref[...].astype(jnp.float32)
    tb = _relu_pad(tb, h, w, 1, dt)
    acc = acc + _conv_shifted(tb, wb2_ref[...], h, w, 3, im2col)

    out = res_scale * acc
    out_ref[0] = out.reshape(h, w, -1).astype(dt)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16MB of VMEM


def _check_vmem(h: int, w: int, c: int, dtype, halo: int, n_bufs: int) -> None:
    """Fail fast with a clear error instead of a Mosaic OOM: these kernels
    keep the whole (h+2*halo, w+2*halo, c) tile plus intermediates resident.
    Spatial tiles above ~128x128 at c=128 need the halo-DMA variant
    (roadmap) — use the XLA path there (models/didbl_pallas.py does)."""
    itemsize = jnp.dtype(dtype).itemsize
    need = (h + 2 * halo) * (w + 2 * halo) * c * itemsize * n_bufs
    if need > _VMEM_BUDGET:
        raise ValueError(
            f"fused block tile ({h}x{w}x{c}, {jnp.dtype(dtype).name}) needs "
            f"~{need >> 20}MB of VMEM (> {_VMEM_BUDGET >> 20}MB budget); "
            "use smaller spatial tiles or the XLA path"
        )


@functools.partial(jax.jit, static_argnames=("res_scale", "interpret", "im2col"))
def fused_light_block(x, w1, b1, w2, b2, res_scale: float = 0.1, interpret: bool | None = None, im2col: bool = False):
    """Batched fused Light block. x: (N, H, W, C) unpadded; SAME semantics."""
    if interpret is None:
        interpret = _interpret_default()
    n, h, w, c = x.shape
    if not interpret:
        _check_vmem(h, w, c, x.dtype, halo=1, n_bufs=4)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dt = x.dtype
    kernel = functools.partial(_light_kernel, h=h, w=w, res_scale=res_scale, im2col=im2col)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dt),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w1.astype(dt), b1, w2.astype(dt), b2)


@functools.partial(jax.jit, static_argnames=("res_scale", "identity_scale", "interpret", "im2col"))
def fused_light53_block(
    x,
    wa1, ba1, wa2, ba2,
    wb1, bb1, wb2, bb2,
    res_scale: float = 0.1,
    identity_scale: float = 0.9,
    interpret: bool | None = None,
    im2col: bool = False,
):
    """Batched fused Light53 block. x: (N, H, W, C) unpadded; SAME semantics."""
    if interpret is None:
        interpret = _interpret_default()
    n, h, w, c = x.shape
    if not interpret:
        _check_vmem(h, w, c, x.dtype, halo=2, n_bufs=5)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    dt = x.dtype
    kernel = functools.partial(
        _light53_kernel, h=h, w=w, res_scale=res_scale,
        identity_scale=identity_scale, im2col=im2col,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dt),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 4, w + 4, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            full((3, 3, c, c)), full((c,)), full((5, 5, c, c)), full((c,)),
            full((5, 5, c, c)), full((c,)), full((3, 3, c, c)), full((c,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        xp,
        wa1.astype(dt), ba1, wa2.astype(dt), ba2,
        wb1.astype(dt), bb1, wb2.astype(dt), bb2,
    )
