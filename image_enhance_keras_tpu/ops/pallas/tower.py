"""Fused residual-tower kernels with double-buffered weight streaming.

The flagship tower is 16 Light53 + 6 Light blocks back-to-back on each tile
(reference models.py:1182-1190).  The per-block kernels (blocks.py) already
keep one block VMEM-resident; these chain kernels keep the *activation* in
VMEM across the whole tower and stream each block's weights from HBM with
double-buffered async DMA (pallas_guide.md "Double Buffering"), so per tile
the only HBM activation traffic is one read of x and one write of the tower
output.

In the tiled pipeline every tile is an independent SAME-conv image, so
chaining needs no inter-block halo: each block zero-pads its own VMEM
intermediate exactly like the unfused graph.

VMEM budget (bf16 activations, f32 accumulators, C=128): a 64x64 tile uses
~10MB including two weight slots (2 x 2.23MB for light53) — fits; 96x96 does
not (the f32 accumulator alone is 4.7MB).  Use tile geometry 64/48/8 with
this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_light53_chain", "fused_light_chain"]


# one source of truth for the in-kernel conv/pad helpers: numerics changes
# in blocks.py must apply to the chain kernels too (forward='pallas' vs
# 'pallas_chain' divergence would be silent otherwise)
from image_enhance_keras_tpu.ops.pallas.blocks import (  # noqa: E402
    _conv_shifted,
    _relu_pad,
)


def _light53_body(x, ws, h, w, res_scale, identity_scale, dtype):
    """x: (h, w, C) unpadded; ws: dict of weight arrays for one block.

    VMEM discipline: each conv accumulates in f32 but its result is cast to
    the compute dtype immediately, so at most one (h*w, C) f32 buffer is
    live at a time (the final combine runs in the compute dtype — the
    chain path targets the bf16 serving profile).
    """
    xp = jnp.pad(x, ((2, 2), (2, 2), (0, 0)))
    ta = _conv_shifted(xp[1 : 1 + h + 2, 1 : 1 + w + 2, :], ws["wa1"], h, w, 3)
    ta = _relu_pad(ta + ws["ba1"].astype(jnp.float32), h, w, 2, dtype)
    ya = (
        _conv_shifted(ta, ws["wa2"], h, w, 5) + ws["ba2"].astype(jnp.float32)
    ).astype(dtype)
    tb = _conv_shifted(xp, ws["wb1"], h, w, 5)
    tb = _relu_pad(tb + ws["bb1"].astype(jnp.float32), h, w, 1, dtype)
    yb = (
        _conv_shifted(tb, ws["wb2"], h, w, 3) + ws["bb2"].astype(jnp.float32)
    ).astype(dtype)
    y = (ya + yb).reshape(h, w, -1)
    return (
        jnp.asarray(identity_scale, dtype) * x + jnp.asarray(res_scale, dtype) * y
    )


def _light_body(x, ws, h, w, res_scale, dtype):
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    t = _conv_shifted(xp, ws["wa1"], h, w, 3)
    t = _relu_pad(t + ws["ba1"].astype(jnp.float32), h, w, 1, dtype)
    u = (
        _conv_shifted(t, ws["wa2"], h, w, 3) + ws["ba2"].astype(jnp.float32)
    ).astype(dtype)
    return x + jnp.asarray(res_scale, dtype) * u.reshape(h, w, -1)


def _make_chain_kernel(names, body, k_blocks, h, w, **body_kw):
    """Build a kernel streaming `names` weight tensors per block.

    Argument layout: x_ref, *hbm_weight_refs, out_ref, *vmem_slots, sem.
    hbm refs are (K, ...) stacked; slots are (2, ...) double buffers.

    The block loop is a ``fori_loop`` with dynamic slot indices (the guide's
    double-buffer pattern) — a Python-unrolled 16-block body blows Mosaic's
    scoped-stack liveness (observed: 20MB scoped at 64x64).
    """
    n_t = len(names)

    def kernel(*refs):
        x_ref = refs[0]
        hbm = refs[1 : 1 + n_t]
        out_ref = refs[1 + n_t]
        slots = refs[2 + n_t : 2 + 2 * n_t]
        sem = refs[2 + 2 * n_t]

        def copies(slot, k):
            return [
                pltpu.make_async_copy(
                    hbm[i].at[k], slots[i].at[slot], sem.at[slot * n_t + i]
                )
                for i in range(n_t)
            ]

        for c in copies(0, 0):
            c.start()

        def loop(k, act):
            cur = jax.lax.rem(k, 2)
            nxt = jax.lax.rem(k + 1, 2)

            @pl.when(k + 1 < k_blocks)
            def _():
                for c in copies(nxt, k + 1):
                    c.start()

            for c in copies(cur, k):
                c.wait()
            ws = {
                name: slots[i][pl.ds(cur, 1)][0] for i, name in enumerate(names)
            }
            return body(act, ws, h, w, dtype=x_ref.dtype, **body_kw)

        act = jax.lax.fori_loop(0, k_blocks, loop, x_ref[0])
        out_ref[0] = act

    return kernel


def _chain_call(x, stacked, names, body, k_blocks, interpret, **body_kw):
    n, h, w, c = x.shape
    dt = x.dtype
    n_t = len(names)
    full_hbm = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_t)]
    slot_shapes = [
        pltpu.VMEM((2,) + stacked[i].shape[1:], stacked[i].dtype) for i in range(n_t)
    ]
    kernel = _make_chain_kernel(names, body, k_blocks, h, w, **body_kw)
    kwargs = {}
    if not interpret:
        # the 16MB scoped default under-reports what the part can hold; the
        # chain needs ~22MB scoped at 64x64 tiles (pipeline buffers + weight
        # slots + conv temps)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dt),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            *full_hbm,
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[*slot_shapes, pltpu.SemaphoreType.DMA((2 * n_t,))],
        interpret=interpret,
        **kwargs,
    )(x, *stacked)


def _stack(params_list, key_a, key_b, dt):
    return jnp.stack([p[key_a][key_b] for p in params_list]).astype(dt)


@functools.partial(jax.jit, static_argnames=("res_scale", "identity_scale", "interpret"))
def fused_light53_chain(
    x,
    wa1, ba1, wa2, ba2, wb1, bb1, wb2, bb2,  # each stacked (K, ...)
    res_scale: float = 0.1,
    identity_scale: float = 0.9,
    interpret: bool | None = None,
):
    """K chained Light53 blocks; weights streamed per block via DMA.
    x: (N, h, w, C); weight args stacked on a leading K axis."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_blocks = wa1.shape[0]
    dt = x.dtype
    names = ["wa1", "ba1", "wa2", "ba2", "wb1", "bb1", "wb2", "bb2"]
    stacked = [
        wa1.astype(dt), ba1.astype(jnp.float32), wa2.astype(dt), ba2.astype(jnp.float32),
        wb1.astype(dt), bb1.astype(jnp.float32), wb2.astype(dt), bb2.astype(jnp.float32),
    ]
    return _chain_call(
        x, stacked, names, _light53_body, k_blocks, interpret,
        res_scale=res_scale, identity_scale=identity_scale,
    )


@functools.partial(jax.jit, static_argnames=("res_scale", "interpret"))
def fused_light_chain(
    x, wa1, ba1, wa2, ba2, res_scale: float = 0.1, interpret: bool | None = None
):
    """K chained Light blocks with streamed weights."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_blocks = wa1.shape[0]
    dt = x.dtype
    names = ["wa1", "ba1", "wa2", "ba2"]
    stacked = [
        wa1.astype(dt), ba1.astype(jnp.float32), wa2.astype(dt), ba2.astype(jnp.float32),
    ]
    return _chain_call(
        x, stacked, names, _light_body, k_blocks, interpret, res_scale=res_scale
    )
