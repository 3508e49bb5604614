"""Pallas-fused forward for the didbl generator.

Runs the exact DifvdsrDouble graph (models/didbl.py) over the *same flax
param tree*, but with every residual block executed by the fused
VMEM-resident Pallas kernels (ops/pallas/blocks.py).  The 1x1 entry conv,
the TF1-bilinear x4 matmuls and the 3x3 output conv stay on the XLA path
(they are single ops with nothing to fuse across).

Use: ``apply_didbl_pallas(params, x, dtype=jnp.bfloat16)`` — drop-in for
``module.apply({'params': params}, x)``; engine selects it via
``SuperResolver(forward='pallas')``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import lax

from image_enhance_keras_tpu.ops.pallas.blocks import (
    fused_light_block,
    fused_light53_block,
)
from image_enhance_keras_tpu.ops.resize import resize_bilinear_tf1

__all__ = ["apply_didbl_pallas"]


def _conv(x, p, precision=None):
    y = lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return y + p["bias"].astype(x.dtype)


def _light53(x, p, interpret=None):
    return fused_light53_block(
        x,
        p["conv_a1"]["kernel"], p["conv_a1"]["bias"],
        p["conv_a2"]["kernel"], p["conv_a2"]["bias"],
        p["conv_b1"]["kernel"], p["conv_b1"]["bias"],
        p["conv_b2"]["kernel"], p["conv_b2"]["bias"],
        res_scale=0.1,
        identity_scale=0.9,
        interpret=interpret,
    )


def _light53_xla(x, p):
    """Plain-XLA light53 (used post-upsample where a whole tile exceeds VMEM;
    at 16x the pixel count those convs are compute-bound and XLA already
    saturates the MXU — fusion pays off on the small-spatial tower)."""
    a = jnp.maximum(_conv(x, p["conv_a1"]), 0.0)
    a = _conv(a, p["conv_a2"])
    b = jnp.maximum(_conv(x, p["conv_b1"]), 0.0)
    b = _conv(b, p["conv_b2"])
    return jnp.asarray(0.9, x.dtype) * x + jnp.asarray(0.1, x.dtype) * (a + b)


def apply_didbl_pallas(
    params: Any,
    x: jnp.ndarray,
    dtype: Any = None,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    scale: int = 4,
    interpret: bool | None = None,
    chain: bool = False,
) -> jnp.ndarray:
    """(N, H, W, 3) [0,1] -> (N, 4H, 4W, 3); same math as DifvdsrDouble.

    ``chain=True`` uses the weight-streaming chain kernels (ops/pallas/tower):
    the whole pre-upsample tower runs with VMEM-resident activations and
    double-buffered weight DMA — requires tiles <= ~64x64 at C=128.
    """
    h = x.astype(dtype or x.dtype)
    h = jnp.maximum(_conv(h, params["level1"]), 0.0)
    if chain:
        from image_enhance_keras_tpu.ops.pallas.tower import (
            fused_light53_chain,
            fused_light_chain,
        )

        b = [params[f"body53_{i}"] for i in range(n_body53)]
        h = fused_light53_chain(
            h,
            jnp.stack([p["conv_a1"]["kernel"] for p in b]),
            jnp.stack([p["conv_a1"]["bias"] for p in b]),
            jnp.stack([p["conv_a2"]["kernel"] for p in b]),
            jnp.stack([p["conv_a2"]["bias"] for p in b]),
            jnp.stack([p["conv_b1"]["kernel"] for p in b]),
            jnp.stack([p["conv_b1"]["bias"] for p in b]),
            jnp.stack([p["conv_b2"]["kernel"] for p in b]),
            jnp.stack([p["conv_b2"]["bias"] for p in b]),
            interpret=interpret,
        )
        l = [params[f"light_{i}"] for i in range(n_light)]
        h = fused_light_chain(
            h,
            jnp.stack([p["conv_a"]["kernel"] for p in l]),
            jnp.stack([p["conv_a"]["bias"] for p in l]),
            jnp.stack([p["conv_b"]["kernel"] for p in l]),
            jnp.stack([p["conv_b"]["bias"] for p in l]),
            interpret=interpret,
        )
    else:
        for i in range(n_body53):
            h = _light53(h, params[f"body53_{i}"], interpret)
        for i in range(n_light):
            p = params[f"light_{i}"]
            h = fused_light_block(
                h,
                p["conv_a"]["kernel"], p["conv_a"]["bias"],
                p["conv_b"]["kernel"], p["conv_b"]["bias"],
                res_scale=0.1,
                interpret=interpret,
            )
    h = resize_bilinear_tf1(h, (scale * h.shape[-3], scale * h.shape[-2]))
    for i in range(n_tail53):
        h = _light53_xla(h, params[f"tail53_{i}"])
    out = _conv(h, params["out"])
    return jnp.maximum(out, 0.0).astype(jnp.float32)
