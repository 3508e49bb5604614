"""Relay-immune per-block kernel timing (the r2 methodology fix).

Through the axon relay every dispatch+fetch costs a ~30ms constant, which
polluted r1's per-kernel numbers (139-141 "TFLOP/s" readings were really
peak-rate kernels plus relay overhead).  This bench times jitted chains of
NB=16 and NB=64 block applications and reports the SLOPE — the constant
cancels exactly.

Measured on v5e (2026-08, this method):
  xla_bf16      1.476 ms/block  197.9 TFLOP/s  (100% of bf16 peak)
  xla_int8      0.780 ms/block  374.5 TFLOP/s  (95% of the 394 TOPS peak)
  pallas_bf16   ~1.5   ms/block  (matches XLA)
  pallas_int8   2.662 ms/block  109.7 TFLOP/s  (Mosaic dot_general runs
                s8xs8->s32 at the bf16 rate; quantize epilogues add ~VPU
                cost on top -> 1.8x SLOWER than bf16)

Conclusion encoded in models/didbl_pallas.py: the production int8 path is
XLA convs over quantized tensors (forward='int8'), not Pallas kernels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 128
SHAPE = (32, 64, 64)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.ops.pallas.blocks import fused_light53_block
    from image_enhance_keras_tpu.ops.pallas.int8_blocks import (
        light53_int8,
        quantize_weights_per_channel,
    )

    rng = np.random.default_rng(0)
    flops_block = SHAPE[0] * SHAPE[1] * SHAPE[2] * 2 * (2 * 9 + 2 * 25) * C * C
    ws, wi = {}, {}
    for nm, k in (("a1", 3), ("a2", 5), ("b1", 5), ("b2", 3)):
        w = jnp.asarray(rng.standard_normal((k, k, C, C)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((C,)) * 0.01, jnp.float32)
        q, s = quantize_weights_per_channel(w)
        ws[nm] = (w, b, q, s)
        wi[nm] = jnp.asarray(rng.integers(-127, 127, (k, k, C, C)), jnp.int8)
    act = jnp.asarray([0.3 / 127, 0.5 / 127, 0.5 / 127], jnp.float32)

    def conv(x, w, pe=jnp.float32):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pe)

    def xla_bf16(x):
        a = conv(jnp.maximum(conv(x, ws["a1"][0].astype(x.dtype)), 0)
                 .astype(x.dtype), ws["a2"][0].astype(x.dtype))
        b = conv(jnp.maximum(conv(x, ws["b1"][0].astype(x.dtype)), 0)
                 .astype(x.dtype), ws["b2"][0].astype(x.dtype))
        return (0.9 * x.astype(jnp.float32) + 0.1 * (a + b)).astype(x.dtype)

    def xla_int8(x):
        def rq(acc):
            return jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        a = conv(rq(jnp.maximum(conv(x, wi["a1"], jnp.int32), 0)),
                 wi["a2"], jnp.int32)
        b = conv(rq(jnp.maximum(conv(x, wi["b1"], jnp.int32), 0)),
                 wi["b2"], jnp.int32)
        return rq(a + b)

    def pallas_bf16(x):
        return fused_light53_block(
            x, ws["a1"][0], ws["a1"][1], ws["a2"][0], ws["a2"][1],
            ws["b1"][0], ws["b1"][1], ws["b2"][0], ws["b2"][1],
            interpret=False).astype(x.dtype)

    def pallas_bf16_im2col(x):
        # the r1 "im2col contraction layout" question, slope-measured
        return fused_light53_block(
            x, ws["a1"][0], ws["a1"][1], ws["a2"][0], ws["a2"][1],
            ws["b1"][0], ws["b1"][1], ws["b2"][0], ws["b2"][1],
            interpret=False, im2col=True).astype(x.dtype)

    def pallas_int8(x):
        return light53_int8(
            x, ws["a1"][2], ws["a1"][3], ws["a1"][1],
            ws["a2"][2], ws["a2"][3], ws["a2"][1],
            ws["b1"][2], ws["b1"][3], ws["b1"][1],
            ws["b2"][2], ws["b2"][3], ws["b2"][1],
            tile=(64, 128), interpret=False, act_scales=act).astype(x.dtype)

    def chain_time(block_fn, nb, x):
        @jax.jit
        def chain(x):
            def body(c, _):
                return block_fn(c), ()
            y, _ = lax.scan(body, x, None, length=nb)
            return jnp.sum(y.astype(jnp.float32)[:, ::31, ::31])

        float(chain(x))
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            float(chain(x))
        return (time.perf_counter() - t0) / reps

    xb = jax.device_put(
        jnp.asarray(rng.standard_normal(SHAPE + (C,)) * 0.3, jnp.bfloat16))
    xi = jax.device_put(jnp.asarray(rng.integers(-64, 64, SHAPE + (C,)), jnp.int8))

    cases = [
        ("xla_bf16", xla_bf16, xb),
        ("xla_int8", xla_int8, xi),
        ("pallas_bf16", pallas_bf16, xb),
        ("pallas_bf16_im2col", pallas_bf16_im2col, xb),
        ("pallas_int8", pallas_int8, xb),
    ]
    only = os.environ.get("IEK_SLOPE_CASES")
    for name, fn, x in cases:
        if only and name not in only.split(","):
            continue
        t16 = chain_time(fn, 16, x)
        t64 = chain_time(fn, 64, x)
        per_block = (t64 - t16) / 48
        print(json.dumps({
            "case": name,
            "ms_per_block": round(per_block * 1e3, 3),
            "tflops": round(flops_block / per_block / 1e12, 1),
            "relay_const_ms": round((t16 - 16 * per_block) * 1e3, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
