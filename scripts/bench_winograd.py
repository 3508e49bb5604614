"""Winograd vs direct conv on hardware (ROADMAP r2 "Winograd" candidate).

Roofline prediction (ops/winograd.py): on v5e the VPU:MXU rate ratio (~52x)
makes the f32 tile transforms cost more than the saved MXU multiplies at
C=128, so XLA-level Winograd should LOSE to the direct conv despite the
2.25-2.78x FLOP cut.  This bench records the measured number either way
(the VERDICT r1 item-10 protocol: negative results get written down).

Prints one JSON line per (k, variant): direct lax.conv, winograd m=2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 128


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.ops.winograd import winograd_conv2d_same

    n, h, w = 4, 256, 256
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((n, h, w, C)).astype(np.float32) * 0.3)
        .astype(jnp.bfloat16)
    )
    iters = 8

    for k in (3, 5):
        wt = jax.device_put(
            jnp.asarray(rng.standard_normal((k, k, C, C)).astype(np.float32) * 0.05)
        )
        direct_flops = n * h * w * 2 * k * k * C * C

        @jax.jit
        def direct(x, wt=wt):
            y = lax.conv_general_dilated(
                x, wt.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # tiny epilogue so chaining can't collapse
            return jnp.tanh(y) * 0.5 + x

        @jax.jit
        def wino(x, wt=wt):
            y = winograd_conv2d_same(x, wt, m=2)
            return jnp.tanh(y) * 0.5 + x

        for name, fn in (("direct", direct), ("winograd_m2", wino)):
            cur = fn(x)
            float(jnp.sum(cur.astype(jnp.float32)[::7, ::13, ::17, ::29]))
            t0 = time.perf_counter()
            cur = x
            for _ in range(iters):
                cur = fn(cur)
            float(jnp.sum(cur.astype(jnp.float32)[::7, ::13, ::17, ::29]))
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "conv": f"{k}x{k}",
                "variant": name,
                "ms": round(dt * 1e3, 2),
                "direct_equiv_tflops": round(direct_flops / dt / 1e12, 1),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
