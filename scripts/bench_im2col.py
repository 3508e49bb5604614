"""MFU experiment (VERDICT r1 item 10): shifted-dot vs im2col contraction
layout in the fused light53 Pallas kernel, on hardware.  Reports TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 128
LIGHT53_FLOPS_PX = 2 * (2 * 9 * C * C + 2 * 25 * C * C)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_enhance_keras_tpu.ops.pallas.blocks import fused_light53_block

    n, h, w = 32, 64, 64
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((n, h, w, C)).astype(np.float32) * 0.3)
        .astype(jnp.bfloat16)
    )
    ws = [
        jax.device_put(jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05))
        for s in ((3, 3, C, C), (C,), (5, 5, C, C), (C,),
                  (5, 5, C, C), (C,), (3, 3, C, C), (C,))
    ]
    flops = n * h * w * LIGHT53_FLOPS_PX
    iters = 8

    for im2col in (False, True):
        def run(x):
            return fused_light53_block(x, *ws, interpret=False, im2col=im2col)

        y = run(x)
        float(jnp.sum(y.astype(jnp.float32)[::7, ::13, ::17, ::29]))
        t0 = time.perf_counter()
        cur = x
        for _ in range(iters):
            cur = run(cur)  # chained: output feeds the next call
        float(jnp.sum(cur.astype(jnp.float32)[::7, ::13, ::17, ::29]))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "layout": "im2col" if im2col else "shifted",
            "s": round(dt, 5),
            "tflops": round(flops / dt / 1e12, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
