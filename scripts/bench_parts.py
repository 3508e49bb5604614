"""Locate the MFU gap: time body-only, tail-only, and full forward at 512^2
whole-frame bf16.  Prints TFLOP/s per part (peak v5e bf16 = 197)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# FLOPs per input pixel (didbl full config)
LIGHT53 = 2 * (2 * 9 * 128 * 128 + 2 * 25 * 128 * 128)
BODY_PX = 2 * 3 * 128 + 16 * LIGHT53 + 6 * (2 * 2 * 9 * 128 * 128)
TAIL_PX = 16 * (2 * LIGHT53 + 2 * 9 * 128 * 3)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.engine import SuperResolver

    size = 512
    batch = int(os.environ.get("IEK_BENCH_BATCH", "4"))
    iters = 3
    r = SuperResolver(model="didbl", dtype=jnp.bfloat16)
    params = r.params
    module = r.module

    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)))
    feats0 = jax.device_put(jnp.zeros((batch, size, size, 128), jnp.bfloat16))

    def timed(fn, *args):
        c = fn(params, *args, jnp.int32(1))
        float(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(params, *args, c)
        float(c)
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def run_body(params, ims, salt):
        im2 = ims + (salt % 2).astype(jnp.uint8)

        def one(im):
            x = im.astype(jnp.float32)[None] / 255.0
            h = module.apply({"params": params}, x, method="body")
            return jnp.sum(h[0, ::97, ::97, :].astype(jnp.float32))

        return jnp.sum(lax.map(one, im2))

    @jax.jit
    def run_tail(params, fts, salt):
        f2 = fts + (salt % 2).astype(jnp.bfloat16)

        def one(f):
            y = module.apply({"params": params}, f[None], method="tail")
            return jnp.sum(y[0, ::97, ::97, :])

        return jnp.sum(lax.map(one, f2))

    px = batch * size * size
    dt = timed(run_body, imgs)
    print(json.dumps({"part": "body", "s": round(dt, 4),
                      "tflops": round(px * BODY_PX / dt / 1e12, 1)}), flush=True)
    dt = timed(run_tail, feats0)
    print(json.dumps({"part": "tail", "s": round(dt, 4),
                      "tflops": round(px * TAIL_PX / dt / 1e12, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
