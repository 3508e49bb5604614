"""Round-2 perf study: fast vs split vs patch(perf) vs patch(ref) on the chip.

Prints one JSON line per measurement as it completes (relay compiles are
slow and can wedge; partial results must survive).  Timing follows bench.py:
chained iterations + scalar checksum fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.engine import SuperResolver

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "platform": dev.platform,
                      "kind": getattr(dev, "device_kind", "?")}), flush=True)

    size = int(os.environ.get("IEK_BENCH_SIZE", "512"))
    batch = int(os.environ.get("IEK_BENCH_BATCH", "4"))
    iters = int(os.environ.get("IEK_BENCH_ITERS", "3"))
    modes = os.environ.get("IEK_BENCH_MODES", "fast,split,patch_perf,patch_ref").split(",")
    split_tile = int(os.environ.get("IEK_BENCH_SPLIT_TILE", "128"))
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    )
    out_px = 16 * size * size * batch

    def timed(fn, params) -> float:
        c = fn(params, imgs, jnp.int32(1))
        float(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(params, imgs, c)
        float(c)
        return (time.perf_counter() - t0) / iters

    def emit(name, dt):
        mpix = out_px / dt / 1e6
        print(json.dumps({"mode": name, "s_per_batch": round(dt, 4),
                          "out_mpix_s": round(mpix, 2),
                          "vs_125": round(mpix / 12.5, 3)}), flush=True)

    def checksum_map(per_image_fn):
        def fn(params, ims, salt):
            im2 = ims + (salt % 2).astype(jnp.uint8)
            outs = lax.map(lambda im: per_image_fn(params, im), im2)
            return jnp.sum(outs[:, ::97, ::97, :].astype(jnp.int32))
        return jax.jit(fn)

    for mode in modes:
        t0 = time.time()
        if mode == "fast":
            r = SuperResolver(model="didbl", dtype=dtype, mode="fast")
            inner = r._fast_fn((size, size))
        elif mode == "split":
            r = SuperResolver(model="didbl", dtype=dtype, mode="split",
                              split_tile=split_tile)
            inner = r._split_fn((size, size))
        elif mode == "patch_perf":
            r = SuperResolver(model="didbl", dtype=dtype, geometry="perf")
            inner = r._pipeline_for(r.plan_for(size, size))
        elif mode == "patch_ref":
            r = SuperResolver(model="didbl", dtype=dtype, geometry="ref")
            inner = r._pipeline_for(r.plan_for(size, size))
        else:
            continue
        fn = checksum_map(lambda p, im: inner(p, im))
        dt = timed(fn, r.params)
        print(json.dumps({"compile_plus_first_s": round(time.time() - t0, 1),
                          "mode": mode}), flush=True)
        emit(mode, dt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
