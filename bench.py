"""End-to-end x4 inference benchmark on the flagship model (didbl).

Measures sustained end-to-end throughput of the tiled pipeline — uint8 image
in host memory -> pad/extract/normalise -> full 128-feature conv tower ->
stitch -> uint8 image back on host — in input megapixels/second on one chip.

Baseline (BASELINE.json): >100 Mpix/s/chip end-to-end x4 on TPU v5e.  The
reference publishes no throughput at all (per-image wall-clock prints only,
models.py:1612); the driver-set 100 Mpix/s is the bar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs:
  IEK_BENCH_DTYPE   bfloat16 (default) | float32
  IEK_BENCH_SIZE    input square size (default 512)
  IEK_BENCH_ITERS   timed iterations (default 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_enhance_keras_tpu.engine import SuperResolver

    dtype_name = os.environ.get("IEK_BENCH_DTYPE", "bfloat16")
    size = int(os.environ.get("IEK_BENCH_SIZE", "512"))
    iters = int(os.environ.get("IEK_BENCH_ITERS", "20"))
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None

    resolver = SuperResolver(model="didbl", dtype=dtype, tile_chunk=16)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)

    # warmup (compile + 2 steady-state runs)
    out = resolver.upscale(img)
    assert out.shape == (4 * size, 4 * size, 3)
    for _ in range(2):
        resolver.upscale(img)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = resolver.upscale(img)
    dt = time.perf_counter() - t0

    mpix_in = size * size * iters / dt / 1e6
    result = {
        "metric": f"didbl x4 end-to-end tiled inference, {size}x{size} uint8 in/out, {dtype_name}",
        "value": round(mpix_in, 2),
        "unit": "input Mpix/s/chip",
        "vs_baseline": round(mpix_in / 100.0, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
