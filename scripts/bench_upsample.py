"""Direct GB/s timing of the x4 TF1-bilinear feature-map upsample: XLA
phase interleave (ops/resize.upsample_phase_tf1) vs the streaming Pallas
kernel (ops/pallas/upsample.py).  Chained iterations + scalar checksum
(relay-safe, see bench.py header).

Run on the TPU:  python scripts/bench_upsample.py
Env: IEK_UP_SIZE (512), IEK_UP_C (128), IEK_UP_ITERS (5),
     IEK_UP_BLOCK_ROWS ("1,2,4" — Pallas block sweep).

GB/s = (input + output bytes) / time; the r2 measured map put the XLA path
at 91 GB/s (~11.8 ms/frame at 512^2 x 128 bf16) vs a ~1.6 ms bandwidth
bound at ~819 GB/s HBM.
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

    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1
    from image_enhance_keras_tpu.ops.pallas.upsample import (
        upsample_phase_tf1_pallas,
    )

    size = int(os.environ.get("IEK_UP_SIZE", "512"))
    c = int(os.environ.get("IEK_UP_C", "128"))
    iters = int(os.environ.get("IEK_UP_ITERS", "5"))
    blocks = [int(b) for b in os.environ.get("IEK_UP_BLOCK_ROWS", "1,2,4").split(",")]

    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((1, size, size, c)), jnp.bfloat16)
    )
    nbytes = (size * size * c + 16 * size * size * c) * 2  # in + out, bf16

    def timed(up_fn):
        @jax.jit
        def step(x, salt):
            y = up_fn(x + (salt % 2).astype(x.dtype) * jnp.asarray(1e-3, x.dtype))
            return jnp.sum(y[:, ::97, ::97, :].astype(jnp.float32))

        s = step(x0, jnp.int32(1))
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = step(x0, s.astype(jnp.int32))
        float(s)
        return (time.perf_counter() - t0) / iters

    results = {}
    dt = timed(lambda x: upsample_phase_tf1(x, 4))
    results["xla"] = {"ms": round(dt * 1e3, 2), "gbs": round(nbytes / dt / 1e9, 1)}
    print(json.dumps({"xla": results["xla"]}), flush=True)
    for b in blocks:
        try:
            dt = timed(lambda x, b=b: upsample_phase_tf1_pallas(x, 4, block_rows=b))
            results[f"pallas_b{b}"] = {
                "ms": round(dt * 1e3, 2), "gbs": round(nbytes / dt / 1e9, 1)
            }
            print(json.dumps({f"pallas_b{b}": results[f"pallas_b{b}"]}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"pallas_b{b}": str(e)[:300]}), flush=True)
    print(json.dumps({"size": size, "c": c, "upsample": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
