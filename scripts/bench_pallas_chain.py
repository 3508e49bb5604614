"""Compare XLA vs per-block Pallas vs weight-streaming chain on the
pre-upsample tower (16x light53 + 6x light) at 64x64 tiles, bf16, on TPU.

Run:  python scripts/bench_pallas_chain.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from image_enhance_keras_tpu.models import get_model, init_params
    from image_enhance_keras_tpu.models.didbl_pallas import apply_didbl_pallas

    model, _ = get_model("didbl", dtype=jnp.bfloat16)
    params = jax.device_put(init_params(model, jax.random.PRNGKey(0), input_hw=(64, 64)))
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.random((32, 64, 64, 3)).astype(np.float32)))

    variants = {
        "xla": jax.jit(lambda p, x: model.apply({"params": p}, x)),
        "pallas_blocks": jax.jit(
            lambda p, x: apply_didbl_pallas(p, x, dtype=jnp.bfloat16, interpret=False)
        ),
        "pallas_chain": jax.jit(
            lambda p, x: apply_didbl_pallas(
                p, x, dtype=jnp.bfloat16, interpret=False, chain=True
            )
        ),
    }
    # full didbl at 64^2 tiles: FLOPs per tile batch
    c = 128
    flops = 32 * (
        (16 + 2 * 16) * 2 * 68 * c * c * 64 * 64  # 16 body + 2 tail (16x px)
        + 6 * 2 * 18 * c * c * 64 * 64
    )
    ref = None
    for name, f in variants.items():
        try:
            y = f(params, x)
            v = float(jnp.sum(y))
            t0 = time.perf_counter()
            for _ in range(5):
                y = f(params, x)
            v = float(jnp.sum(y))
            dt = (time.perf_counter() - t0) / 5
            print(f"{name}: {dt*1e3:.2f} ms -> {flops/dt/1e12:.1f} TFLOP/s (csum {v:.1f})", flush=True)
            if ref is None:
                ref = np.asarray(f(params, x), np.float32)
            else:
                d = float(np.max(np.abs(np.asarray(f(params, x), np.float32) - ref)))
                print(f"  max diff vs xla: {d:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
