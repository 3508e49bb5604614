"""Direct timing of the int8 didbl BODY: whole-frame vs per-segment spatial
tiling (didbl_pallas.apply_didbl_int8_xla_body_tiled) across tile/seg
parameters.  Chained iterations + scalar checksum fetch (relay-safe timing,
see bench.py header).

Run on the TPU:  python scripts/bench_body_tile.py
Env: IEK_BT_SIZE (512), IEK_BT_ITERS (3), IEK_BT_GRID ("off;128,2;128,8;
    170,2;170,8;256,2;256,8;256,22").
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

    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models import didbl_pallas as dp

    size = int(os.environ.get("IEK_BT_SIZE", "512"))
    iters = int(os.environ.get("IEK_BT_ITERS", "3"))
    grid = os.environ.get(
        "IEK_BT_GRID", "off;128,2;128,8;170,2;170,8;256,2;256,8;256,22"
    ).split(";")

    r = SuperResolver(model="didbl", dtype=jnp.bfloat16, forward="int8")
    qp = r._fwd_params()
    m = r.module

    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.random((1, size, size, 3)), jnp.float32)
    )

    def timed(body_fn):
        @jax.jit
        def step(qp, x, salt):
            h = body_fn(qp, x + (salt % 2).astype(x.dtype) * 1e-6)
            return jnp.sum(h[:, ::97, ::97, :].astype(jnp.float32))

        c = step(qp, x0, jnp.int32(1))
        float(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = step(qp, x0, c.astype(jnp.int32))
        float(c)
        return (time.perf_counter() - t0) / iters

    results = {}
    for spec in grid:
        try:
            if spec == "off":
                fn = lambda qp, x: dp.apply_didbl_int8_xla_body(
                    qp, x, n_body53=m.n_body53, n_light=m.n_light)
            else:
                tile, seg = (int(v) for v in spec.split(","))
                fn = lambda qp, x, tile=tile, seg=seg: (
                    dp.apply_didbl_int8_xla_body_tiled(
                        qp, x, n_body53=m.n_body53, n_light=m.n_light,
                        tile=tile, seg=seg))
            dt = timed(fn)
            results[spec] = round(dt * 1e3, 2)
            print(json.dumps({"spec": spec, "ms_per_frame": results[spec]}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"spec": spec, "error": str(e)[:200]}), flush=True)
    print(json.dumps({"size": size, "body_ms": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
