"""Training-step throughput: fused degrade+fwd+bwd+Adam on one chip.

Run:  python scripts/bench_train.py [batch] [lr_patch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax


def main():
    from image_enhance_keras_tpu.models import get_model, init_params
    from image_enhance_keras_tpu.train.trainer import TrainState, make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    lr_patch = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    model, _ = get_model("didbl")
    tx = optax.adam(1e-4, b1=0.9)
    params = init_params(model, jax.random.PRNGKey(0), input_hw=(lr_patch, lr_patch))
    state = TrainState(params, tx.init(params), 0)
    step = jax.jit(make_train_step(model, tx, 4, 0.5))

    rng = np.random.default_rng(0)
    hr = jnp.asarray(
        rng.integers(0, 256, (batch, lr_patch * 4, lr_patch * 4, 3), dtype=np.uint8)
    )
    state, m = step(state, hr)
    print("compile done, loss", float(m["loss"]), flush=True)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, hr)
    _ = float(m["loss"])  # force
    dt = (time.perf_counter() - t0) / iters
    px = batch * (lr_patch * 4) ** 2
    print(
        f"train step: {dt*1e3:.1f} ms -> {1/dt:.1f} steps/s, "
        f"{px/dt/1e6:.2f} HR Mpix/s, batch {batch} x {lr_patch*4}^2",
        flush=True,
    )


if __name__ == "__main__":
    main()
