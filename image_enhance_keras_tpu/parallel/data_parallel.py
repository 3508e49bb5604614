"""Data parallelism over the mesh — training and tiled inference.

Net-new vs the reference (which has no distributed layer at all, SURVEY.md
2.9).  Strategy: annotate shardings and let XLA's SPMD partitioner insert the
collectives over ICI:

  * training — batch sharded on the ``data`` axis, params/opt-state
    replicated; the mean loss forces a cross-device grad all-reduce (psum)
    which XLA emits automatically from the sharding contract;
  * tiled inference — the tile batch is sharded across chips
    (`with_sharding_constraint`), each chip runs the conv tower on its tile
    shard, and the stitch gather pulls the full batch back (all_gather over
    ICI).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_enhance_keras_tpu.engine import SuperResolver
from image_enhance_keras_tpu.tiling import (
    pad_to_plan,
    extract_tiles,
    stitch_tiles,
    crop_output,
)

__all__ = ["shard_train_step", "shard_eval_step", "shard_batch", "ShardedResolver"]


def _axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]


def shard_batch(batch: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a host batch sharded along axis 0 of the mesh's data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P(_axis(mesh))))


def shard_train_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """jit the train step with replicated state and data-sharded batch.

    The step's mean-reduction over the global batch makes XLA insert the
    gradient all-reduce over ICI; the returned state is replicated, so every
    chip applies the identical Adam update (no parameter divergence).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(_axis(mesh)))
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=(repl, repl))


def shard_eval_step(eval_fn: Callable, mesh: Mesh) -> Callable:
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(_axis(mesh)))
    return jax.jit(eval_fn, in_shardings=(repl, data), out_shardings=repl)


class ShardedResolver(SuperResolver):
    """Tiled inference with the tile batch sharded across the mesh.

    The reference processes tiles batch-1 on one GPU (models.py:342); here a
    whole image's tile batch spreads over the slice, so directory inference
    scales with chip count while keeping the exact stitch semantics.
    """

    def __init__(self, *args, mesh: Mesh | None = None, n_devices: int | None = None, **kw):
        if mesh is None:
            from image_enhance_keras_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_devices)
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        super().__init__(*args, **kw)
        self.params = jax.device_put(self.params, NamedSharding(mesh, P()))

    def _pipeline_for(self, plan):
        fn = self._jitted.get(plan)
        if fn is not None:
            return fn

        module = self.module
        mesh = self.mesh
        axis = _axis(mesh)
        nd = self.n_devices
        n = plan.n_tiles
        # per-device chunking bounds peak activation HBM; global chunk is a
        # multiple of the device count so each shard is equal.
        chunk = max(1, self.tile_chunk // nd) * nd
        n_pad = (n + chunk - 1) // chunk * chunk

        tile_sharding = NamedSharding(mesh, P(None, axis))

        def run(params, img_u8):
            img = img_u8.astype(jnp.float32)
            padded = pad_to_plan(img, plan)
            tiles = extract_tiles(padded, plan) / 255.0
            if n_pad != n:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((n_pad - n,) + tiles.shape[1:], tiles.dtype)]
                )
            batches = tiles.reshape(n_pad // chunk, chunk, *tiles.shape[1:])
            batches = jax.lax.with_sharding_constraint(batches, tile_sharding)

            def apply_chunk(b):
                b = jax.lax.with_sharding_constraint(
                    b, NamedSharding(mesh, P(axis))
                )
                return module.apply({"params": params}, b)

            out = jax.lax.map(apply_chunk, batches)
            out = out.reshape(n_pad, *out.shape[2:])[:n] * 255.0
            canvas = stitch_tiles(out, plan)
            result = crop_output(canvas, plan)
            return jnp.clip(jnp.round(result), 0.0, 255.0).astype(jnp.uint8)

        repl = NamedSharding(mesh, P())
        fn = jax.jit(run, in_shardings=(repl, repl), out_shardings=repl)
        self._jitted[plan] = fn
        return fn
