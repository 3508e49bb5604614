"""Mesh/sharded-inference tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_enhance_keras_tpu.parallel import make_mesh, shard_batch


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_layout():
    mesh = make_mesh(8)
    x = jnp.zeros((16, 4, 4, 3))
    xs = shard_batch(x, mesh)
    # each device holds 2 of 16 batch rows
    shard_shapes = {tuple(s.data.shape) for s in xs.addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}


def test_maybe_init_distributed_noop_without_env(monkeypatch):
    from image_enhance_keras_tpu.parallel import maybe_init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert maybe_init_distributed() is False


def test_sharded_resolver_matches_single_device():
    """ShardedResolver (tiles over 8 devices) == SuperResolver bit-for-bit."""
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.parallel import ShardedResolver
    from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
    from image_enhance_keras_tpu.models.zoo import ModelSpec
    from image_enhance_keras_tpu.models import init_params

    module = DifvdsrDouble(features=8, n_body53=1, n_light=1, n_tail53=0)
    spec = ModelSpec("tiny", lambda **k: module, 4, False, "tiny", "w")
    params = init_params(module, jax.random.PRNGKey(0), input_hw=(16, 16))

    def build(cls, **extra):
        r = cls.__new__(cls)
        r.model_name = "tiny"
        r.module = module
        r.spec = spec
        r.patch = 48
        r.step = 32
        r.crop = 8
        r.scalemulti = 4
        r.tile_chunk = 8
        r.mode = "patch"
        r.fast_max_pixels = 1 << 20
        r.forward_mode = "xla"
        r._dtype = None
        r._jitted = {}
        r._jitted_fast = {}
        r.params = params
        for k, v in extra.items():
            setattr(r, k, v)
        return r

    single = build(SuperResolver)
    mesh = make_mesh(8)
    sharded = build(ShardedResolver, mesh=mesh, n_devices=8)

    img = np.random.default_rng(0).integers(0, 256, (80, 100, 3), dtype=np.uint8)
    out_single = single.upscale(img)
    out_sharded = sharded.upscale(img)
    assert out_single.shape == out_sharded.shape == (320, 400, 3)
    np.testing.assert_array_equal(out_single, out_sharded)
