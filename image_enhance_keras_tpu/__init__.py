"""image_enhance_keras_tpu — a TPU-native (JAX/XLA/Pallas/pjit) super-resolution framework.

A ground-up rebuild of the capabilities of the reference Keras/TF1 stack
(diacaf/image-enhance-keras): x4 single-image super-resolution with a residual
conv-tower generator, overlapped tile extract -> predict -> crop-stitch
inference for arbitrary-size images, a patch-based training pipeline, and a
Y-channel PSNR/SSIM (NTIRE-2017 protocol) evaluation harness.

Everything here is designed TPU-first:
  * the compute path is jitted end-to-end (decode -> HBM -> encode, no host
    round-trips inside an image);
  * tiling/stitching are static-shape XLA gathers, not host Python loops
    (reference: img_utils.py:601-724);
  * in-network resizes are dense MXU matmuls with TF1 `resize_bilinear`
    semantics (reference: models.py:1392-1399);
  * parallelism is a `jax.sharding.Mesh` + `shard_map` with ICI collectives,
    not per-process device pinning (reference: main_dirpath.py:3).
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml

from image_enhance_keras_tpu import ops  # noqa: F401

_LAZY = {
    "SuperResolver": ("image_enhance_keras_tpu.engine", "SuperResolver"),
    "ShardedResolver": ("image_enhance_keras_tpu.parallel", "ShardedResolver"),
    "Trainer": ("image_enhance_keras_tpu.train.trainer", "Trainer"),
    "Config": ("image_enhance_keras_tpu.utils.config", "Config"),
    "compat": ("image_enhance_keras_tpu.compat", None),
}


def __getattr__(name):
    """Lazy top-level exports: `from image_enhance_keras_tpu import
    SuperResolver` without importing the engine (and its jit warmup
    machinery) for users who only need ops/metrics."""
    entry = _LAZY.get(name)
    if entry is None:
        raise AttributeError(name)
    import importlib

    mod = importlib.import_module(entry[0])
    return getattr(mod, entry[1]) if entry[1] else mod
