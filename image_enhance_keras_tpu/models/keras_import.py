"""Keras HDF5 checkpoint importer: `weights025-17-0.93.h5`-style files -> flax
param pytrees.

The reference loads hard-coded weights-only HDF5 checkpoints
(models.py:1217-1218, 1068-1072, 1323-1325).  Keras 2.x HDF5 layout:

    f['model_weights'].attrs['layer_names'] -> ordered layer names
    f['model_weights'][layer].attrs['weight_names'] -> e.g.
        'conv2d_1/kernel:0', 'conv2d_1/bias:0'

Conv kernels are HWIO — identical to flax ``nn.Conv`` — so import is a pure
rename.  Layer order is deterministic from the graph build order; the
per-model orderings below mirror the creation sequences in
models.py:1159-1222 (didbl), 992-1142 (difv4), 1274-1357 (difvdsr).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from image_enhance_keras_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["keras_conv_order", "load_keras_h5", "import_keras_weights"]


def keras_conv_order(model_name: str) -> list[tuple[str, ...]]:
    """Flax param paths of every conv layer, in Keras creation order."""
    if model_name in ("didbl", "didbl_subpixel"):
        order: list[tuple[str, ...]] = [("level1",)]
        for i in range(16):
            order += [
                (f"body53_{i}", "conv_a1"),
                (f"body53_{i}", "conv_a2"),
                (f"body53_{i}", "conv_b1"),
                (f"body53_{i}", "conv_b2"),
            ]
        for i in range(6):
            order += [(f"light_{i}", "conv_a"), (f"light_{i}", "conv_b")]
        if model_name == "didbl_subpixel":
            order += [("subpixel_conv",)]
        for i in range(2):
            order += [
                (f"tail53_{i}", "conv_a1"),
                (f"tail53_{i}", "conv_a2"),
                (f"tail53_{i}", "conv_b1"),
                (f"tail53_{i}", "conv_b2"),
            ]
        order += [("out",)]
        return order
    if model_name == "difv4":
        order = [("level1",)]
        for i in range(6):
            order += [(f"head_{i}", "conv_a"), (f"head_{i}", "conv_b")]
        for i in range(20):
            order += [(f"mid_{i}", "conv_a"), (f"mid_{i}", "conv_b")]
        for i in range(6):
            order += [(f"tail_{i}", "conv_a"), (f"tail_{i}", "conv_b")]
        order += [("out",)]
        return order
    if model_name == "difvdsr":
        order = [("level1",)]
        for i in range(32):
            order += [
                (f"diff_{i}", "conv_a"),
                (f"diff_{i}", "conv_b"),
                (f"diff_{i}", "conv_c"),
                (f"diff_{i}", "conv_d"),
            ]
        order += [("out",)]
        return order
    raise KeyError(f"no keras layer order known for model {model_name!r}")


def load_keras_h5(path: str) -> list[tuple[str, np.ndarray, np.ndarray]]:
    """Read (layer_name, kernel, bias) triples for every conv layer, in the
    file's stored layer order."""
    import h5py

    import re as _re

    def _natural(name: str):
        # conv2d_10 must sort after conv2d_2: split digit runs numerically
        return [int(t) if t.isdigit() else t for t in _re.split(r"(\d+)", name)]

    out = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        if "layer_names" in root.attrs:
            layer_names = [
                n.decode() if isinstance(n, bytes) else n
                for n in root.attrs["layer_names"]
            ]
        else:
            # h5py key order is ALPHABETICAL (conv2d_1, conv2d_10,
            # conv2d_11, ..., conv2d_2) — positional import over that order
            # would silently permute same-shaped conv layers.  Natural-sort
            # and say so; only Keras-written files carry the attr.
            layer_names = sorted(root.keys(), key=_natural)
            log.warning(
                "%s has no 'layer_names' attribute (not written by Keras?); "
                "using natural-sorted group order — verify the import "
                "against recorded activations", path,
            )
        for name in layer_names:
            g = root[name]
            weight_names = [
                n.decode() if isinstance(n, bytes) else n
                for n in g.attrs.get("weight_names", [])
            ]
            if not weight_names:
                continue
            kernel = bias = None
            for wn in weight_names:
                arr = np.asarray(g[wn])
                if "kernel" in wn:
                    kernel = arr
                elif "bias" in wn:
                    bias = arr
            if kernel is not None and kernel.ndim == 4:
                out.append((name, kernel, bias))
    return out


def import_keras_weights(path: str, model_name: str, params: Any) -> Any:
    """Return a copy of ``params`` with conv kernels/biases replaced from a
    Keras HDF5 file, matched positionally against :func:`keras_conv_order`.

    Raises on count or shape mismatch — a wrong-architecture checkpoint must
    fail loudly, like Keras ``load_weights`` does.
    """
    import jax

    convs = load_keras_h5(path)
    order = keras_conv_order(model_name)
    if len(convs) != len(order):
        raise ValueError(
            f"{path}: has {len(convs)} conv layers, model {model_name!r} "
            f"expects {len(order)}"
        )

    flat = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy via rebuild

    def set_in(tree, keys, leaf_kernel, leaf_bias):
        node = tree
        for k in keys:
            node = node[k]
        want_k = node["kernel"].shape
        if tuple(leaf_kernel.shape) != tuple(want_k):
            raise ValueError(
                f"kernel shape mismatch at {'/'.join(keys)}: "
                f"file {leaf_kernel.shape} vs model {want_k}"
            )
        node["kernel"] = jax.numpy.asarray(leaf_kernel, dtype=jax.numpy.float32)
        if leaf_bias is not None:
            node["bias"] = jax.numpy.asarray(leaf_bias, dtype=jax.numpy.float32)

    # params trees from flax are nested dicts (possibly FrozenDict in older
    # versions); normalise to plain dicts.
    def to_plain(d):
        if hasattr(d, "items"):
            return {k: to_plain(v) for k, v in d.items()}
        return d

    flat = to_plain(flat)
    for (name, kernel, bias), keys in zip(convs, order):
        set_in(flat, keys, kernel, bias)
    return flat
