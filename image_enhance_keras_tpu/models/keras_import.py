"""Keras HDF5 checkpoint importer: `weights025-17-0.93.h5`-style files -> flax
param pytrees.

The reference loads hard-coded weights-only HDF5 checkpoints
(models.py:1217-1218, 1068-1072, 1323-1325).  Keras 2.x HDF5 layout:

    f['model_weights'].attrs['layer_names'] -> ordered layer names
    f['model_weights'][layer].attrs['weight_names'] -> e.g.
        'conv2d_1/kernel:0', 'conv2d_1/bias:0'

Conv kernels are HWIO — identical to flax ``nn.Conv`` — so import is a pure
rename.  Layer ORDER is the subtle part: Keras ``save_weights`` stores
``layer_names`` in the model's TOPOLOGICAL order (``model.layers``), not
creation order.  For chain graphs the two coincide, but didbl's light53
block has two parallel branches (models.py:1248-1270): creation order is
a1(3x3), a2(5x5), b1(5x5), b2(3x3) while the stored topological order is
a1, b1, a2, b2 — both branch heads read the block input, so they sort at
equal depth BEFORE the branch tails.  The a2/b1 pair is shape-identical
(5x5), so a creation-order positional import reads Keras files with the
two 5x5 kernels silently swapped (measured against a real tf_keras-written
didbl: 23x the f32-noise output error — caught by the real-Keras gate,
tests/test_keras_import_real.py, r4).

Convention resolution: files WITH a ``layer_names`` attribute are
Keras-written -> topological order; files without (natural-sorted group
names, written by non-Keras tooling with sequential names) -> creation
order.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from image_enhance_keras_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["keras_conv_order", "load_keras_h5", "import_keras_weights"]


def keras_conv_order(
    model_name: str,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    n_head: int = 6,
    n_mid: int = 20,
    n_tail: int = 6,
    n_blocks: int = 32,
    convention: str = "topo",
) -> list[tuple[str, ...]]:
    """Flax param paths of every conv layer, in the h5 file's stored order.

    ``convention="topo"`` (Keras-written files: ``save_weights`` stores
    ``model.layers`` order) interleaves each light53 block's branches as
    a1, b1, a2, b2; ``convention="creation"`` (sequentially-named non-Keras
    files) keeps the graph-build order a1, a2, b1, b2.  Chain graphs
    (light blocks, difv4, difvdsr) are identical under both.  The block
    counts default to the production didbl graph (models.py:1182-1196);
    non-default counts serve reduced test fixtures (tests/golden/)."""
    if convention not in ("topo", "creation"):
        raise ValueError(f"unknown layer-order convention {convention!r}")

    def light53(scope: str) -> list[tuple[str, ...]]:
        if convention == "topo":
            return [
                (scope, "conv_a1"),
                (scope, "conv_b1"),
                (scope, "conv_a2"),
                (scope, "conv_b2"),
            ]
        return [
            (scope, "conv_a1"),
            (scope, "conv_a2"),
            (scope, "conv_b1"),
            (scope, "conv_b2"),
        ]

    if model_name in ("didbl", "didbl_subpixel"):
        order: list[tuple[str, ...]] = [("level1",)]
        for i in range(n_body53):
            order += light53(f"body53_{i}")
        for i in range(n_light):
            order += [(f"light_{i}", "conv_a"), (f"light_{i}", "conv_b")]
        if model_name == "didbl_subpixel":
            order += [("subpixel_conv",)]
        for i in range(n_tail53):
            order += light53(f"tail53_{i}")
        order += [("out",)]
        return order
    if model_name == "difv4":
        # pure chains (light blocks: conv -> act -> conv, each conv consumes
        # the previous conv's output, models.py:1118-1150) — creation order
        # IS topological order, so the convention does not matter here
        order = [("level1",)]
        for i in range(n_head):
            order += [(f"head_{i}", "conv_a"), (f"head_{i}", "conv_b")]
        for i in range(n_mid):
            order += [(f"mid_{i}", "conv_a"), (f"mid_{i}", "conv_b")]
        for i in range(n_tail):
            order += [(f"tail_{i}", "conv_a"), (f"tail_{i}", "conv_b")]
        order += [("out",)]
        return order
    if model_name == "difvdsr":
        # a,b,c,d form a dependency chain (c reads Subtract(b_out, block_in),
        # models.py:1336-1357) — creation == topological, convention-free
        order = [("level1",)]
        for i in range(n_blocks):
            order += [
                (f"diff_{i}", "conv_a"),
                (f"diff_{i}", "conv_b"),
                (f"diff_{i}", "conv_c"),
                (f"diff_{i}", "conv_d"),
            ]
        order += [("out",)]
        return order
    raise KeyError(f"no keras layer order known for model {model_name!r}")


def load_keras_h5(
    path: str, return_keras_written: bool = False
) -> list[tuple[str, np.ndarray, np.ndarray]]:
    """Read (layer_name, kernel, bias) triples for every conv layer, in the
    file's stored layer order.  With ``return_keras_written=True`` returns
    ``(triples, keras_written)`` where ``keras_written`` says a
    ``layer_names`` attribute was present (i.e. stored order is Keras's
    topological ``model.layers`` order, not creation order)."""
    import h5py

    import re as _re

    def _natural(name: str):
        # conv2d_10 must sort after conv2d_2: split digit runs numerically
        return [int(t) if t.isdigit() else t for t in _re.split(r"(\d+)", name)]

    out = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        keras_written = "layer_names" in root.attrs
        if keras_written:
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
    if return_keras_written:
        return out, keras_written
    return out


def import_keras_weights(path: str, model_name: str, params: Any, **counts) -> Any:
    """Return a copy of ``params`` with conv kernels/biases replaced from a
    Keras HDF5 file, matched positionally against :func:`keras_conv_order`
    (``counts`` forwards non-default block counts for reduced fixtures, and
    may force ``convention=...``; by default it is resolved from the file —
    topological for Keras-written files, creation for the natural-sorted
    fallback).

    Raises on count or shape mismatch — a wrong-architecture checkpoint must
    fail loudly, like Keras ``load_weights`` does.
    """
    import jax

    convs, keras_written = load_keras_h5(path, return_keras_written=True)
    if "convention" not in counts:
        counts = dict(counts, convention="topo" if keras_written else "creation")
    log.info(
        "importing %s with the %s layer-order convention (%s)",
        path, counts["convention"],
        "Keras-written layer_names" if keras_written else "natural-sorted groups",
    )
    order = keras_conv_order(model_name, **counts)
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
