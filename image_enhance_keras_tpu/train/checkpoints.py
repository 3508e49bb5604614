"""Checkpointing: orbax-backed params + optimizer state + step.

Supersedes the reference's weights-only HDF5 `ModelCheckpoint`
(models.py:141-142): we persist the full train state (params, opt state, step,
val metric) so resume continues optimisation instead of restarting it, and we
keep the best-by-val-metric selection behaviour (`monitor=..., mode='max'`)
plus the epoch/metric-encoded directory naming (models.py:1155).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_params", "restore_params", "CheckpointManager"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    """Persist any pytree (incl. custom nodes like TrainState / optax states)
    by flattening to an ordered leaf list — restore rebuilds with the caller's
    template treedef, so no custom-node registration is needed at load time."""
    leaves = jax.tree_util.tree_leaves(params)
    payload = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    _checkpointer().save(os.path.abspath(path), payload, force=True)


def restore_params(path: str, like: Any = None) -> Any:
    payload = _checkpointer().restore(os.path.abspath(path))
    leaves = [payload[k] for k in sorted(payload)]
    if like is None:
        return leaves
    treedef = jax.tree_util.tree_structure(like)
    want = jax.tree_util.tree_leaves(like)
    if len(want) != len(leaves):
        raise ValueError(
            f"{path}: checkpoint has {len(leaves)} leaves, template has {len(want)}"
        )
    leaves = [np.asarray(r, dtype=np.asarray(t).dtype) for t, r in zip(want, leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_params_npz(path: str, params: Any, dtype: Any = None) -> None:
    """Distribution format: a single .npz of named param arrays (no opt
    state) — small, dependency-light, loadable anywhere.

    ``dtype`` (e.g. np.float16) casts the stored arrays: the committed demo
    artifacts ship fp16 at half the repo weight — measured quality-neutral
    (EVAL.md: the fp16 subpixel demo reproduces its row to 4 digits).
    load_params_npz restores to the consumer tree's dtype."""
    flat = {}

    def walk(node, prefix):
        if hasattr(node, "items"):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            a = np.asarray(node)
            flat[prefix] = a.astype(dtype) if dtype is not None else a

    walk(params, "")
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, like: Any = None) -> Any:
    data = np.load(path)
    if like is None:
        # rebuild nested dict from slash-joined names
        out: dict = {}
        for name in data.files:
            node = out
            parts = name.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[name]
        return out
    import jax

    def fill(node, prefix):
        if hasattr(node, "items"):
            return {k: fill(v, f"{prefix}/{k}" if prefix else k) for k, v in node.items()}
        return np.asarray(data[prefix], dtype=np.asarray(node).dtype)

    return fill(like, "")


class CheckpointManager:
    """Best-k + latest checkpoints with an index file.

    Directory layout:
      <root>/latest/          — most recent full train state
      <root>/best/            — best val-metric full train state
      <root>/index.json       — step/epoch/metric bookkeeping
    """

    def __init__(self, root: str, monitor: str = "val_psnr", mode: str = "max"):
        self.root = root
        self.monitor = monitor
        self.mode = mode
        os.makedirs(root, exist_ok=True)
        self._index_path = os.path.join(root, "index.json")
        self.index = {"best_metric": None, "best_epoch": None, "epochs": []}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self.index = json.load(f)

    def _better(self, a: float, b: float | None) -> bool:
        if b is None:
            return True
        return a > b if self.mode == "max" else a < b

    def save_epoch(self, state: Any, epoch: int, metrics: dict[str, float]) -> bool:
        """Save `latest`; promote to `best` when the monitored metric improves.
        Returns True when this epoch became the new best."""
        val = float(metrics.get(self.monitor, float("nan")))
        save_params(os.path.join(self.root, "latest"), state)
        self.index["epochs"].append({"epoch": epoch, **metrics})
        # NaN is never "best": _better(nan, None) is True but reporting it
        # would export NaN weights as best_ema.npz while skipping best/
        is_best = val == val and self._better(val, self.index.get("best_metric"))
        if is_best:
            save_params(os.path.join(self.root, "best"), state)
            self.index["best_metric"] = val
            self.index["best_epoch"] = epoch
        with open(self._index_path, "w") as f:
            json.dump(self.index, f, indent=2)
        return is_best

    def restore_latest(self, like: Any = None) -> Any | None:
        p = os.path.join(self.root, "latest")
        if not os.path.exists(p):
            return None
        return restore_params(p, like)

    def restore_best(self, like: Any = None) -> Any | None:
        p = os.path.join(self.root, "best")
        if not os.path.exists(p):
            return None
        return restore_params(p, like)
