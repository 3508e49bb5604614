"""Device mesh construction.

The reference's entire device story is ``CUDA_VISIBLE_DEVICES`` pinning
(main_dirpath.py:3).  TPU-native replacement: a 1-D ``jax.sharding.Mesh``
over the slice with a ``data`` axis; XLA collectives over ICI do the rest.
A ``tensor`` axis can be added for channel-sharded convs, but this ~22M-param
conv family fits one chip's HBM trivially (SURVEY.md 2.9) — DP is the real
scaling axis.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "device_count"]


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))
