"""Device mesh construction.

The reference's entire device story is ``CUDA_VISIBLE_DEVICES`` pinning
(main_dirpath.py:3).  TPU-native replacement: a 1-D ``jax.sharding.Mesh``
over the slice with a ``data`` axis; XLA collectives over ICI do the rest.
A ``tensor`` axis can be added for channel-sharded convs, but this ~22M-param
conv family fits one chip's HBM trivially (SURVEY.md 2.9) — DP is the real
scaling axis.

Multi-host pods add a second interconnect tier: ICI within a slice, DCN
(datacenter network, ~100x lower bandwidth) across hosts.  Two helpers make
the data axis DCN-aware:

  * :func:`make_dcn_mesh` — still a 1-D ``data`` mesh, but device order is
    HOST-MAJOR (every host's devices contiguous).  XLA's hierarchical
    collective lowering then reduces within each host over ICI first and
    crosses DCN once per host, instead of ring-reducing the full gradient
    across DCN hops.
  * :func:`make_hybrid_mesh` — an explicit 2-D ``(dcn, data)`` mesh (outer
    axis = hosts over DCN, inner = local devices over ICI) for shardings
    that want the tiers visible, e.g. ``P(("dcn", "data"))`` batch sharding
    with per-tier reduction control.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "make_dcn_mesh", "make_hybrid_mesh", "device_count"]


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else int(n_devices)
    if n <= 0 or n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def host_major_order(devices) -> list:
    """Sort devices host-major (process_index, then device id): every host's
    devices are contiguous along the 1-D data axis, so grad all-reduce
    segments ride ICI within hosts and cross DCN once per host boundary."""
    return sorted(devices, key=lambda d: (d.process_index, d.id))


def make_dcn_mesh(axis: str = "data") -> Mesh:
    """1-D data mesh over ALL devices in host-major (DCN-aware) order.

    Single-process: identical to :func:`make_mesh` (ordering is a no-op).
    """
    return Mesh(np.array(host_major_order(jax.devices())), (axis,))


def make_hybrid_mesh(axis: str = "data", dcn_axis: str = "dcn") -> Mesh:
    """2-D ``(dcn, data)`` mesh: rows = hosts (DCN tier), cols = each host's
    local devices (ICI tier).  Requires every host to contribute the same
    device count (true on homogeneous pods).  Single-process: a (1, n) mesh.
    """
    devs = host_major_order(jax.devices())
    n_proc = len({d.process_index for d in devs})
    local = len(devs) // n_proc
    # per-host counts must ALL be equal — a divisible total with uneven
    # hosts (e.g. 3+1 over 2 procs) would silently put one host's device in
    # another host's row, sending ICI-intended collectives over DCN
    from collections import Counter

    per_host = Counter(d.process_index for d in devs)
    if n_proc * local != len(devs) or len(set(per_host.values())) != 1:
        raise ValueError(
            f"hosts contribute unequal device counts ({dict(per_host)}) — "
            "hybrid mesh needs a homogeneous pod"
        )
    return Mesh(np.array(devs).reshape(n_proc, local), (dcn_axis, axis))
