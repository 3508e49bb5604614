"""Multi-host (multi-process) bootstrap.

Single-host slices (v5e-8) need nothing: `jax.devices()` sees every chip and
the 1-D data mesh covers them.  For multi-host pods, call
:func:`maybe_init_distributed` once at process start — it initialises
`jax.distributed` from the standard env vars when they are present and is a
no-op otherwise, so the same entry points work on laptops, single hosts and
pods.  Collectives then ride ICI within a slice and DCN across hosts,
orchestrated by XLA from the same sharding annotations (no code change in
the train step).
"""

from __future__ import annotations

import os

from image_enhance_keras_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["maybe_init_distributed"]

_ENV_KEYS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")


def maybe_init_distributed() -> bool:
    """Initialise jax.distributed iff coordinator env vars are set.

    Env contract (standard JAX multi-process):
      JAX_COORDINATOR_ADDRESS (or COORDINATOR_ADDRESS)  host:port
      JAX_NUM_PROCESSES / JAX_PROCESS_ID                optional overrides
    Returns True when initialisation ran.
    """
    addr = next((os.environ[k] for k in _ENV_KEYS if k in os.environ), None)
    if addr is None:
        return False
    import jax

    kwargs = {"coordinator_address": addr}
    if "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    log.info(
        "jax.distributed initialised: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
