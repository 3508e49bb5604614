"""Process-level JAX runtime setup: persistent compilation cache.

First compiles of the full tower take minutes (notably through remote-compile
relays); the persistent cache makes every later process start warm.  Called
once from the engine/trainer constructors; no-ops if unavailable.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    try:
        cache_dir = cache_dir or os.environ.get(
            "IEK_JAX_CACHE", os.path.expanduser("~/.cache/iek_tpu_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
