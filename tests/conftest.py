"""Test config: force CPU backend with 8 virtual devices (fake TPU mesh).

Must run before jax initialises its backend; pytest imports conftest first.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and the plugin wins
# over shell overrides; jax.config is the reliable switch.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Repo root on sys.path so `image_enhance_keras_tpu` imports without install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
