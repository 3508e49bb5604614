"""Model registry — the CLI-facing model zoo.

Mirrors the reference's dispatch (main_dirpath.py:39-47) but with all three
families reachable (the reference asserts only ``didbl`` can run,
main_dirpath.py:27; ``difv4``/``difvdsr`` are dead branches there).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

from image_enhance_keras_tpu.models.didbl import DifvdsrDouble
from image_enhance_keras_tpu.models.difv4 import Difvdsr4
from image_enhance_keras_tpu.models.difvdsr import Difvdsr

__all__ = ["ModelSpec", "MODEL_REGISTRY", "get_model", "init_params"]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static description of a zoo entry."""

    name: str
    make: Callable[..., nn.Module]
    net_scale: int  # output/input spatial ratio of the network itself
    pre_upscaled_input: bool  # difvdsr operates on an already-upscaled image
    description: str
    # The REFERENCE's checkpoint home for this family (SURVEY.md section
    # 2.10 mapping, e.g. weights_Double <- models.py:1217).  Documentation
    # only — not a promise of a loadable local checkpoint; pass explicit
    # `weights=` (e.g. weights_Double/didbl_set5demo.npz) to load one.
    #: repo-relative demo checkpoint (.npz) or None when no
    #: committed artifact exists for the family
    default_weights: str | None
    # AE-style models whose eval path coerces images to /4-divisible sizes
    # and runs the divisible-shape driver (reference models.py:105,159-163);
    # False for every shipped reference model (it's capability surface).
    requires_divisible_shape: bool = False


def resolve_default_weights(spec: "ModelSpec") -> str | None:
    """Absolute path of the family's committed demo checkpoint, or None.

    ``default_weights`` is repo-relative; resolve against the CWD first
    (a repo-root invocation) and then against the checkout that owns this
    package, so the CLI default works from any working directory."""
    from image_enhance_keras_tpu.utils.paths import find_repo_asset

    return find_repo_asset(spec.default_weights)


def _make_didbl(dtype: Any = None, **kw) -> nn.Module:
    return DifvdsrDouble(dtype=dtype, **kw)


def _make_didbl_subpixel(dtype: Any = None, **kw) -> nn.Module:
    return DifvdsrDouble(upsampler="subpixel", dtype=dtype, **kw)


def _make_difv4(dtype: Any = None, **kw) -> nn.Module:
    return Difvdsr4(dtype=dtype, **kw)


def _make_difvdsr(dtype: Any = None, **kw) -> nn.Module:
    return Difvdsr(dtype=dtype, **kw)


MODEL_REGISTRY: dict[str, ModelSpec] = {
    "didbl": ModelSpec(
        "didbl",
        _make_didbl,
        net_scale=4,
        pre_upscaled_input=False,
        description="DifvdsrDouble x4 (reference models.py:1146-1270)",
        default_weights="weights_Double/didbl_set5demo.npz",
    ),
    "didbl_subpixel": ModelSpec(
        "didbl_subpixel",
        _make_didbl_subpixel,
        net_scale=4,
        pre_upscaled_input=False,
        description="didbl with depth_to_space head (advanced.py/keras_subpixel.py)",
        default_weights="weights_demo_didbl_subpixel/didbl_subpixel_set5demo.npz",
    ),
    "difv4": ModelSpec(
        "difv4",
        _make_difv4,
        net_scale=4,
        pre_upscaled_input=False,
        description="Difvdsr4 progressive 2x+2x (reference models.py:992-1142)",
        default_weights="weights_demo_difv4/difv4_set5demo.npz",
    ),
    "difv4_x2": ModelSpec(
        "difv4_x2",
        lambda dtype=None, **kw: Difvdsr4(dtype=dtype, scale=2, **kw),
        net_scale=2,
        pre_upscaled_input=False,
        description=(
            "Difvdsr4 single-2x variant (the reference's x2 dev-note configs, "
            "models.py:1061-1069)"
        ),
        default_weights=None,
    ),
    "difvdsr": ModelSpec(
        "difvdsr",
        _make_difvdsr,
        net_scale=1,
        pre_upscaled_input=True,
        description="Difvdsr refiner on pre-upscaled input (reference models.py:1274-1357)",
        default_weights="weights_demo_difvdsr/difvdsr_set5demo.npz",
    ),
}


def get_model(name: str, dtype: Any = None, **kw) -> tuple[nn.Module, ModelSpec]:
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    spec = MODEL_REGISTRY[name]
    return spec.make(dtype=dtype, **kw), spec


def init_params(model: nn.Module, rng=None, input_hw: tuple[int, int] = (32, 32)):
    """Initialise a param pytree on a dummy tile (static-shape trace)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    return model.init(rng, dummy)["params"]
