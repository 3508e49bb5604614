"""Model zoo: the three reference generator families, rebuilt as flax modules.

Registry names match the reference CLI contract (main_dirpath.py:8,27):
  * ``didbl``   — DifvdsrDouble, the flagship x4 generator (models.py:1146).
  * ``difv4``   — Difvdsr4, progressive 2x+2x generator (models.py:992).
  * ``difvdsr`` — Difvdsr, diff-VDSR refiner on pre-upscaled input (models.py:1274).
  * ``didbl_subpixel`` — capability-surface variant with a depth_to_space
    (subpixel) head instead of in-graph bilinear (advanced.py/keras_subpixel.py).
"""

from image_enhance_keras_tpu.models.blocks import (  # noqa: F401
    LightBlock,
    Light53Block,
    DiffBlock,
)
from image_enhance_keras_tpu.models.zoo import (  # noqa: F401
    MODEL_REGISTRY,
    ModelSpec,
    get_model,
    init_params,
)
from image_enhance_keras_tpu.models.didbl import DifvdsrDouble  # noqa: F401
from image_enhance_keras_tpu.models.difv4 import Difvdsr4  # noqa: F401
from image_enhance_keras_tpu.models.difvdsr import Difvdsr  # noqa: F401
