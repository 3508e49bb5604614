from image_enhance_keras_tpu.ops.pallas.blocks import (  # noqa: F401
    fused_light_block,
    fused_light53_block,
)
