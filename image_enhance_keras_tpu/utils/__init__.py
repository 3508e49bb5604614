from image_enhance_keras_tpu.utils.logging import get_logger  # noqa: F401
from image_enhance_keras_tpu.utils.config import Config  # noqa: F401
