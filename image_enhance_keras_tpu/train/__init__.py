from image_enhance_keras_tpu.train.checkpoints import (  # noqa: F401
    save_params,
    restore_params,
    CheckpointManager,
)
