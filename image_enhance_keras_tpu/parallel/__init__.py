from image_enhance_keras_tpu.parallel.mesh import make_mesh, device_count  # noqa: F401
from image_enhance_keras_tpu.parallel.distributed import maybe_init_distributed  # noqa: F401
from image_enhance_keras_tpu.parallel.data_parallel import (  # noqa: F401
    shard_train_step,
    shard_eval_step,
    shard_batch,
    ShardedResolver,
)
