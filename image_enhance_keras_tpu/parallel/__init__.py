from image_enhance_keras_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_dcn_mesh,
    make_hybrid_mesh,
    device_count,
)
from image_enhance_keras_tpu.parallel.distributed import maybe_init_distributed  # noqa: F401
from image_enhance_keras_tpu.parallel.data_parallel import (  # noqa: F401
    shard_train_step,
    shard_eval_step,
    shard_batch,
    ShardedResolver,
)
