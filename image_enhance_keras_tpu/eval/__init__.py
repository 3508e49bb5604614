from image_enhance_keras_tpu.eval.scorer import (  # noqa: F401
    score_pair,
    score_directory,
    PairScore,
)
from image_enhance_keras_tpu.eval.evaluate import (  # noqa: F401
    degrade,
    evaluate_resolver_on_dir,
    evaluate_resolver_on_dir_divisible,
    evaluate_model,
)
