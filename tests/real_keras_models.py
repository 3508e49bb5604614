"""Build the reference's model graphs in REAL Keras 2 (``tf_keras``).

This is the truth side of the import parity gate: an actual Keras 2.x
functional model with the exact reference wiring (models.py:1159-1222 —
1x1x128 relu 'level1' -> n_body53 x light53 -> n_light x light ->
Lambda(TF1 resize_bilinear x4) -> n_tail53 x light53 -> 3x3x3 relu),
whose ``save_weights`` output is a GENUINELY Keras-written HDF5 in the
same root layout as the reference checkpoint
(``weights_Double/weights025-17-0.93.h5``, written by Keras
ModelCheckpoint(save_weights_only=True), models.py:141-142), and whose
``predict`` is TF's own forward — fully independent of this repo's
JAX/flax implementation.

Block wiring mirrors models.py:1231-1270 behaviorally (freshly written
against SURVEY.md section 2.2; scalar-mul Lambdas for the 0.9/0.1
residual scales, two parallel conv3-relu-conv5 / conv5-relu-conv3
branches summed).  The x4 upsample Lambda calls
``tf.compat.v1.image.resize_bilinear`` — the very TF1 kernel the
reference's resizeX4bil wraps (models.py:1392-1399).

Requires ``tf_keras`` (Keras 2.21 on TF 2.x, CPU); import lazily.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "build_real_keras_didbl",
    "build_real_keras_difv4",
    "build_real_keras_difvdsr",
    "seeded_weights",
]


# Lambda payloads live at module level so Keras can serialize the layers
# by qualified name (closure cells capturing the tf module break the
# legacy saver's deepcopy).
def _scale09(t):
    import tensorflow as tf

    return tf.scalar_mul(0.9, t)


def _scale01(t):
    import tensorflow as tf

    return tf.scalar_mul(0.1, t)


def _up4(t):
    import tensorflow as tf

    h, w = t.shape[1], t.shape[2]
    return tf.compat.v1.image.resize_bilinear(t, (4 * int(h), 4 * int(w)))


def build_real_keras_didbl(
    height: int,
    width: int,
    features: int = 128,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
):
    """The reference didbl graph as a real Keras 2 functional model."""
    from tf_keras import backend as K
    from tf_keras.layers import Activation, Add, Conv2D, Input, Lambda
    from tf_keras.models import Model

    # Keras's auto-name counters (conv2d_N, lambda_N, ...) are GLOBAL per
    # session; reset so layer names are deterministic regardless of what
    # was built before (the reference builds one model per process, so its
    # checkpoint names always start from the bare names).
    K.clear_session()

    def light53(x):
        # reference creation order (models.py:1248-1270): identity 0.9
        # Lambda first, then conv3-relu-conv5, conv5-relu-conv3, Add,
        # 0.1 Lambda, Add.
        ini = Lambda(_scale09)(x)
        a = Conv2D(features, (3, 3), padding="same")(x)
        a = Activation("relu")(a)
        a = Conv2D(features, (5, 5), padding="same")(a)
        b = Conv2D(features, (5, 5), padding="same")(x)
        b = Activation("relu")(b)
        b = Conv2D(features, (3, 3), padding="same")(b)
        s = Add()([a, b])
        s = Lambda(_scale01)(s)
        return Add()([s, ini])

    def light(x):
        # models.py:1231-1245: conv3-relu-conv3, 0.1 Lambda, Add identity.
        h = Conv2D(features, (3, 3), padding="same")(x)
        h = Activation("relu")(h)
        h = Conv2D(features, (3, 3), padding="same")(h)
        h = Lambda(_scale01)(h)
        return Add()([h, x])

    init = Input(shape=(height, width, 3))
    x = Conv2D(features, (1, 1), activation="relu", padding="same",
               name="level1")(init)
    for _ in range(n_body53):
        x = light53(x)
    for _ in range(n_light):
        x = light(x)
    x = Lambda(_up4)(x)
    for _ in range(n_tail53):
        x = light53(x)
    out = Conv2D(3, (3, 3), padding="same", activation="relu")(x)
    return Model(init, out)


def _up2(t):
    import tensorflow as tf

    h, w = t.shape[1], t.shape[2]
    return tf.compat.v1.image.resize_bilinear(t, (2 * int(h), 2 * int(w)))


def build_real_keras_difv4(
    height: int,
    width: int,
    features: int = 256,
    n_head: int = 6,
    n_mid: int = 20,
    n_tail: int = 6,
):
    """The reference Difvdsr4 graph (models.py:1021-1047) as a real Keras 2
    functional model: 1x1 relu 'level1' -> n_head light0 blocks
    (conv3 -> LeakyReLU(0.001) -> conv3 -> x0.1 -> add, models.py:1135-1150)
    -> TF1 bilinear x2 -> long-skip save -> n_mid light blocks
    (relu variant, models.py:1118-1133) -> add skip -> TF1 bilinear x2 ->
    n_tail light blocks -> 3x3x3 relu out."""
    from tf_keras import backend as K
    from tf_keras.layers import (
        Activation,
        Add,
        Conv2D,
        Input,
        Lambda,
        LeakyReLU,
    )
    from tf_keras.models import Model

    K.clear_session()  # deterministic auto-names (see build_real_keras_didbl)

    def light(x, slope=None):
        h = Conv2D(features, (3, 3), padding="same")(x)
        h = LeakyReLU(slope)(h) if slope is not None else Activation("relu")(h)
        h = Conv2D(features, (3, 3), padding="same")(h)
        h = Lambda(_scale01)(h)
        return Add()([h, x])

    init = Input(shape=(height, width, 3))
    x = Conv2D(features, (1, 1), activation="relu", padding="same",
               name="level1")(init)
    for _ in range(n_head):
        x = light(x, slope=0.001)
    x = Lambda(_up2)(x)
    skip = x
    for _ in range(n_mid):
        x = light(x)
    x = Add()([x, skip])
    x = Lambda(_up2)(x)
    for _ in range(n_tail):
        x = light(x)
    out = Conv2D(3, (3, 3), padding="same", activation="relu")(x)
    return Model(init, out)


def build_real_keras_difvdsr(
    height: int,
    width: int,
    features: int = 192,
    n_blocks: int = 32,
):
    """The reference Difvdsr refiner (models.py:1288-1357) as a real Keras 2
    functional model: 3x3 relu 'level1' -> n_blocks diff blocks
    (conv a -> relu -> conv b; Subtract(b_out, block_in); conv c ->
    LeakyReLU(0.2) -> conv d; Add([sub, d, b_out]); x0.1; Add identity,
    models.py:1336-1357) -> 3x3x3 relu out.  No in-network upscale — the
    input is the pre-upscaled image."""
    from tf_keras import backend as K
    from tf_keras.layers import (
        Activation,
        Add,
        Conv2D,
        Input,
        Lambda,
        LeakyReLU,
        Subtract,
    )
    from tf_keras.models import Model

    K.clear_session()  # deterministic auto-names (see build_real_keras_didbl)

    def diff_block(x):
        h = Conv2D(features, (3, 3), padding="same")(x)
        h = Activation("relu")(h)
        h = Conv2D(features, (3, 3), padding="same")(h)
        sub = Subtract()([h, x])
        d = Conv2D(features, (3, 3), padding="same")(sub)
        d = LeakyReLU(0.2)(d)
        d = Conv2D(features, (3, 3), padding="same")(d)
        s = Add()([sub, d, h])
        s = Lambda(_scale01)(s)
        return Add()([s, x])

    init = Input(shape=(height, width, 3))
    x = Conv2D(features, (3, 3), activation="relu", padding="same",
               name="level1")(init)
    for _ in range(n_blocks):
        x = diff_block(x)
    out = Conv2D(3, (3, 3), padding="same", activation="relu")(x)
    return Model(init, out)


def seeded_weights(model, seed: int = 0, std: float = 0.05):
    """Set every conv's kernel/bias from a seeded RNG (deterministic across
    platforms — Keras's own init is not), return the model."""
    rng = np.random.default_rng(seed)
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        kernel, bias = ws
        layer.set_weights([
            rng.normal(0.0, std, size=kernel.shape).astype(np.float32),
            rng.normal(0.0, 0.01, size=bias.shape).astype(np.float32),
        ])
    return model
