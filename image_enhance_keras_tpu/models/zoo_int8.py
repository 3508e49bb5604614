"""XLA-int8 quantized forwards for the rest of the zoo (difv4, difvdsr).

Same scheme as the flagship path (models/didbl_pallas.py, measured 374.5
TFLOP/s = 95% of the v5e int8 peak): every residual-block conv runs as an
s8 x s8 -> s32 `lax.conv` over per-channel-calibrated quantized tensors,
with the input-channel activation scales folded into extra int8 weight
copies; skip connections and entry/out convs stay unquantized.

Reference mapping: quantized serving has no counterpart in the reference
(SURVEY.md section 2.9 — no quantization anywhere); this extends the
capability across the model zoo (models.py:992-1142 difv4, 1274-1357
difvdsr).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from image_enhance_keras_tpu.models.didbl_pallas import (
    _conv,
    _quant_c,
    _qconv_xla,
    _deqf,
)

__all__ = [
    "int8_support",
    "quantize_difv4_params",
    "apply_difv4_int8",
    "apply_difv4_int8_body",
    "apply_difv4_int8_tail",
    "quantize_difvdsr_params",
    "apply_difvdsr_int8",
]


def int8_support(module):
    """Engine dispatch for ``forward='int8'``: returns
    ``(quantize_fn, apply_fn, body_fn, tail_fn)`` bound to the module's
    config, or None when the model has no int8 path.  body/tail are None
    for models without a split decomposition."""
    cls = type(module).__name__
    if cls == "DifvdsrDouble":
        ups = getattr(module, "upsampler", "tf1_bilinear")
        if ups not in ("tf1_bilinear", "subpixel"):
            return None
        from image_enhance_keras_tpu.models import didbl_pallas as dp

        kw = dict(n_body53=module.n_body53, n_light=module.n_light,
                  n_tail53=module.n_tail53)
        return (
            lambda params, calib: dp.quantize_didbl_params(
                params, calib_x=calib, scale=module.scale, upsampler=ups, **kw),
            lambda qp, x: dp.apply_didbl_int8_xla(
                qp, x, scale=module.scale, upsampler=ups, **kw),
            lambda qp, x: dp.apply_didbl_int8_xla_body(
                qp, x, n_body53=module.n_body53, n_light=module.n_light),
            lambda qp, h: dp.apply_didbl_int8_xla_tail(
                qp, h, n_tail53=module.n_tail53, scale=module.scale,
                upsampler=ups),
        )
    if cls == "Difvdsr4":
        kw = dict(n_head=module.n_head, n_mid=module.n_mid, n_tail=module.n_tail,
                  scale=module.scale)
        return (
            lambda params, calib: quantize_difv4_params(params, calib, **kw),
            lambda qp, x: apply_difv4_int8(qp, x, **kw),
            lambda qp, x: apply_difv4_int8_body(
                qp, x, n_head=module.n_head, n_mid=module.n_mid),
            lambda qp, h: apply_difv4_int8_tail(
                qp, h, n_tail=module.n_tail, scale=module.scale),
        )
    if cls == "Difvdsr":
        return (
            lambda params, calib: quantize_difvdsr_params(
                params, calib, n_blocks=module.n_blocks),
            lambda qp, x: apply_difvdsr_int8(qp, x, n_blocks=module.n_blocks),
            None,
            None,
        )
    return None


def _amax_c(t):
    return jnp.maximum(jnp.max(jnp.abs(t), axis=tuple(range(t.ndim - 1))), 1e-6) / 127.0


def _act(t, leaky):
    return jnp.maximum(t, 0.0) if leaky is None else jnp.where(t >= 0, t, leaky * t)


def _qfold(p, s_in):
    import numpy as np

    from image_enhance_keras_tpu.ops.pallas.int8_blocks import (
        quantize_weights_per_channel,
    )

    w = np.asarray(p["kernel"], np.float32) * np.asarray(s_in)[None, None, :, None]
    qf, sf = quantize_weights_per_channel(w)
    return {"qf": qf, "sf": sf, "bias": jnp.asarray(p["bias"], jnp.float32)}


# -- LightBlock chains (difv4) ----------------------------------------------

def _calib_light(h, p, leaky):
    """f32 replay of one LightBlock, returning (out, scales)."""
    t = _act(_conv(h, p["conv_a"]), leaky)
    sc = {"x": _amax_c(h), "t": _amax_c(t)}
    return h + 0.1 * _conv(t, p["conv_b"]), sc


def _quantize_light(p, sc):
    return {
        "conv_a": _qfold(p["conv_a"], sc["x"]),
        "conv_b": _qfold(p["conv_b"], sc["t"]),
        "actc": sc,
    }


def _light_i8(x, p, leaky):
    t = _act(_deqf(_qconv_xla(_quant_c(x, p["actc"]["x"]), p["conv_a"]["qf"]),
                   p["conv_a"]), leaky)
    u = _deqf(_qconv_xla(_quant_c(t, p["actc"]["t"]), p["conv_b"]["qf"]), p["conv_b"])
    return (x.astype(jnp.float32) + 0.1 * u).astype(x.dtype)


# -- difv4 ------------------------------------------------------------------

_DIFV4_LEAKY_HEAD = 0.001  # LightBlock leaky_slope in the head tower


def quantize_difv4_params(
    params: Any,
    calib_x: jnp.ndarray,
    n_head: int = 6,
    n_mid: int = 20,
    n_tail: int = 6,
    scale: int = 4,
) -> Any:
    """Calibrate + quantize Difvdsr4 (reference models.py:992-1142;
    scale=2 = the single-2x variant, no second upsample)."""
    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

    out = {"level1": params["level1"], "out": params["out"]}
    h = jnp.maximum(_conv(calib_x.astype(jnp.float32), params["level1"]), 0.0)
    for i in range(n_head):
        p = params[f"head_{i}"]
        h, sc = _calib_light(h, p, _DIFV4_LEAKY_HEAD)
        out[f"head_{i}"] = _quantize_light(p, sc)
    h = upsample_phase_tf1(h, 2)
    skip = h
    for i in range(n_mid):
        p = params[f"mid_{i}"]
        h, sc = _calib_light(h, p, None)
        out[f"mid_{i}"] = _quantize_light(p, sc)
    h = h + skip
    if scale == 4:
        h = upsample_phase_tf1(h, 2)
    for i in range(n_tail):
        p = params[f"tail_{i}"]
        h, sc = _calib_light(h, p, None)
        out[f"tail_{i}"] = _quantize_light(p, sc)
    return out


def apply_difv4_int8_body(qp: Any, x: jnp.ndarray, n_head: int = 6,
                          n_mid: int = 20) -> jnp.ndarray:
    """Mirrors Difvdsr4.body: head tower at 1x -> x2 -> mid + long skip."""
    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

    h = x.astype(jnp.bfloat16)
    h = jnp.maximum(_conv(h, qp["level1"]), 0.0)
    for i in range(n_head):
        h = _light_i8(h, qp[f"head_{i}"], _DIFV4_LEAKY_HEAD)
    h = upsample_phase_tf1(h, 2)
    skip = h
    for i in range(n_mid):
        h = _light_i8(h, qp[f"mid_{i}"], None)
    return h + skip


def apply_difv4_int8_tail(qp: Any, h: jnp.ndarray, n_tail: int = 6,
                          scale: int = 4) -> jnp.ndarray:
    """Mirrors Difvdsr4.tail_fn: (x2 upsample at scale=4) + tail + out conv."""
    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

    h = h.astype(jnp.bfloat16)
    if scale == 4:
        h = upsample_phase_tf1(h, 2)
    for i in range(n_tail):
        h = _light_i8(h, qp[f"tail_{i}"], None)
    out = _conv(h, qp["out"])
    return jnp.maximum(out, 0.0).astype(jnp.float32)


def apply_difv4_int8(qp: Any, x: jnp.ndarray, n_head: int = 6, n_mid: int = 20,
                     n_tail: int = 6, scale: int = 4) -> jnp.ndarray:
    h = apply_difv4_int8_body(qp, x, n_head=n_head, n_mid=n_mid)
    return apply_difv4_int8_tail(qp, h, n_tail=n_tail, scale=scale)


# -- difvdsr ----------------------------------------------------------------

_DSR_LEAKY = 0.2


def quantize_difvdsr_params(params: Any, calib_x: jnp.ndarray,
                            n_blocks: int = 32) -> Any:
    """Calibrate + quantize Difvdsr (reference models.py:1274-1357).

    DiffBlock quant points: block input x, t1 = relu(conv_a(x)),
    d = conv_b(t1) - x, u1 = lrelu(conv_c(d))."""
    out = {"level1": params["level1"], "out": params["out"]}
    h = jnp.maximum(_conv(calib_x.astype(jnp.float32), params["level1"]), 0.0)
    for i in range(n_blocks):
        p = params[f"diff_{i}"]
        t1 = jnp.maximum(_conv(h, p["conv_a"]), 0.0)
        t = _conv(t1, p["conv_b"])
        d = t - h
        u1 = _act(_conv(d, p["conv_c"]), _DSR_LEAKY)
        u = _conv(u1, p["conv_d"])
        sc = {"x": _amax_c(h), "t1": _amax_c(t1), "d": _amax_c(d),
              "u1": _amax_c(u1)}
        out[f"diff_{i}"] = {
            "conv_a": _qfold(p["conv_a"], sc["x"]),
            "conv_b": _qfold(p["conv_b"], sc["t1"]),
            "conv_c": _qfold(p["conv_c"], sc["d"]),
            "conv_d": _qfold(p["conv_d"], sc["u1"]),
            "actc": sc,
        }
        h = h + 0.1 * (d + u + t)
    return out


def _diff_i8(x, p):
    sc = p["actc"]
    t1 = jnp.maximum(
        _deqf(_qconv_xla(_quant_c(x, sc["x"]), p["conv_a"]["qf"]), p["conv_a"]), 0.0
    )
    t = _deqf(_qconv_xla(_quant_c(t1, sc["t1"]), p["conv_b"]["qf"]), p["conv_b"])
    d = t - x.astype(jnp.float32)
    u1 = _act(
        _deqf(_qconv_xla(_quant_c(d, sc["d"]), p["conv_c"]["qf"]), p["conv_c"]),
        _DSR_LEAKY,
    )
    u = _deqf(_qconv_xla(_quant_c(u1, sc["u1"]), p["conv_d"]["qf"]), p["conv_d"])
    return (x.astype(jnp.float32) + 0.1 * (d + u + t)).astype(x.dtype)


def apply_difvdsr_int8(qp: Any, x: jnp.ndarray, n_blocks: int = 32) -> jnp.ndarray:
    h = x.astype(jnp.bfloat16)
    h = jnp.maximum(_conv(h, qp["level1"]), 0.0)
    for i in range(n_blocks):
        h = _diff_i8(h, qp[f"diff_{i}"])
    out = _conv(h, qp["out"])
    return jnp.maximum(out, 0.0).astype(jnp.float32)
