"""Pallas-fused forward for the didbl generator.

Runs the exact DifvdsrDouble graph (models/didbl.py) over the *same flax
param tree*, but with every residual block executed by the fused
VMEM-resident Pallas kernels (ops/pallas/blocks.py).  The 1x1 entry conv,
the TF1-bilinear x4 matmuls and the 3x3 output conv stay on the XLA path
(they are single ops with nothing to fuse across).

Use: ``apply_didbl_pallas(params, x, dtype=jnp.bfloat16)`` — drop-in for
``module.apply({'params': params}, x)``; engine selects it via
``SuperResolver(forward='pallas')``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import lax

from image_enhance_keras_tpu.ops.pallas.blocks import (
    fused_light_block,
    fused_light53_block,
)
from image_enhance_keras_tpu.ops.resize import resize_bilinear_tf1
from image_enhance_keras_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = [
    "apply_didbl_pallas",
    "quantize_didbl_params",
    "calibrate_didbl_act_scales",
    "apply_didbl_int8",
    "apply_didbl_int8_body",
    "apply_didbl_int8_tail",
    "apply_didbl_int8_xla",
    "apply_didbl_int8_xla_body",
    "apply_didbl_int8_xla_tail",
]


def _conv(x, p, precision=None):
    y = lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return y + p["bias"].astype(x.dtype)


def _light53(x, p, interpret=None):
    return fused_light53_block(
        x,
        p["conv_a1"]["kernel"], p["conv_a1"]["bias"],
        p["conv_a2"]["kernel"], p["conv_a2"]["bias"],
        p["conv_b1"]["kernel"], p["conv_b1"]["bias"],
        p["conv_b2"]["kernel"], p["conv_b2"]["bias"],
        res_scale=0.1,
        identity_scale=0.9,
        interpret=interpret,
    )


def _light53_xla(x, p):
    """Plain-XLA light53 (used post-upsample where a whole tile exceeds VMEM;
    at 16x the pixel count those convs are compute-bound and XLA already
    saturates the MXU — fusion pays off on the small-spatial tower)."""
    a = jnp.maximum(_conv(x, p["conv_a1"]), 0.0)
    a = _conv(a, p["conv_a2"])
    b = jnp.maximum(_conv(x, p["conv_b1"]), 0.0)
    b = _conv(b, p["conv_b2"])
    return jnp.asarray(0.9, x.dtype) * x + jnp.asarray(0.1, x.dtype) * (a + b)


def apply_didbl_pallas(
    params: Any,
    x: jnp.ndarray,
    dtype: Any = None,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    scale: int = 4,
    interpret: bool | None = None,
    chain: bool = False,
) -> jnp.ndarray:
    """(N, H, W, 3) [0,1] -> (N, 4H, 4W, 3); same math as DifvdsrDouble.

    ``chain=True`` uses the weight-streaming chain kernels (ops/pallas/tower):
    the whole pre-upsample tower runs with VMEM-resident activations and
    double-buffered weight DMA — requires tiles <= ~64x64 at C=128.
    """
    h = x.astype(dtype or x.dtype)
    h = jnp.maximum(_conv(h, params["level1"]), 0.0)
    if chain:
        from image_enhance_keras_tpu.ops.pallas.tower import (
            fused_light53_chain,
            fused_light_chain,
        )

        b = [params[f"body53_{i}"] for i in range(n_body53)]
        h = fused_light53_chain(
            h,
            jnp.stack([p["conv_a1"]["kernel"] for p in b]),
            jnp.stack([p["conv_a1"]["bias"] for p in b]),
            jnp.stack([p["conv_a2"]["kernel"] for p in b]),
            jnp.stack([p["conv_a2"]["bias"] for p in b]),
            jnp.stack([p["conv_b1"]["kernel"] for p in b]),
            jnp.stack([p["conv_b1"]["bias"] for p in b]),
            jnp.stack([p["conv_b2"]["kernel"] for p in b]),
            jnp.stack([p["conv_b2"]["bias"] for p in b]),
            interpret=interpret,
        )
        l = [params[f"light_{i}"] for i in range(n_light)]
        h = fused_light_chain(
            h,
            jnp.stack([p["conv_a"]["kernel"] for p in l]),
            jnp.stack([p["conv_a"]["bias"] for p in l]),
            jnp.stack([p["conv_b"]["kernel"] for p in l]),
            jnp.stack([p["conv_b"]["bias"] for p in l]),
            interpret=interpret,
        )
    else:
        for i in range(n_body53):
            h = _light53(h, params[f"body53_{i}"], interpret)
        for i in range(n_light):
            p = params[f"light_{i}"]
            h = fused_light_block(
                h,
                p["conv_a"]["kernel"], p["conv_a"]["bias"],
                p["conv_b"]["kernel"], p["conv_b"]["bias"],
                res_scale=0.1,
                interpret=interpret,
            )
    h = resize_bilinear_tf1(h, (scale * h.shape[-3], scale * h.shape[-2]))
    for i in range(n_tail53):
        h = _light53_xla(h, params[f"tail53_{i}"])
    out = _conv(h, params["out"])
    return jnp.maximum(out, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# int8 serving path (ops/pallas/int8_blocks.py)
# ---------------------------------------------------------------------------

def calibrate_didbl_act_scales(
    params: Any,
    x: jnp.ndarray,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    scale: int = 4,
    margin: float = 1.0,
    per_channel: bool = False,
    upsampler: str = "tf1_bilinear",
) -> dict:
    """Post-training activation calibration for the int8 serving path.

    Replays the exact didbl graph in f32 on a representative input and
    records the abs-max at every quantization point (block input + each
    branch's post-relu intermediate).  Returns {block_name: (k,) f32 int8
    scales} the kernels consume as static scales — removing the per-tile
    abs-max reduction + divide of dynamic quantization.

    ``per_channel=True`` records (C,) abs-max vectors per quantization
    point instead of scalars.  Measured (r2): per-tensor static scales
    lose resolution vs dynamic per-tile (SSIM-Y delta 0.0034 vs 0.0004;
    a 1.25 margin made it worse, 0.0063 — the error is quantization step
    size, not clipping); per-channel restores the resolution and folds
    into the weights at zero runtime cost (see quantize_didbl_params)."""
    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

    scales: dict = {}

    def amax(t):
        if per_channel:
            m = jnp.max(jnp.abs(t), axis=tuple(range(t.ndim - 1)))
        else:
            m = jnp.max(jnp.abs(t))
        return jnp.maximum(m, 1e-6) * (margin / 127.0)

    def l53(h, p, name):
        a = jnp.maximum(_conv(h, p["conv_a1"]), 0.0)
        b = jnp.maximum(_conv(h, p["conv_b1"]), 0.0)
        scales[name] = {"x": amax(h), "a": amax(a), "b": amax(b)}
        a = _conv(a, p["conv_a2"])
        b = _conv(b, p["conv_b2"])
        return 0.9 * h + 0.1 * (a + b)

    def light(h, p, name):
        t = jnp.maximum(_conv(h, p["conv_a"]), 0.0)
        scales[name] = {"x": amax(h), "t": amax(t)}
        return h + 0.1 * _conv(t, p["conv_b"])

    h = jnp.maximum(_conv(x.astype(jnp.float32), params["level1"]), 0.0)
    for i in range(n_body53):
        h = l53(h, params[f"body53_{i}"], f"body53_{i}")
    for i in range(n_light):
        h = light(h, params[f"light_{i}"], f"light_{i}")
    if upsampler == "subpixel":
        # alternative head (didbl.py: conv to r^2*C then depth_to_space)
        from image_enhance_keras_tpu.ops.pixel_shuffle import depth_to_space

        scales["subpixel_conv"] = {"x": amax(h)}
        h = depth_to_space(_conv(h, params["subpixel_conv"]), scale, order="dcr")
    else:
        h = upsample_phase_tf1(h, scale)
    for i in range(n_tail53):
        h = l53(h, params[f"tail53_{i}"], f"tail53_{i}")
    return scales


def quantize_didbl_params(
    params: Any,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    calib_x: jnp.ndarray | None = None,
    scale: int = 4,
    upsampler: str = "tf1_bilinear",
) -> Any:
    """One-time weight quantization: every residual-block conv becomes
    (int8 kernel, per-out-channel f32 scale, f32 bias); level1/out stay f32
    (they are <0.1% of FLOPs and touch the raw image/output).

    ``calib_x``: optional (N, H, W, 3) [0,1] calibration input — when given,
    per-block static activation scales are embedded:
      * "act"  — per-tensor scalars (stacked) for the Pallas kernels;
      * "actc" — per-CHANNEL (C,) vectors for the XLA int8 path, with the
        input-channel scales FOLDED into extra weight copies ("qf"/"sf"):
        conv(x, w) = conv(x/s_c, w * s_c) elementwise over cin, so runtime
        quantization is one per-channel mul and dequant stays per-cout."""
    import numpy as np

    from image_enhance_keras_tpu.ops.pallas.int8_blocks import (
        quantize_weights_per_channel,
    )

    def qconv(p):
        q, s = quantize_weights_per_channel(np.asarray(p["kernel"], np.float32))
        return {"q": q, "s": s, "bias": jnp.asarray(p["bias"], jnp.float32)}

    def fold(entry, p, s_in):
        w = np.asarray(p["kernel"], np.float32) * np.asarray(s_in)[None, None, :, None]
        qf, sf = quantize_weights_per_channel(w)
        entry["qf"], entry["sf"] = qf, sf

    actc = (
        calibrate_didbl_act_scales(
            params, calib_x, n_body53=n_body53, n_light=n_light,
            n_tail53=n_tail53, scale=scale, per_channel=True,
            upsampler=upsampler,
        )
        if calib_x is not None
        else {}
    )
    out = {"level1": params["level1"], "out": params["out"]}
    if upsampler == "subpixel":
        # the subpixel head conv carries ~2 light53-blocks' worth of FLOPs
        # at LR — quantize it like the blocks (folded input-channel scales)
        blk = params["subpixel_conv"]
        out["subpixel_conv"] = qconv(blk)
        if "subpixel_conv" in actc:
            sc = actc["subpixel_conv"]
            out["subpixel_conv"]["actc"] = sc
            fold(out["subpixel_conv"], blk, sc["x"])
    for prefix, n in (("body53", n_body53), ("tail53", n_tail53)):
        for i in range(n):
            name = f"{prefix}_{i}"
            blk = params[name]
            out[name] = {k: qconv(blk[k]) for k in
                         ("conv_a1", "conv_a2", "conv_b1", "conv_b2")}
            if name in actc:
                sc = actc[name]
                out[name]["actc"] = sc
                out[name]["act"] = jnp.stack(
                    [jnp.max(sc["x"]), jnp.max(sc["a"]), jnp.max(sc["b"])]
                )
                fold(out[name]["conv_a1"], blk["conv_a1"], sc["x"])
                fold(out[name]["conv_a2"], blk["conv_a2"], sc["a"])
                fold(out[name]["conv_b1"], blk["conv_b1"], sc["x"])
                fold(out[name]["conv_b2"], blk["conv_b2"], sc["b"])
    for i in range(n_light):
        name = f"light_{i}"
        blk = params[name]
        out[name] = {k: qconv(blk[k]) for k in ("conv_a", "conv_b")}
        if name in actc:
            sc = actc[name]
            out[name]["actc"] = sc
            out[name]["act"] = jnp.stack([jnp.max(sc["x"]), jnp.max(sc["t"])])
            fold(out[name]["conv_a"], blk["conv_a"], sc["x"])
            fold(out[name]["conv_b"], blk["conv_b"], sc["t"])
    return out


def _light53_i8(x, p, tile, interpret):
    from image_enhance_keras_tpu.ops.pallas.int8_blocks import light53_int8

    return light53_int8(
        x,
        p["conv_a1"]["q"], p["conv_a1"]["s"], p["conv_a1"]["bias"],
        p["conv_a2"]["q"], p["conv_a2"]["s"], p["conv_a2"]["bias"],
        p["conv_b1"]["q"], p["conv_b1"]["s"], p["conv_b1"]["bias"],
        p["conv_b2"]["q"], p["conv_b2"]["s"], p["conv_b2"]["bias"],
        res_scale=0.1, identity_scale=0.9, tile=tile, interpret=interpret,
        act_scales=p.get("act"),
    )


# -- XLA int8 forward ---------------------------------------------------
# Measured on v5e (bench_xla_int8, slope method): XLA's conv lowering runs
# s8 x s8 -> s32 convs at 374.5 TFLOP/s = 95% of the 394 TOPS int8 peak and
# 2.0x the bf16 rate, while Mosaic's dot_general stays at the bf16 rate
# (109.7 TFLOP/s in the Pallas kernels).  The serving int8 path is therefore
# plain XLA convs over quantized tensors; quant/dequant elementwise ops fuse
# into the conv epilogues.  Requires calibrated static scales ("act").

def _quant_c(x, s_c):
    """per-channel symmetric int8: s_c is the (C,) calibrated scale vector."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_c)), -127.0, 127.0
                    ).astype(jnp.int8)


#: int8 conv accumulator dtype (IEK_INT8_ACC = bf16 | s32 | f32).  The r3
#: fusion audit measured the serving programs HBM-bound on materialised
#: conv outputs (split2d tail 55.8x the analytic-min bytes, int8_fast
#: 1607x — AUDIT_FUSION.json); emitting the conv accumulator as bf16
#: halves that term.  Measured on v5e, same session, 512^2: split2d
#: 33.21 vs 32.56 out-Mpix/s, fast 23.67 vs 23.24 (+2%); full-Set5
#: quality gate still PASS (SSIM-Y delta vs bf16-profile 0.00094 <=
#: 0.003, EVAL_PROFILES.json) — int8+bf16-acc matches the bf16 profile's
#: own quality at ~1.9x its speed.  s32 restores the exact native path
#: (delta 0.00004) at the 2% cost.
_INT8_ACC = {"s32": jnp.int32, "bf16": jnp.bfloat16, "f32": jnp.float32}


def _qconv_xla(xq, wq):
    import os as _os

    pt = _INT8_ACC[_os.environ.get("IEK_INT8_ACC", "bf16")]
    return lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pt,
    )


def _deqf(acc, p):
    """dequant a conv over input-scale-FOLDED weights: per-cout only."""
    return acc.astype(jnp.float32) * p["sf"] + p["bias"]


def _emit_s8():
    import os as _os

    return _os.environ.get("IEK_INT8_EMIT", "wide") == "s8"


def _requant_c(acc, p, s_out):
    """Fused requantize epilogue (IEK_INT8_EMIT=s8): dequant with the
    per-cout folded scale + bias, relu, and re-quantize for the NEXT conv in
    one elementwise chain rooted at int8 — so XLA emits the conv's output
    buffer as s8 (1 B/elt) instead of materialising the f32 intermediate
    that the unfused dequant->relu->_quant_c chain writes and re-reads
    (AUDIT_FUSION.json: the int8 programs are HBM-bound on exactly these
    branch legs).  clip(round(y/s), 0, 127) subsumes the relu: negative
    pre-activations round to <= 0 and clip to 0.  Bit-exact vs the unfused
    chain — identical f32 ops in the y >= 0 range, 0 either way below it."""
    y = acc.astype(jnp.float32) * p["sf"] + p["bias"]
    return jnp.clip(jnp.round(y * (1.0 / s_out)), 0.0, 127.0).astype(jnp.int8)


def _merge55():
    """IEK_INT8_MERGE55=1: run each light53 block's two first-stage convs
    (branch a's 3x3 and branch b's 5x5 — the reference's dual-kernel block,
    /root/reference/models.py:1156-1199) as ONE 5x5 conv with 2C output
    channels, the 3x3 zero-padded to 5x5.  Both branches read the same
    quantized input, so the merge halves the first-stage conv launches and
    input reads for +47% first-stage MACs (zero taps) — it wins only where
    the r5 tail decomposition shows per-conv scheduling overhead, not MAC
    throughput, dominating the int8 tail deficit (AUDIT_TAIL_DECOMP /
    AUDIT_TAIL_LAYOUT).  Bit-exact vs the unmerged pair under
    IEK_INT8_ACC=s32 (s32 accumulation is order-invariant and zero taps
    contribute exact zeros) — verified byte-equal through the CLI on the
    full 128-feature model; under the default bf16 accumulator the merged
    conv's wider reduction tree reorders bf16 rounding (±1 LSB on ~6% of
    uint8 outputs on the tiny test model, up to ±4 on ~47% at 128
    features), so pair this lever with --int8-acc s32 or re-gate quality
    (tests/test_int8_merge55.py)."""
    import os as _os

    return _os.environ.get("IEK_INT8_MERGE55", "0") == "1"


def _merged_w55(p, key):
    """concat branch-a1/b1 kernels on cout, smaller kernel zero-padded to
    the larger (centered — SAME-pad alignment preserved for odd sizes)."""
    wa, wb = p["conv_a1"][key], p["conv_b1"][key]
    kh = max(wa.shape[0], wb.shape[0])
    kw = max(wa.shape[1], wb.shape[1])

    def padto(w):
        ph, pw = (kh - w.shape[0]) // 2, (kw - w.shape[1]) // 2
        return jnp.pad(
            w,
            ((ph, kh - w.shape[0] - ph), (pw, kw - w.shape[1] - pw),
             (0, 0), (0, 0)),
        )

    return jnp.concatenate([padto(wa), padto(wb)], axis=-1)


def _light53_i8_xla(x, p):
    sc = p["actc"]
    xq = _quant_c(x, sc["x"])
    if _merge55():
        C = p["conv_a1"]["qf"].shape[-1]
        acc = _qconv_xla(xq, _merged_w55(p, "qf"))
        acc_a, acc_b = acc[..., :C], acc[..., C:]
        if _emit_s8():
            aq = _requant_c(acc_a, p["conv_a1"], sc["a"])
            bq = _requant_c(acc_b, p["conv_b1"], sc["b"])
        else:
            aq = _quant_c(jnp.maximum(_deqf(acc_a, p["conv_a1"]), 0.0), sc["a"])
            bq = _quant_c(jnp.maximum(_deqf(acc_b, p["conv_b1"]), 0.0), sc["b"])
        a = _deqf(_qconv_xla(aq, p["conv_a2"]["qf"]), p["conv_a2"])
        b = _deqf(_qconv_xla(bq, p["conv_b2"]["qf"]), p["conv_b2"])
        return (0.9 * x.astype(jnp.float32) + 0.1 * (a + b)).astype(x.dtype)
    if _emit_s8():
        aq = _requant_c(_qconv_xla(xq, p["conv_a1"]["qf"]), p["conv_a1"], sc["a"])
        bq = _requant_c(_qconv_xla(xq, p["conv_b1"]["qf"]), p["conv_b1"], sc["b"])
    else:
        a1 = jnp.maximum(
            _deqf(_qconv_xla(xq, p["conv_a1"]["qf"]), p["conv_a1"]), 0.0
        )
        b1 = jnp.maximum(
            _deqf(_qconv_xla(xq, p["conv_b1"]["qf"]), p["conv_b1"]), 0.0
        )
        aq, bq = _quant_c(a1, sc["a"]), _quant_c(b1, sc["b"])
    a = _deqf(_qconv_xla(aq, p["conv_a2"]["qf"]), p["conv_a2"])
    b = _deqf(_qconv_xla(bq, p["conv_b2"]["qf"]), p["conv_b2"])
    return (0.9 * x.astype(jnp.float32) + 0.1 * (a + b)).astype(x.dtype)


def _light_i8_xla(x, p):
    sc = p["actc"]
    if _emit_s8():
        tq = _requant_c(
            _qconv_xla(_quant_c(x, sc["x"]), p["conv_a"]["qf"]),
            p["conv_a"], sc["t"],
        )
    else:
        t = jnp.maximum(
            _deqf(
                _qconv_xla(_quant_c(x, sc["x"]), p["conv_a"]["qf"]), p["conv_a"]
            ),
            0.0,
        )
        tq = _quant_c(t, sc["t"])
    u = _deqf(_qconv_xla(tq, p["conv_b"]["qf"]), p["conv_b"])
    return (x.astype(jnp.float32) + 0.1 * u).astype(x.dtype)


def _quant_dyn_sample(x):
    """Dynamic per-SAMPLE symmetric int8 (one scale per batch element —
    per tile in the split2d tail batch).  r2 measurement: dynamic per-tile
    scales score a 0.0004 SSIM-Y delta vs 0.0026-0.0052 for static
    schemes; cost is one abs-max reduction per conv input."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-6
    ) / 127.0
    xq = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return xq, s


def _deq_dyn(acc, p, s_in):
    """dequant with runtime input scale: per-cout weight scale x per-sample
    activation scale (weights from the unfolded "q"/"s" entries)."""
    return acc.astype(jnp.float32) * (p["s"] * s_in) + p["bias"]


def _requant_dyn(acc, p, s_in):
    """Dynamic per-sample requant of a conv's accumulator (IEK_INT8_EMIT=s8
    on the dynamic tail): dequant+relu fold into both the scale reduction
    and the int8 emission, so the branch's f32 intermediate never
    materialises — XLA re-reads the (bf16) accumulator for the reduce and
    the requant instead of writing/reading a f32 map.  Same f32 ops as the
    unfused dequant -> relu -> _quant_dyn_sample chain => bit-exact."""
    y = jnp.maximum(acc.astype(jnp.float32) * (p["s"] * s_in) + p["bias"], 0.0)
    s = jnp.maximum(
        jnp.max(jnp.abs(y), axis=(1, 2, 3), keepdims=True), 1e-6
    ) / 127.0
    yq = jnp.clip(jnp.round(y / s), -127.0, 127.0).astype(jnp.int8)
    return yq, s


def _light53_i8_xla_dyn(x, p):
    xq, sx = _quant_dyn_sample(x)
    if _merge55():
        # merged first stage (see _merge55); requant epilogues stay
        # per-branch — each half needs its own per-sample output scale
        C = p["conv_a1"]["q"].shape[-1]
        acc = _qconv_xla(xq, _merged_w55(p, "q"))
        acc_a, acc_b = acc[..., :C], acc[..., C:]
        if _emit_s8():
            aq, sa = _requant_dyn(acc_a, p["conv_a1"], sx)
            bq, sb = _requant_dyn(acc_b, p["conv_b1"], sx)
        else:
            a1 = jnp.maximum(_deq_dyn(acc_a, p["conv_a1"], sx), 0.0)
            b1 = jnp.maximum(_deq_dyn(acc_b, p["conv_b1"], sx), 0.0)
            aq, sa = _quant_dyn_sample(a1)
            bq, sb = _quant_dyn_sample(b1)
        a = _deq_dyn(_qconv_xla(aq, p["conv_a2"]["q"]), p["conv_a2"], sa)
        b = _deq_dyn(_qconv_xla(bq, p["conv_b2"]["q"]), p["conv_b2"], sb)
        return (0.9 * x.astype(jnp.float32) + 0.1 * (a + b)).astype(x.dtype)
    if _emit_s8():
        aq, sa = _requant_dyn(_qconv_xla(xq, p["conv_a1"]["q"]), p["conv_a1"], sx)
        bq, sb = _requant_dyn(_qconv_xla(xq, p["conv_b1"]["q"]), p["conv_b1"], sx)
    else:
        a1 = jnp.maximum(
            _deq_dyn(_qconv_xla(xq, p["conv_a1"]["q"]), p["conv_a1"], sx), 0.0
        )
        b1 = jnp.maximum(
            _deq_dyn(_qconv_xla(xq, p["conv_b1"]["q"]), p["conv_b1"], sx), 0.0
        )
        aq, sa = _quant_dyn_sample(a1)
        bq, sb = _quant_dyn_sample(b1)
    a = _deq_dyn(_qconv_xla(aq, p["conv_a2"]["q"]), p["conv_a2"], sa)
    b = _deq_dyn(_qconv_xla(bq, p["conv_b2"]["q"]), p["conv_b2"], sb)
    return (0.9 * x.astype(jnp.float32) + 0.1 * (a + b)).astype(x.dtype)


def _require_act(qparams):
    if "actc" not in qparams.get("body53_0", {}):
        raise ValueError(
            "forward='int8' needs calibrated activation scales: quantize with "
            "quantize_didbl_params(..., calib_x=...)"
        )


def apply_didbl_int8_xla_body(
    qparams: Any, x: jnp.ndarray, n_body53: int = 16, n_light: int = 6
) -> jnp.ndarray:
    """XLA-int8 pre-upsample tower (mirrors DifvdsrDouble.body)."""
    _require_act(qparams)
    h = x.astype(jnp.bfloat16)
    h = jnp.maximum(_conv(h, qparams["level1"]), 0.0)
    for i in range(n_body53):
        h = _light53_i8_xla(h, qparams[f"body53_{i}"])
    for i in range(n_light):
        h = _light_i8_xla(h, qparams[f"light_{i}"])
    return h


def _tiled_chain(h, fns, radius_per_fn, tile):
    """Run a chain of spatially-local block fns over shifted spatial tiles.

    ``h`` is (1, H, W, C); the chain's zero-pad pollution propagates inward
    ``sum(radius_per_fn)`` px, so tiles carry that halo and only the owned
    core is stitched back — BIT-exact vs the whole-frame chain (same shifted
    -grid argument as the engine's split2d tail, tiling/tiles.py).

    Why: measured on v5e (ROADMAP r2 map), int8 convs run at ~291
    TFLOP/s-equiv on <=256^2 spatials but ~175 at 512^2 — the 1x512^2 BODY
    became the biggest int8 loss (~30 ms/frame) once the tail was tiled.
    This moves the body into the fast regime for a (T/t)^2 halo cost.
    """
    from image_enhance_keras_tpu.tiling import (
        gather_tiles_2d,
        scatter_tiles_2d,
        shift_grid_axis,
        shifted_extract_indices,
        shifted_stitch_indices,
    )

    halo = int(sum(radius_per_fn))
    H, W, c = int(h.shape[1]), int(h.shape[2]), h.shape[-1]
    # Known limitations (acceptable while the whole feature is a measured
    # negative kept behind engine flags, ROADMAP r3 verdict #2) — both
    # fall back to the untiled chain, loudly:
    #   * one axis fits a single tile (elongated frames, e.g. 256x4096);
    #   * batched inputs (tiled patch / video modes) — tiling is only
    #     wired for the batch-1 whole-frame body.
    if min(H, W) <= tile + 2 * halo or h.shape[0] != 1:
        log.warning(
            "int8 body tiling requested (tile=%d) but input %s is %s; "
            "running the untiled chain",
            tile, tuple(h.shape),
            "batched" if h.shape[0] != 1 else "too small to tile",
        )
        for f in fns:
            h = f(h)
        return h
    T_r, starts_r, _ = shift_grid_axis(H, tile, halo)
    T_c, starts_c, _ = shift_grid_axis(W, tile, halo)
    n_r, n_c = len(starts_r), len(starts_c)
    ex_r = jnp.asarray(shifted_extract_indices(H, tile, halo))
    ex_c = jnp.asarray(shifted_extract_indices(W, tile, halo))
    st_r = jnp.asarray(shifted_stitch_indices(H, tile, halo, 1))
    st_c = jnp.asarray(shifted_stitch_indices(W, tile, halo, 1))

    x = gather_tiles_2d(h[0], ex_r, ex_c, n_r, n_c, T_r, T_c)
    for f in fns:
        x = f(x)
    return scatter_tiles_2d(x, st_r, st_c, n_r, n_c, T_r, T_c, scale=1)[None]


#: receptive-field radii of the block kernels (SAME zero-pad pollution per
#: block): light53 = max(3x3 then 5x5) = 3; light = two 3x3 = 2.
_LIGHT53_RADIUS = 3
_LIGHT_RADIUS = 2


def apply_didbl_int8_xla_body_tiled(
    qparams: Any,
    x: jnp.ndarray,
    n_body53: int = 16,
    n_light: int = 6,
    tile: int = 256,
    seg: int = 4,
) -> jnp.ndarray:
    """XLA-int8 body with per-segment spatial tiling (ROADMAP r2 item 1).

    Blocks are grouped into segments of ``seg``; each segment runs over
    shifted (tile + 2*halo)^2 tiles with halo = the segment's summed
    receptive radius, re-stitched between segments.  seg trades halo-overlap
    FLOPs (larger seg -> bigger halo) against extract/stitch HBM traffic
    (smaller seg -> more round-trips); tile keeps the convs in the <=256^2
    int8 rate regime.  Output is bit-exact vs apply_didbl_int8_xla_body.
    """
    _require_act(qparams)
    h = x.astype(jnp.bfloat16)
    h = jnp.maximum(_conv(h, qparams["level1"]), 0.0)
    chain = [
        (lambda b, i=i: _light53_i8_xla(b, qparams[f"body53_{i}"]), _LIGHT53_RADIUS)
        for i in range(n_body53)
    ] + [
        (lambda b, i=i: _light_i8_xla(b, qparams[f"light_{i}"]), _LIGHT_RADIUS)
        for i in range(n_light)
    ]
    for k in range(0, len(chain), max(1, seg)):
        fns = [f for f, _ in chain[k : k + seg]]
        radii = [r for _, r in chain[k : k + seg]]
        h = _tiled_chain(h, fns, radii, tile)
    return h


def _os_env(name: str, default: str = "0") -> str:
    import os as _os

    return _os.environ.get(name, default)


def _upq():
    """IEK_INT8_UPQ=1: fuse QUANTIZE into the x4 upsample boundary — the
    r3 surviving idea (ROADMAP.md #3).  The tail's first light53 block
    consumes the upsampled map twice: quantized (conv input) and raw
    (0.9-identity leg).  Default path materialises the bf16 HR map (2 B/elt
    write + two full reads) before the int8 quant; with UPQ the quant chain
    roots directly at the LR body map — XLA emits ONE fusion that reads LR
    bytes and writes the HR map as int8 (1 B/elt) — and the identity leg
    recomputes ``U(0.9*h)`` from LR (the upsample is linear), fusing into
    the residual add instead of re-reading a materialised HR map.  Not
    bit-exact vs the unfused path (0.9 applied before vs after the
    interleave reorders f32/bf16 rounding); quality is gated like every
    int8 option (EVAL_PROFILES)."""
    import os as _os

    return _os.environ.get("IEK_INT8_UPQ", "0") == "1"


def _light53_i8_xla_upfused(h_lr, p, scale):
    """First post-upsample light53 block with the x4 interleave fused into
    both of its consumers (see _upq).  h_lr: (N, h, w, C) bf16 body map."""
    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

    sc = p["actc"]
    # quant chain rooted at LR: reads h_lr, writes int8 HR — the bf16 HR
    # map is never materialised for the conv operands
    xq = _quant_c(upsample_phase_tf1(h_lr, scale), sc["x"])
    if _emit_s8():
        aq = _requant_c(_qconv_xla(xq, p["conv_a1"]["qf"]), p["conv_a1"], sc["a"])
        bq = _requant_c(_qconv_xla(xq, p["conv_b1"]["qf"]), p["conv_b1"], sc["b"])
    else:
        a1 = jnp.maximum(
            _deqf(_qconv_xla(xq, p["conv_a1"]["qf"]), p["conv_a1"]), 0.0
        )
        b1 = jnp.maximum(
            _deqf(_qconv_xla(xq, p["conv_b1"]["qf"]), p["conv_b1"]), 0.0
        )
        aq, bq = _quant_c(a1, sc["a"]), _quant_c(b1, sc["b"])
    a = _deqf(_qconv_xla(aq, p["conv_a2"]["qf"]), p["conv_a2"])
    b = _deqf(_qconv_xla(bq, p["conv_b2"]["qf"]), p["conv_b2"])
    # identity leg recomputed from LR in f32 (linearity: 0.9*U(h) = U(0.9*h));
    # a distinct subgraph from the quant chain's U so CSE cannot merge them
    # back into one materialised HR buffer
    skip = upsample_phase_tf1(h_lr.astype(jnp.float32) * 0.9, scale)
    return (skip + 0.1 * (a + b)).astype(h_lr.dtype)


def apply_didbl_int8_xla_tail(
    qparams: Any, h: jnp.ndarray, n_tail53: int = 2, scale: int = 4,
    dynamic: bool = False, upsampler: str = "tf1_bilinear",
) -> jnp.ndarray:
    """XLA-int8 upsample head + post-upsample blocks + out conv.

    ``dynamic=True``: tail blocks quantize with per-sample runtime scales
    (engine ``int8_dynamic_tail``) — in split2d mode that is per-TILE, the
    scheme r2 measured at a 0.0004 SSIM-Y delta.
    ``upsampler='subpixel'``: int8 subpixel conv + depth_to_space instead
    of the TF1 bilinear interleave (didbl.py alternative head).
    ``IEK_INT8_UPQ=1`` (static tf1_bilinear only): quantize-fused upsample
    boundary — see _upq."""
    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

    h = h.astype(jnp.bfloat16)
    start = 0
    if upsampler == "subpixel":
        from image_enhance_keras_tpu.ops.pixel_shuffle import depth_to_space

        p = qparams["subpixel_conv"]
        if dynamic:
            hq, sx = _quant_dyn_sample(h)
            t = _deq_dyn(_qconv_xla(hq, p["q"]), p, sx)
        else:
            t = _deqf(_qconv_xla(_quant_c(h, p["actc"]["x"]), p["qf"]), p)
        h = depth_to_space(t.astype(jnp.bfloat16), scale, order="dcr")
    elif _upq() and not dynamic and n_tail53 >= 1:
        h = _light53_i8_xla_upfused(h, qparams["tail53_0"], scale)
        start = 1
    elif _os_env("IEK_INT8_UPMM") == "1":
        # r4 attribution: the fused phase interleave measures 12.6 ms per
        # 8-tile chunk (~49 GB/s effective) — 24% of the tail.  This
        # variant runs the SAME TF1 semantics as two dense MXU matmuls
        # (ops/resize.resize2d weight matrices) which stream at matmul
        # bandwidth instead of the interleave's stack/concat lowering.
        # Not bit-exact vs the interleave in bf16 (same closed form,
        # different summation), gated like every int8 option.
        from image_enhance_keras_tpu.ops.resize import resize_bilinear_tf1

        h = resize_bilinear_tf1(
            h, (scale * int(h.shape[-3]), scale * int(h.shape[-2]))
        )
    else:
        h = upsample_phase_tf1(h, scale)
    for i in range(start, n_tail53):
        p = qparams[f"tail53_{i}"]
        h = _light53_i8_xla_dyn(h, p) if dynamic else _light53_i8_xla(h, p)
    out = _conv(h, qparams["out"])
    return jnp.maximum(out, 0.0).astype(jnp.float32)


def apply_didbl_int8_xla(
    qparams: Any,
    x: jnp.ndarray,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    scale: int = 4,
    upsampler: str = "tf1_bilinear",
) -> jnp.ndarray:
    """(N, H, W, 3) [0,1] -> (N, 4H, 4W, 3): the didbl graph with every
    residual-block conv on XLA's native-rate int8 path (2.0x bf16 measured);
    identity/skip paths stay unquantized, same scheme as the Pallas kernels
    (quality gate: EVAL_PROFILES.json)."""
    h = apply_didbl_int8_xla_body(qparams, x, n_body53=n_body53, n_light=n_light)
    return apply_didbl_int8_xla_tail(
        qparams, h, n_tail53=n_tail53, scale=scale, upsampler=upsampler
    )


def apply_didbl_int8_body(
    qparams: Any,
    x: jnp.ndarray,
    n_body53: int = 16,
    n_light: int = 6,
    tile: tuple[int, int] = (64, 128),
    interpret: bool | None = None,
) -> jnp.ndarray:
    """int8 pre-upsample tower at LR (mirrors DifvdsrDouble.body)."""
    from image_enhance_keras_tpu.ops.pallas.int8_blocks import light_int8

    h = x.astype(jnp.bfloat16)
    h = jnp.maximum(_conv(h, qparams["level1"]), 0.0)
    for i in range(n_body53):
        h = _light53_i8(h, qparams[f"body53_{i}"], tile, interpret)
    for i in range(n_light):
        p = qparams[f"light_{i}"]
        h = light_int8(
            h,
            p["conv_a"]["q"], p["conv_a"]["s"], p["conv_a"]["bias"],
            p["conv_b"]["q"], p["conv_b"]["s"], p["conv_b"]["bias"],
            res_scale=0.1, tile=tile, interpret=interpret,
            act_scales=p.get("act"),
        )
    return h


def apply_didbl_int8_tail(
    qparams: Any,
    h: jnp.ndarray,
    n_tail53: int = 2,
    scale: int = 4,
    tile: tuple[int, int] = (64, 128),
    interpret: bool | None = None,
) -> jnp.ndarray:
    """int8 x4 upsample + post-upsample blocks + out conv (mirrors
    DifvdsrDouble.tail; same receptive field, so the engine's split-mode
    halo arithmetic applies unchanged).  Per-tile activation scales are
    computed from whatever window the kernel sees, so striped output equals
    the whole-frame int8 forward up to quantization noise (not bitwise)."""
    from image_enhance_keras_tpu.ops.resize import upsample_phase_tf1

    h = upsample_phase_tf1(h.astype(jnp.bfloat16), scale)
    for i in range(n_tail53):
        h = _light53_i8(h, qparams[f"tail53_{i}"], tile, interpret)
    out = _conv(h, qparams["out"])
    return jnp.maximum(out, 0.0).astype(jnp.float32)


def apply_didbl_int8(
    qparams: Any,
    x: jnp.ndarray,
    n_body53: int = 16,
    n_light: int = 6,
    n_tail53: int = 2,
    scale: int = 4,
    tile: tuple[int, int] = (64, 128),
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(N, H, W, 3) [0,1] -> (N, 4H, 4W, 3): the didbl graph with every
    residual block on the int8 MXU path (2x bf16 peak on v5e), including the
    post-upsample tail via the halo-DMA spatial grid.  Activations stay bf16
    between blocks; identity paths carry no quantization error.
    """
    h = apply_didbl_int8_body(
        qparams, x, n_body53=n_body53, n_light=n_light, tile=tile,
        interpret=interpret,
    )
    return apply_didbl_int8_tail(
        qparams, h, n_tail53=n_tail53, scale=scale, tile=tile,
        interpret=interpret,
    )
