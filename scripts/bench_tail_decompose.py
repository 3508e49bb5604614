"""Decompose the int8 split2d tail's 31%-of-peak deficit (VERDICT r4 next-3).

AUDIT_TAIL_PARTS.json attributes 2x52.3 ms of the 130 ms frame to the tail
chunk with "convs at ~69% of int8 peak including quant/dequant epilogues" —
attributed, not decomposed: epilogue VPU time vs sub-peak MXU scheduling
was untested.  This script times three surgical variants of the SAME tail
conv graph (2x light53 + out conv on an (8, 512, 512, 128) chunk — the
post-upsample stage of the 512/128/8 serving geometry, upsample excluded
since it is separately attributed at 12.6 ms):

  naked   — the 9 convs with MINIMAL epilogues: int8 inputs, relu+cast
            requant (no scale multiplies, no round/clip, no dequant, no
            residual arithmetic).  Pure MXU-scheduling probe: its gap to
            the 374.5 TFLOP/s measured int8 ceiling IS the scheduling term.
  full    — the production epilogues (_light53_i8_xla: quantize = mul +
            round + clip + cast; dequant = mul + bias; 0.9/0.1 residual in
            f32).  full - naked IS the epilogue term.
  bf16    — the unquantized bf16 tail blocks (dots at half rate), the
            reference point for what int8 buys end-to-end.

Prints/records ms, TFLOP/s, and the per-term split of the deficit.
Run ON THE TPU: python scripts/bench_tail_decompose.py [tiles] [hr] [feats]
Appends to AUDIT_TAIL_DECOMP.json; conclusions go to SERVING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INT8_CEIL_TFLOPS = 374.5  # measured XLA int8 conv rate (95% of 394 peak)
BF16_CEIL_TFLOPS = 197.0  # v5e bf16 MXU peak


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models import didbl_pallas as dp

    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hr = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    feats = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    iters = int(os.environ.get("IEK_DECOMP_ITERS", "4"))

    r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="split",
                      forward="int8", split_tile=hr // 4, split_tile_w=hr // 4)
    qp = r._fwd_params()
    fp = r.params  # unquantized, for the bf16 variant
    m = r.module

    def qconv(x8, w8):
        return lax.conv_general_dilated(
            x8, w8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    def light53_naked(x8, p):
        """Same 4 conv shapes/dataflow as _light53_i8_xla, minimal
        elementwise: relu+cast requant, plain add residual."""
        a = qconv(x8, p["conv_a1"]["qf"])
        a = qconv(jnp.maximum(a, 0).astype(jnp.int8), p["conv_a2"]["qf"])
        b = qconv(x8, p["conv_b1"]["qf"])
        b = qconv(jnp.maximum(b, 0).astype(jnp.int8), p["conv_b2"]["qf"])
        return jnp.clip(a + b, -127, 127).astype(jnp.int8)

    def tail_naked(x8):
        h = x8
        for i in range(m.n_tail53):
            h = light53_naked(h, qp[f"tail53_{i}"])
        # the production out conv stays unquantized (level1/out are f32 in
        # the scheme) — mirror that exactly so the comparison is conv-parity
        out = dp._conv(h.astype(jnp.bfloat16), qp["out"])
        return jnp.maximum(out, 0.0).astype(jnp.float32)

    def tail_full(hbf):
        h = hbf
        for i in range(m.n_tail53):
            h = dp._light53_i8_xla(h, qp[f"tail53_{i}"])
        out = dp._conv(h, qp["out"])
        return jnp.maximum(out, 0.0).astype(jnp.float32)

    def tail_bf16(hbf):
        from image_enhance_keras_tpu.models.blocks import Light53Block, make_conv

        h = hbf
        for i in range(m.n_tail53):
            blk = Light53Block(feats, dtype=jnp.bfloat16)
            h = blk.apply({"params": fp[f"tail53_{i}"]}, h)
        outc = make_conv(3, (3, 3), dtype=jnp.bfloat16, mixed=False)
        out = outc.apply({"params": fp["out"]}, h)
        return jnp.maximum(out, 0.0).astype(jnp.float32)

    rng = np.random.default_rng(0)
    x8 = jax.device_put(jnp.asarray(
        rng.integers(-100, 100, (n_tiles, hr, hr, feats)), jnp.int8))
    xb = jax.device_put(jnp.asarray(
        rng.standard_normal((n_tiles, hr, hr, feats)) * 0.2, jnp.bfloat16))

    def timed(fn, x) -> float:
        @jax.jit
        def run(salt, t):
            t = t + (salt % 2).astype(t.dtype)
            y = fn(t)
            return jnp.sum(
                y[:, ::97, ::97, :].astype(jnp.float32)
            ).astype(jnp.int32) + salt

        salt = jnp.int32(1)
        c = run(salt, x)
        float(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = run(c, x)
        float(c)
        return (time.perf_counter() - t0) / iters

    # conv FLOPs of the stage (dots only, relu/adds excluded):
    px = n_tiles * hr * hr
    per53 = 2 * px * feats * feats * (9 + 25 + 25 + 9)
    out_fl = 2 * px * feats * 3 * 9
    flops = m.n_tail53 * per53 + out_fl

    results: dict = {"n_tiles": n_tiles, "hr": hr, "feats": feats,
                     "conv_tflop": round(flops / 1e12, 3)}
    variants = {
        "naked_int8": (tail_naked, x8, INT8_CEIL_TFLOPS),
        "full_int8": (tail_full, xb, INT8_CEIL_TFLOPS),
        "bf16": (tail_bf16, xb, BF16_CEIL_TFLOPS),
    }
    for name, (fn, x, ceil) in variants.items():
        dt = timed(fn, x)
        tflops = flops / dt / 1e12
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops": round(tflops, 1),
            "pct_of_ceiling": round(100 * tflops / ceil, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    ideal_ms = flops / (INT8_CEIL_TFLOPS * 1e12) * 1e3
    naked_ms = results["naked_int8"]["ms"]
    full_ms = results["full_int8"]["ms"]
    results["decomposition_ms"] = {
        "ideal_at_374.5_tflops": round(ideal_ms, 3),
        "mxu_scheduling_term": round(naked_ms - ideal_ms, 3),
        "epilogue_term": round(full_ms - naked_ms, 3),
        "total_deficit": round(full_ms - ideal_ms, 3),
    }
    print(json.dumps(results["decomposition_ms"]), flush=True)

    path = "AUDIT_TAIL_DECOMP.json"
    blob = json.load(open(path)) if os.path.exists(path) else {}
    blob[f"n{n_tiles}_hr{hr}_f{feats}"] = results
    with open(path, "w") as f:
        json.dump(blob, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
