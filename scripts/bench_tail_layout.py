"""Layout levers for the int8 tail's MXU-scheduling term (VERDICT r4 next-3,
contingent branch: run ONLY if AUDIT_TAIL_DECOMP.json shows the scheduling
term dominating the epilogue term).

bench_tail_decompose.py's `naked` variant isolates how far XLA's conv
scheduling sits from the measured 374.5 TFLOP/s int8 ceiling with ALL
epilogue work stripped.  If that gap is the deficit's major term, the only
remaining levers are layout-shaped (the conv graph itself is fixed by the
model).  This times the SAME naked conv chain (2x light53 + out conv) under:

  nhwc       — production layout, (T, hr, hr, C): the stage-A baseline.
  nchw       — feature-major (T, C, hr, hr) with OIHW kernels: TPU XLA
               usually prefers NHWC, but the int8 path was never checked.
  batch2     — (T/4, hr, 4*hr, C): same pixels, fewer/bigger spatials —
               probes whether per-tile launch/tiling overhead at T=8 is
               the scheduling cost (split2d could merge chunk tiles into
               strips before the tail if this wins).
  batch1     — (1, hr, T*hr, C): the extreme of the same lever.
  merged55   — conv_a1(3x3) zero-padded to 5x5 and stacked with conv_b1
               onto one 5x5 conv with 2C output channels (one read of x,
               one launch, +47% dot FLOPs): wins only if the scheduler's
               per-conv overhead outweighs the extra MACs.

All variants compute the identical dot set (merged55 computes a superset)
on the same random int8 operand, so ms is directly comparable; TFLOP/s is
reported against the PRODUCTION flop count for comparability (merged55's
own-rate is also printed).

Run ON THE TPU: python scripts/bench_tail_layout.py [tiles] [hr] [feats]
Appends to AUDIT_TAIL_LAYOUT.json; conclusions go to SERVING.md/ROADMAP.md.
Reference target: the tail of /root/reference/models.py:1194-1199 at
TPU-native speed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INT8_CEIL_TFLOPS = 374.5


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models import didbl_pallas as dp

    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hr = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    feats = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    iters = int(os.environ.get("IEK_LAYOUT_ITERS", "4"))

    r = SuperResolver(model="didbl", dtype=jnp.bfloat16, mode="split",
                      forward="int8", split_tile=hr // 4, split_tile_w=hr // 4,
                      model_kwargs={"features": feats})
    qp = r._fwd_params()
    m = r.module

    def qconv(x8, w8, dn=("NHWC", "HWIO", "NHWC")):
        return lax.conv_general_dilated(
            x8, w8, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16,
        )

    def naked53(x8, p, dn):
        a = qconv(x8, p["conv_a1"]["qf"], dn)
        a = qconv(jnp.maximum(a, 0).astype(jnp.int8), p["conv_a2"]["qf"], dn)
        b = qconv(x8, p["conv_b1"]["qf"], dn)
        b = qconv(jnp.maximum(b, 0).astype(jnp.int8), p["conv_b2"]["qf"], dn)
        return jnp.clip(a + b, -127, 127).astype(jnp.int8)

    def tail(x8, dn=("NHWC", "HWIO", "NHWC")):
        h = x8
        for i in range(m.n_tail53):
            h = naked53(h, qp[f"tail53_{i}"], dn)
        return h

    # out conv mirrors stage A: unquantized bf16 (level1/out stay f32 in the
    # production scheme) — same for every variant so it cancels.
    def tail_out(h8, dn_out=("NHWC", "HWIO", "NHWC")):
        return lax.conv_general_dilated(
            h8.astype(jnp.bfloat16), qp["out"]["kernel"].astype(jnp.bfloat16),
            (1, 1), "SAME", dimension_numbers=dn_out,
        ) + qp["out"]["bias"].astype(jnp.bfloat16)

    def fn_nhwc(x8):
        return tail_out(tail(x8)).astype(jnp.float32)

    NCHW = ("NCHW", "OIHW", "NCHW")

    def fn_nchw(x8):  # x8 arrives (T, C, H, W); kernels transposed inside jit
        h = x8
        for i in range(m.n_tail53):
            p = qp[f"tail53_{i}"]
            pt = {k: {"qf": jnp.transpose(p[k]["qf"], (3, 2, 0, 1))}
                  for k in ("conv_a1", "conv_a2", "conv_b1", "conv_b2")}
            h = naked53(h, pt, NCHW)
        w = jnp.transpose(qp["out"]["kernel"], (3, 2, 0, 1)).astype(jnp.bfloat16)
        out = lax.conv_general_dilated(
            h.astype(jnp.bfloat16), w, (1, 1), "SAME", dimension_numbers=NCHW)
        out = out + qp["out"]["bias"].astype(jnp.bfloat16).reshape(1, -1, 1, 1)
        return out.astype(jnp.float32)

    def merged53(x8, p, wm):
        ab = qconv(x8, wm)  # (.., 2C): [:C]=a1 (3x3 padded), [C:]=b1
        a = qconv(jnp.maximum(ab[..., :feats], 0).astype(jnp.int8),
                  p["conv_a2"]["qf"])
        b = qconv(jnp.maximum(ab[..., feats:], 0).astype(jnp.int8),
                  p["conv_b2"]["qf"])
        return jnp.clip(a + b, -127, 127).astype(jnp.int8)

    def fn_merged(x8):
        h = x8
        for i in range(m.n_tail53):
            p = qp[f"tail53_{i}"]
            a1 = jnp.pad(p["conv_a1"]["qf"], ((1, 1), (1, 1), (0, 0), (0, 0)))
            wm = jnp.concatenate([a1, p["conv_b1"]["qf"]], axis=-1)
            h = merged53(h, p, wm)
        return tail_out(h).astype(jnp.float32)

    rng = np.random.default_rng(0)
    base = rng.integers(-100, 100, (n_tiles, hr, hr, feats)).astype(np.int8)

    def timed(fn, x_np) -> float:
        x = jax.device_put(jnp.asarray(x_np))

        @jax.jit
        def run(salt, t):
            t = t + (salt % 2).astype(t.dtype)
            y = fn(t)
            return jnp.sum(
                y[:, ::97, ::97].astype(jnp.float32)
            ).astype(jnp.int32) + salt

        c = run(jnp.int32(1), x)
        float(c)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = run(c, x)
        float(c)
        return (time.perf_counter() - t0) / iters

    px = n_tiles * hr * hr
    flops = m.n_tail53 * 2 * px * feats * feats * (9 + 25 + 25 + 9) \
        + 2 * px * feats * 3 * 9
    flops_merged = m.n_tail53 * 2 * px * feats * feats * (50 + 25 + 9) \
        + 2 * px * feats * 3 * 9

    variants = {
        "nhwc": (fn_nhwc, base),
        "nchw": (fn_nchw, np.transpose(base, (0, 3, 1, 2)).copy()),
        "batch1": (fn_nhwc, base.reshape(1, n_tiles * hr, hr, feats)),
        "merged55": (fn_merged, base),
    }
    if n_tiles % 4 == 0:
        variants["batch2"] = (
            fn_nhwc, base.reshape(n_tiles // 4, 4 * hr, hr, feats))
    results: dict = {"n_tiles": n_tiles, "hr": hr, "feats": feats,
                     "conv_tflop": round(flops / 1e12, 3)}
    for name, (fn, x_np) in variants.items():
        dt = timed(fn, x_np)
        tflops = flops / dt / 1e12
        row = {"ms": round(dt * 1e3, 3), "tflops_vs_prod_flops": round(tflops, 1),
               "pct_of_ceiling": round(100 * tflops / INT8_CEIL_TFLOPS, 1)}
        if name == "merged55":
            row["own_tflops"] = round(flops_merged / dt / 1e12, 1)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    path = os.environ.get("IEK_LAYOUT_OUT", "AUDIT_TAIL_LAYOUT.json")
    blob = json.load(open(path)) if os.path.exists(path) else {}
    blob[f"n{n_tiles}_hr{hr}_f{feats}"] = results
    with open(path, "w") as f:
        json.dump(blob, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
