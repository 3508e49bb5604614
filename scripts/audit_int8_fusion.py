"""int8 epilogue fusion audit (ROADMAP perf item): does XLA fuse the
quantize (bf16 -> s8 round/clip) and dequant (s32 -> bf16 scale) chains
around each conv into the conv fusions, or does it materialise int32 conv
outputs / standalone convert kernels in HBM?

Method: compile (no run) the production int8 programs for the TPU backend
and inspect the optimized HLO + XLA's cost model:
  * count `convolution` ops by operand dtype (s8 vs bf16),
  * count top-level fusions whose root/body contains convert/round chains
    (fused epilogues) vs standalone convert/copy instructions (materialised
    boundaries),
  * report cost_analysis bytes-accessed vs the analytic minimum
    (weights + in + out once), flops, and the implied roofline ms at
    819 GB/s HBM.

Run:  python scripts/audit_int8_fusion.py          (TPU relay, compile only)
Env: IEK_AUDIT_SIZE (512), IEK_AUDIT_CHUNK (8) for the split2d tail tile
batch (134 = 128 + 2*3 halo at the serving geometry).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _analyze(name: str, lowered, nbytes_min: float) -> dict:
    compiled = lowered.compile()
    txt = compiled.as_text()
    lines = txt.splitlines()
    convs = [ln for ln in lines if "convolution(" in ln or " convolution " in ln]
    # operand dtypes are not on the conv line — resolve each operand name
    # through a name->dtype map built from every defining instruction
    dtype_of = {}
    for ln in lines:
        m = re.match(r"\s*(%?[\w.\-]+) = ([a-z0-9]+)\[", ln)
        if m:
            dtype_of[m.group(1).lstrip("%")] = m.group(2)
    s8_convs = []
    for ln in convs:
        m = re.search(r"convolution\(([^)]*)\)", ln)
        ops = [o.strip().lstrip("%") for o in m.group(1).split(",")] if m else []
        if any(dtype_of.get(o) == "s8" for o in ops):
            s8_convs.append(ln)
    # standalone converts = convert instructions in the ENTRY computation
    # only; converts inside fused-computation bodies are fused epilogues,
    # not materialised boundaries (counting them overstated the audit)
    entry_lines, in_entry = [], False
    for ln in lines:
        if ln.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if ln.startswith("}"):
                break
            entry_lines.append(ln)
    standalone_convert = [
        ln for ln in entry_lines
        if re.match(r"\s+\S+ = (bf16|f32|s8|s32)\[[^\]]*\] convert\(", ln)
    ]
    # ENTRY-only, like the converts: a copy inside a fusion body is not a
    # materialised HBM boundary
    copies = [ln for ln in entry_lines if re.search(r"\] copy\(", ln)]
    fusions = [ln for ln in lines if re.search(r"\] fusion\(", ln)]
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        bytes_acc = float(ca.get("bytes accessed", float("nan")))
        flops = float(ca.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        bytes_acc, flops = float("nan"), float("nan")
        print(f"cost_analysis failed: {e}", flush=True)
        print(f"cost_analysis failed: {e}", file=sys.stderr)
    rep = {
        "program": name,
        "conv_ops": len(convs),
        "s8_conv_ops": len(s8_convs),
        "standalone_converts": len(standalone_convert),
        "copy_ops": len(copies),
        "fusion_ops": len(fusions),
        "bytes_accessed_GB": round(bytes_acc / 1e9, 3),
        "bytes_min_GB": round(nbytes_min / 1e9, 3),
        "traffic_x_min": round(bytes_acc / nbytes_min, 2) if nbytes_min else None,
        "roofline_ms_at_819GBs": round(bytes_acc / 819e9 * 1e3, 2),
        "tflops": round(flops / 1e12, 2),
    }
    print(json.dumps(rep), flush=True)
    return rep


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.models import didbl_pallas as dp

    size = int(os.environ.get("IEK_AUDIT_SIZE", "512"))
    chunk = int(os.environ.get("IEK_AUDIT_CHUNK", "8"))

    r = SuperResolver(model="didbl", dtype=jnp.bfloat16, forward="int8")
    qp = r._fwd_params()
    m = r.module

    def tree_bytes(tree, keys=None):
        """Actual stored bytes of (a subset of) the quantized tree."""
        total = 0
        for k, v in tree.items():
            if keys is not None and not any(k.startswith(p) for p in keys):
                continue
            for leaf in jax.tree_util.tree_leaves(v):
                total += np.asarray(leaf).nbytes
        return float(total)

    import numpy as np

    # --- full int8 fast forward at size^2 --------------------------------
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    fwd = jax.jit(lambda qp, x: dp.apply_didbl_int8_xla(
        qp, x, n_body53=m.n_body53, n_light=m.n_light, n_tail53=m.n_tail53,
        scale=m.scale))
    # analytic min traffic: uint-ish in + f32 out + weights once; feature
    # maps ideally stay fused (body 512^2x128 bf16 between blocks is the
    # real question — count it once per block boundary read+write)
    w_bytes = tree_bytes(qp)  # ACTUAL stored bytes (didbl ~21.8M params;
    #                           the r3 audit used a 1.55MB guess, skewing
    #                           every recorded ratio ~1.4x — see ROADMAP)
    min_b = size * size * 3 * 4 + 16 * size * size * 3 * 4 + w_bytes
    f = _analyze(f"int8_fast_{size}", fwd.lower(qp, x), min_b)

    # --- split2d tail chunk (the serving mode's hot program) -------------
    t = 128 + 2 * 3
    h = jnp.zeros((chunk, t, t, 128), jnp.bfloat16)
    tail = jax.jit(lambda qp, h: dp.apply_didbl_int8_xla_tail(
        qp, h, n_tail53=m.n_tail53, scale=m.scale))
    w_tail = tree_bytes(qp, keys=("tail53_", "subpixel_conv", "out", "level1"))
    min_tail = (chunk * t * t * 128 * 2          # read body tiles bf16
                + chunk * (4 * t) ** 2 * 128 * 1  # s8 upsampled map (ideal)
                + chunk * (4 * t) ** 2 * 3 * 4    # f32 out
                + w_tail)  # only the tail's weights are read here
    tl = _analyze(f"int8_split2d_tail_c{chunk}", tail.lower(qp, h), min_tail)

    # --- int8 body at size^2 (whole-frame, the 45 ms piece) --------------
    body = jax.jit(lambda qp, x: dp.apply_didbl_int8_xla_body(
        qp, x, n_body53=m.n_body53, n_light=m.n_light))
    # per-block boundary: bf16 feature map written+read once per block is
    # the fused-ideal (skip connections force materialisation)
    blocks = m.n_body53 + m.n_light
    w_body = tree_bytes(qp, keys=("body53_", "light_", "level1"))
    min_body = (size * size * 3 * 4
                + 2 * blocks * size * size * 128 * 2 + w_body)
    bd = _analyze(f"int8_body_{size}", body.lower(qp, x), min_body)

    rep = {"audit": [f, tl, bd]}
    print(json.dumps(rep), flush=True)
    def denan(o):  # json.dump would emit bare NaN (invalid JSON)
        if isinstance(o, float) and o != o:
            return None
        if isinstance(o, dict):
            return {k: denan(v) for k, v in o.items()}
        if isinstance(o, list):
            return [denan(v) for v in o]
        return o

    rep = denan(rep)
    out = os.environ.get("IEK_AUDIT_OUT", "AUDIT_FUSION.json")
    with open(out, "w") as fp:
        json.dump(rep, fp, indent=4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
