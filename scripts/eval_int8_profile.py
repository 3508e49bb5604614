"""int8 serving-profile quality gate: f32 vs bf16 vs pallas_int8 on the
shipped checkpoint, NTIRE protocol.  Appends rows to EVAL_PROFILES.json and
prints the int8 SSIM-Y delta (target <= 0.003 vs bf16 — VERDICT r1 item 5).

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
        # serving default: real-data calibration (engine int8_calib="images")
        "int8_fast": (dict(dtype=jnp.bfloat16, forward="int8"), {}),
        # r2 default, kept for comparison: synthetic calibration tiles
        "int8_fast_syncal": (dict(dtype=jnp.bfloat16, forward="int8"),
                             {"int8_calib": "synthetic"}),
        # hybrid: static per-channel body + dynamic per-sample tail
        "int8_fast_dyntail": (dict(dtype=jnp.bfloat16, forward="int8"),
                              {"int8_dynamic_tail": True}),
        "int8_pallas_fast": (dict(dtype=jnp.bfloat16, forward="pallas_int8"), {}),
        # held-out calibration: activation scales from procedural dead-leaves
        # images only (NEVER the eval images) — the default int8_calib_dir is
        # data_set5, which overlaps the gate's eval set; this row measures
        # the gate without that circularity (r3 review finding)
        "int8_fast_excal": (dict(dtype=jnp.bfloat16, forward="int8"),
                            {"int8_calib_dir": "__procedural__"}),
    }
    only = os.environ.get("IEK_PROFILES")
    if only:
        keep = only.split(",")
        profiles = {k: v for k, v in profiles.items() if k in keep}
    path = "EVAL_PROFILES.json"
    results = json.load(open(path)) if os.path.exists(path) else {}
    tag = "" if model == "didbl" else f"{model}_"
    proc_dir = None
    for name, (kw, opts) in profiles.items():
        r = SuperResolver(model=model, weights=weights, mode="fast", **kw)
        for k, v in opts.items():
            if k == "int8_calib_dir" and v == "__procedural__":
                if proc_dir is None:
                    from image_enhance_keras_tpu.data.io import imwrite
                    from image_enhance_keras_tpu.data.pipeline import (
                        rich_synthetic_images,
                    )

                    proc_dir = tempfile.mkdtemp(prefix="int8_excal_")
                    for i, im in enumerate(
                        rich_synthetic_images(8, 256, seed=17)
                    ):
                        imwrite(os.path.join(proc_dir, f"p{i}.png"), im)
                v = proc_dir
            setattr(r, k, v)
        _, means = evaluate_resolver_on_dir(r, tmp, scale=4, verbose=False)
        results[f"{tag}{name}_{len(picked)}img"] = means
        print(json.dumps({name: means}), flush=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2)

    k = f"{len(picked)}img"
    bf, i8 = results.get(f"{tag}bf16_fast_{k}"), results.get(f"{tag}int8_fast_{k}")
    if bf and i8:
        d = bf["ssim_y"] - i8["ssim_y"]
        print(json.dumps({"int8_ssim_y_delta_vs_bf16": round(d, 5),
                          "gate": "PASS" if abs(d) <= 0.003 else "FAIL"}),
              flush=True)
    else:
        # a filtered IEK_PROFILES run may not produce both gate rows
        print(json.dumps({"gate": "SKIPPED (bf16_fast/int8_fast rows absent)"}),
              flush=True)
    shutil.rmtree(tmp, ignore_errors=True)
    if proc_dir:
        shutil.rmtree(proc_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
