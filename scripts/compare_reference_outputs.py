"""Behavioral closeness vs the reference's committed production outputs.

``/root/reference/val_images/set5nitre/<img>_GT_scaled(1x).bmp`` are four
real outputs of the reference's production model (``weights025`` h5, an
unavailable external download) run on the 288-square GTs via
``upscaleStepPatch(scale_factor=1, scalemulti=4, patch_size=96)``
(reference main_dirpath.py:53, models.py:184-248).  There is no 1152-square
ground truth for these, so the only possible comparison is output-vs-output:
how close is OUR best didbl artifact's ``model(GT)`` to the reference
production model's ``model(GT)`` on the same four inputs?

This is the first direct behavioral comparison with the real production
model (VERDICT r4 next-2b).  Scored under the scorpath conventions
(crop 10, Y channel, data_range 255).  Writes PARITY_REF_OUTPUTS.json;
summarized in PARITY.md.

Run on the TPU (four 288->1152 patch_ref upscales).  The committed demo
checkpoint is Set5-trained — like the reference model, it has seen these
GTs, so this measures artifact-vs-artifact behavior, not generalization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_DIR = "/root/reference/val_images/set5nitre"
FOLDS = ("bird", "butterfly", "head", "woman")


def main() -> int:
    from image_enhance_keras_tpu.data.io import imread
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.eval.scorer import score_pair

    if not os.path.isdir(REF_DIR):
        raise SystemExit(f"reference checkout not present: {REF_DIR}")

    # reference-exact serving config: patch mode, 96/64/8 geometry, the
    # reference's truncating uint8 cast, our best committed didbl artifact
    weights = os.environ.get(
        "IEK_COMPARE_WEIGHTS", "weights_Double/didbl_set5demo.npz"
    )
    if not os.path.isfile(weights):
        raise SystemExit(f"demo checkpoint not found: {weights}")
    resolver = SuperResolver(
        model="didbl", weights=weights, mode="patch", geometry="ref",
        round_mode="trunc",
    )

    results: dict = {
        "protocol": (
            "output-vs-output: OUR didbl demo checkpoint's model(GT) vs the "
            "reference production model's committed model(GT) "
            "(val_images/set5nitre/<img>_GT_scaled(1x).bmp), same four "
            "288-square GT inputs, reference-exact serving config "
            "(patch/ref-geometry/trunc); scorpath conventions "
            "(crop 10, Y, data_range 255).  No 1152-square ground truth "
            "exists, so 'psnr_y'/'ssim_y' here measure behavioral "
            "closeness between the two artifacts, not quality."
        ),
        "our_weights": weights,
        "backend": __import__("jax").default_backend(),
        "folds": {},
    }
    for fold in FOLDS:
        t0 = time.time()
        gt = imread(f"{REF_DIR}/{fold}_GT.bmp")
        ref_out = imread(f"{REF_DIR}/{fold}_GT_scaled(1x).bmp")
        ours = resolver.upscale(gt)
        assert ours.shape == ref_out.shape, (ours.shape, ref_out.shape)
        s = score_pair(ref_out, ours, name=fold, crop_border=10)
        diff = np.abs(ours.astype(np.int16) - ref_out.astype(np.int16))
        results["folds"][fold] = {
            "psnr_y_vs_ref_out": s.psnr_y,
            "ssim_y_vs_ref_out": s.ssim_y,
            "ssim_rgb_vs_ref_out": s.ssim_rgb,
            "mean_abs_diff": float(diff.mean()),
            "p99_abs_diff": float(np.percentile(diff, 99)),
            "max_abs_diff": int(diff.max()),
            "sec": round(time.time() - t0, 1),
        }
        print(json.dumps({fold: results["folds"][fold]}), flush=True)

    vals = results["folds"].values()
    results["mean"] = {
        k: float(np.mean([v[k] for v in vals]))
        for k in ("psnr_y_vs_ref_out", "ssim_y_vs_ref_out",
                  "ssim_rgb_vs_ref_out", "mean_abs_diff")
    }
    with open("PARITY_REF_OUTPUTS.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["mean"]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
