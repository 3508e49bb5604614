"""One-shot quality evaluation: bicubic baseline + a checkpoint, NTIRE
protocol, over a directory of HR ground truths.

Run:  python scripts/eval_full.py [gt_dir] [weights] [--fast] [--ensemble]
      [--bp=N]
Env:  IEK_MODEL (didbl) selects the zoo family for the checkpoint;
      IEK_EVAL_OUT overrides the output path (EVAL_RESULTS.json).
--ensemble adds the x8 geometric self-ensemble on top of the chosen mode.
--bp=N adds N iterative back-projection steps (ops/backproject.py).
Defaults: data_set5, weights_Double/didbl_set5demo.npz, tiled parity mode.
Writes EVAL_RESULTS.json next to the repo root.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fast = "--fast" in sys.argv
    ensemble = "--ensemble" in sys.argv
    bp = 0
    for a in sys.argv[1:]:
        if a.startswith("--bp="):
            bp = int(a.split("=", 1)[1])
    gt_dir = args[0] if args else "data_set5"
    weights = args[1] if len(args) > 1 else "weights_Double/didbl_set5demo.npz"
    model = os.environ.get("IEK_MODEL", "didbl")

    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.eval import evaluate_resolver_on_dir
    from image_enhance_keras_tpu.eval.evaluate import BicubicResolver

    print("=== bicubic baseline ===", flush=True)
    _, mb = evaluate_resolver_on_dir(BicubicResolver(4), gt_dir, scale=4)
    print(f"=== {model} ({weights}) ===", flush=True)
    r = SuperResolver(model=model, weights=weights,
                      mode="fast" if fast else "patch",
                      self_ensemble=ensemble, back_projection=bp)
    _, mm = evaluate_resolver_on_dir(r, gt_dir, scale=4)
    out = {"bicubic": mb, model: mm, "weights": weights,
           "mode": ("fast" if fast else "patch") + ("+x8" if ensemble else "")
           + (f"+bp{bp}" if bp else "")}
    with open(os.environ.get("IEK_EVAL_OUT", "EVAL_RESULTS.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
