"""Train a zoo-model demo checkpoint on the Set5 GTs (+ synthetic textures)
and score it under the CLI workflow (degrade -> upscale -> scorpath
protocol), appending image-level rows to EVAL_ZOO.json.

This is the same demo-checkpoint regime as the r1/r2 zoo rows (EVAL.md zoo
table): Set5-trained, so the scores bracket fit quality, not held-out
generalisation (EVAL_LOO.json is the held-out protocol).

Run on the TPU:
    IEK_ZOO_STEPS=10000 python scripts/train_zoo_demo.py didbl_subpixel

Env: IEK_ZOO_STEPS (10000), IEK_ZOO_LR (2e-4), IEK_ZOO_IMAGES (2 — image
count for the eval rows; 2 = the {bird, butterfly} subset convention).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SET5 = ["baby", "bird", "butterfly", "head", "woman"]


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "didbl_subpixel"
    steps = int(os.environ.get("IEK_ZOO_STEPS", "10000"))
    lr = float(os.environ.get("IEK_ZOO_LR", "2e-4"))
    n_eval = int(os.environ.get("IEK_ZOO_IMAGES", "2"))
    spe = 500
    epochs = max(1, steps // spe)
    steps = epochs * spe  # the ACTUAL step budget (records must not lie)

    from image_enhance_keras_tpu.data.io import imread
    from image_enhance_keras_tpu.data.pipeline import synthetic_images
    from image_enhance_keras_tpu.train.trainer import Trainer
    from image_enhance_keras_tpu.utils.config import Config
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.eval import evaluate_resolver_on_dir

    gts = [imread(f"data_set5/{n}_GT.png") for n in SET5]
    train_imgs = gts + list(synthetic_images(16, 256))

    ckpt_dir = f"weights_demo_{model}"
    # a previous run's index.json would gate best-promotion against the OLD
    # run's metric (restore_best would then export stale weights under this
    # run's provenance): fresh runs archive the checkpoint STATE aside
    # (index/best/latest only — committed npz artifacts stay in place)
    if not os.environ.get("IEK_ZOO_RESUME") and os.path.exists(
        os.path.join(ckpt_dir, "index.json")
    ):
        import shutil as _sh

        prev = ckpt_dir + ".prev"
        _sh.rmtree(prev, ignore_errors=True)
        os.makedirs(prev)
        for item in ("index.json", "best", "latest", "history.json",
                     "latest_ema.npz", "best_ema.npz"):
            src = os.path.join(ckpt_dir, item)
            if os.path.exists(src):
                os.rename(src, os.path.join(prev, item))
        print(f"archived previous checkpoint state -> {prev}", flush=True)
    cfg = Config(
        model=model,
        batch_size=16,
        lr=lr,
        lr_patch=24,
        epochs=epochs,
        steps_per_epoch=spe,
        checkpoint_dir=ckpt_dir,
        lr_schedule="cosine",
        clip_norm=1.0,
        monitor="val_ssim_y",
        augment=True,
    )
    t0 = time.time()
    trainer = Trainer(cfg, train_images=train_imgs, val_images=gts[:2])
    if os.environ.get("IEK_ZOO_RESUME"):
        trainer.resume()
    trainer.fit()
    print(f"trained {model} {steps} steps in {time.time() - t0:.0f}s", flush=True)

    # export the npz distribution artifact next to the orbax dirs
    from image_enhance_keras_tpu.train.checkpoints import export_params_npz

    best = trainer.ckpt.restore_best(like=trainer.state)
    params = best.params if best is not None else trainer.state.params
    npz = os.path.join(ckpt_dir, f"{model}_set5demo.npz")
    # fp16 storage halves the committed artifact; quality-neutral (EVAL.md)
    export_params_npz(npz, params, dtype=np.float16)

    # CLI-workflow image eval: degrade GT /4, upscale, score (scorpath
    # protocol) — the same flow the zoo table rows use
    import tempfile
    import shutil

    tmp = tempfile.mkdtemp(prefix="zoo_eval_")
    for n in SET5[:n_eval] if n_eval != 2 else ["bird", "butterfly"]:
        shutil.copy(f"data_set5/{n}_GT.png", tmp)
    r = SuperResolver(model=model, params=params, mode="fast")
    scores, means = evaluate_resolver_on_dir(r, tmp, scale=4, verbose=True)
    shutil.rmtree(tmp, ignore_errors=True)

    path = "EVAL_ZOO.json"
    results = json.load(open(path)) if os.path.exists(path) else {}
    results[model] = {
        **means, "steps": steps, "n_eval_images": n_eval,
        "per_image": {
            sc.name: {"psnr_y": round(sc.psnr_y, 4),
                      "ssim_y": round(sc.ssim_y, 4)}
            for sc in scores
        },
    }
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({model: results[model]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
