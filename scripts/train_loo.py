"""Leave-one-out held-out quality run (VERDICT r1 item 2).

For each Set5 image: train didbl on the OTHER four GTs (+ procedural
synthetic textures), then score the trained model on the held-out image
under the scorpath protocol.  Every eval image is therefore unseen by the
model that scores it — unlike the round-1 demo checkpoints (trained on the
eval images) and unlike the reference's own headline (training set
unpublished, models.py:1064-1068 suggest Set5-adjacent tuning).

Writes EVAL_LOO.json with per-fold and aggregate scores.
Run on the TPU; ~N_STEPS*5 total train steps.
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
    from image_enhance_keras_tpu.data.io import imread
    from image_enhance_keras_tpu.data.pipeline import synthetic_images
    from image_enhance_keras_tpu.train.trainer import Trainer
    from image_enhance_keras_tpu.utils.config import Config
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.eval.evaluate import degrade
    from image_enhance_keras_tpu.eval.scorer import score_pair

    steps = int(os.environ.get("IEK_LOO_STEPS", "20000"))
    spe = 500
    epochs = max(1, steps // spe)
    steps = epochs * spe  # the ACTUAL step budget (records must not lie)
    only_env = os.environ.get("IEK_LOO_ONLY")  # comma list of fold names
    only = None
    if only_env:
        only = {t.strip() for t in only_env.split(",") if t.strip()}
        bad = only - set(SET5)
        if bad:
            raise SystemExit(f"IEK_LOO_ONLY: unknown folds {sorted(bad)}; "
                             f"valid: {SET5}")
    # IEK_LOO_EMA: EMA decay (e.g. 0.999); the fold is then scored on the
    # EMA shadow weights — the artifact an EMA-trained run would serve
    ema = float(os.environ.get("IEK_LOO_EMA", "0"))
    # IEK_LOO_BLUR: training degradation blur sigma.  Default 0.5 = the
    # reference's training prep (img_utils.py:101) and every recorded LOO
    # protocol.  The EVAL degradation is plain PIL-bicubic with NO blur
    # (eval/evaluate.py:30, mirroring the reference's _evaluate,
    # models.py:1545-1560) — 0 trains on exactly the serving distribution
    blur = float(os.environ.get("IEK_LOO_BLUR", "0.5"))
    # corpus=rich: textured dead-leaves + pink-noise procedural corpus
    # (data/pipeline.rich_synthetic_images) with colors sampled from the
    # fold's TRAIN-side images only; writes EVAL_LOO_RICH.json so the
    # legacy-corpus numbers stay comparable.
    # default matches the scorer scripts (score_loo_ensemble/variants):
    # the current protocol is the rich corpus; legacy is the r2 baseline
    corpus = os.environ.get("IEK_LOO_CORPUS", "rich")
    # IEK_LOO_MOA: CutBlur-family mixture-of-augmentations probability
    # (data/augment.py) — the r5 held-out attack (VERDICT r4 next-1)
    moa = float(os.environ.get("IEK_LOO_MOA", "0"))
    # IEK_LOO_SEED: training seed (sampler + init).  Non-zero runs exist to
    # put an error bar on the LOO bracket (VERDICT r4 next-7) — use with
    # IEK_LOO_OUT + IEK_LOO_CKPT_ROOT so seed runs never clobber seed-0 rows
    seed = int(os.environ.get("IEK_LOO_SEED", "0"))
    # IEK_LOO_KW: JSON dict of model kwargs (e.g. '{"features":192}' or
    # '{"n_body53":24}') — the capacity probe (VERDICT r4 next-1b)
    model_kw = json.loads(os.environ.get("IEK_LOO_KW", "{}"))

    from image_enhance_keras_tpu.utils.paths import find_repo_asset

    set5_dir = find_repo_asset("data_set5") or "data_set5"
    gts = {n: imread(f"{set5_dir}/{n}_GT.png") for n in SET5}
    synth = synthetic_images(16, 256) if corpus == "legacy" else None

    results = {"steps_per_fold": steps, "folds": {}}
    out_path = {
        "legacy": "EVAL_LOO.json",
        "rich": "EVAL_LOO_RICH.json",
        "rich_fiber": "EVAL_LOO_FIBER.json",
        # rich corpus + the real photos bundled in installed packages
        # (pipeline.builtin_photos: china/flower/grace_hopper) on the
        # REAL side of the sampling mass — never eval images, so every
        # fold may train on them
        "rich_photo": "EVAL_LOO_PHOTO.json",
    }.get(corpus, "EVAL_LOO_RICH.json")
    out_path = os.environ.get("IEK_LOO_OUT", out_path)
    if os.path.exists(out_path):
        results = json.load(open(out_path))
        results["steps_per_fold"] = steps

    for fold in SET5:
        if only and fold not in only:
            continue
        if fold in results["folds"]:
            print(f"fold {fold}: already done, skipping", flush=True)
            continue
        t0 = time.time()
        fold_gts = [gts[n] for n in SET5 if n != fold]
        fold_real = list(fold_gts)
        if corpus == "rich_photo":
            from image_enhance_keras_tpu.data.pipeline import builtin_photos

            photos = builtin_photos()
            if not photos:
                raise SystemExit(
                    "corpus=rich_photo but no builtin package photos were "
                    "found — run with corpus=rich instead"
                )
            fold_real += photos
        if corpus == "legacy":
            fold_synth = list(synth)
        else:
            from image_enhance_keras_tpu.data.pipeline import (
                rich_synthetic_images,
            )

            n_rich = int(os.environ.get("IEK_LOO_RICH_N", "16"))
            fold_synth = rich_synthetic_images(
                n_rich, 256, seed=0, palette_images=fold_real,
                fibers=(corpus == "rich_fiber"),
            )
        train_imgs = fold_real + fold_synth
        # IEK_LOO_GT_MASS pins the real-GT sampling fraction regardless of
        # synthetic count (uniform sampling dilutes 4 GTs to 7.7% at n=48 —
        # the measured regression of the first rich-corpus probe)
        gt_mass = os.environ.get("IEK_LOO_GT_MASS")
        weights = None
        if gt_mass not in (None, ""):
            from image_enhance_keras_tpu.data.pipeline import (
                pinned_mass_weights,
            )

            weights = pinned_mass_weights(
                len(fold_real), len(fold_synth), float(gt_mass)
            )
            if weights is None:
                print(f"fold {fold}: IEK_LOO_GT_MASS={gt_mass} ignored "
                      f"(one corpus side is empty)", flush=True)
            elif float(gt_mass) <= 0.0:
                print(f"fold {fold}: IEK_LOO_GT_MASS=0 pins the real GTs "
                      f"to ZERO sampling mass (synthetic-only run)",
                      flush=True)
        # IEK_LOO_CKPT_ROOT keeps concurrent probe variants (e.g. a blur=0
        # run of the same corpus) from clobbering each other's fold
        # checkpoints, which score_loo_ensemble re-scores later
        ckpt_root = os.environ.get("IEK_LOO_CKPT_ROOT", "/tmp")
        ckpt_dir = f"{ckpt_root}/loo_{corpus}_{fold}"
        cfg = Config(
            model="didbl",
            lr=2e-4,
            lr_schedule="cosine",
            batch_size=16,
            lr_patch=24,
            augment=True,
            epochs=epochs,
            steps_per_epoch=spe,
            ckpt_every=1000000,  # only the final save matters
            checkpoint_dir=ckpt_dir,
            monitor="val_psnr",  # patch-level on TRAIN-side images only
            ema_decay=ema,
            blur_sigma=blur,
            # IEK_LOO_LOSS: pixel loss probe (mse | charbonnier | l1)
            loss=os.environ.get("IEK_LOO_LOSS", "mse"),
            seed=seed,
            moa=moa,
            model_kwargs=dict(model_kw),
        )
        # val patches from the training images only — the held-out image
        # must not influence any training-time decision
        trainer = Trainer(
            cfg, train_images=train_imgs, val_images=train_imgs[:2],
            train_weights=weights,
        )
        trainer.fit()

        fold_params = (
            trainer.state.ema if trainer.state.ema is not None
            else trainer.state.params
        )
        resolver = SuperResolver(
            model="didbl", params=fold_params, mode="fast",
            model_kwargs=dict(model_kw) or None,
        )
        gt = gts[fold]
        h, w = (gt.shape[0] // 4) * 4, (gt.shape[1] // 4) * 4
        gt = gt[:h, :w]
        sr = resolver.upscale(degrade(gt, 4))
        s = score_pair(gt, sr, name=fold, crop_border=10)
        results["folds"][fold] = {
            "psnr_y": s.psnr_y, "ssim_y": s.ssim_y, "ssim_rgb": s.ssim_rgb,
            "train_sec": round(time.time() - t0, 1),
            # per-fold provenance: resumed files can mix configs, so the
            # top-level steps_per_fold alone cannot be trusted for old rows
            "steps": steps,
        }
        if corpus != "legacy":
            results["folds"][fold]["n_synth"] = len(fold_synth)
        if corpus == "rich_photo":
            results["folds"][fold]["n_photos"] = len(fold_real) - len(fold_gts)
        if ema:
            results["folds"][fold]["ema_decay"] = ema
        if cfg.loss != "mse":
            results["folds"][fold]["loss"] = cfg.loss
        if weights is not None:
            results["folds"][fold]["gt_mass"] = float(gt_mass)
        if blur != 0.5:
            results["folds"][fold]["blur_sigma"] = blur
        if moa:
            results["folds"][fold]["moa"] = moa
        if seed:
            results["folds"][fold]["seed"] = seed
        if model_kw:
            results["folds"][fold]["model_kwargs"] = dict(model_kw)
        print(json.dumps({fold: results["folds"][fold]}), flush=True)
        # aggregate so partial runs still leave a valid file
        done = results["folds"]
        results["mean"] = {
            k: float(np.mean([v[k] for v in done.values()]))
            for k in ("psnr_y", "ssim_y", "ssim_rgb")
        }
        results["protocol"] = (
            "leave-one-out over Set5: each image scored by a model trained "
            "only on the other four GTs + "
            + (
                "16 procedural synthetic textures"
                if corpus == "legacy"
                else f"{len(fold_synth)} rich procedural images "
                "(textured dead-leaves + pink noise, colors sampled from "
                "train-side images only)"
            )
            + (
                f" + {len(fold_real) - len(fold_gts)} real package-bundled "
                "photos (pipeline.builtin_photos — never eval images)"
                if corpus == "rich_photo"
                else ""
            )
            + "; scorpath protocol (crop 10, Y-SSIM data_range 255)"
        )
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results.get("mean", {})), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
