"""Re-score the leave-one-out fold checkpoints with the x8 geometric
self-ensemble (engine ``self_ensemble=True``).

The LOO protocol (scripts/train_loo.py) trains one didbl per fold on the
other four Set5 GTs + procedural textures and scores the held-out image.
This script reuses those SAVED checkpoints — no retraining — and adds
ensemble rows, so the delta isolates exactly what the test-time ensemble
buys on honestly held-out content.  Results merge into the corpus's JSON
(EVAL_LOO_RICH.json / EVAL_LOO.json) as ``*_se`` keys plus a ``mean_se``.

Run after train_loo.py, same env: IEK_LOO_CORPUS=rich|legacy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SET5 = ["baby", "bird", "butterfly", "head", "woman"]


def _set5_dir() -> str:
    from image_enhance_keras_tpu.utils.paths import find_repo_asset

    return find_repo_asset("data_set5") or "data_set5"


def main() -> int:
    from image_enhance_keras_tpu.data.io import imread
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.eval.evaluate import degrade
    from image_enhance_keras_tpu.eval.scorer import score_pair

    corpus = os.environ.get("IEK_LOO_CORPUS", "rich")
    out_path = {
        "legacy": "EVAL_LOO.json",
        "rich_fiber": "EVAL_LOO_FIBER.json",
        "rich_photo": "EVAL_LOO_PHOTO.json",
    }.get(corpus, "EVAL_LOO_RICH.json")
    out_path = os.environ.get("IEK_LOO_OUT", out_path)
    results = json.load(open(out_path))

    for fold in SET5:
        row = results["folds"].get(fold)
        # train_loo writes /tmp/loo_<corpus>_<fold>; pre-r3 legacy runs used
        # /tmp/loo_<fold> — accept either.  Prefer `latest` (the final-epoch
        # state, which IS what the recorded single-pass rows scored; with
        # train_loo's ckpt_every only the final epoch saves) over `best`,
        # whose promotion can be blocked by a stale index.json from an
        # earlier probe run in the same /tmp dir.
        # EMA runs export latest_ema.npz — that IS what the recorded row
        # scored (train_loo serves the EMA shadow when enabled)
        root = os.environ.get("IEK_LOO_CKPT_ROOT", "/tmp")
        ema = f"{root}/loo_{corpus}_{fold}/latest_ema.npz"
        latest = f"{root}/loo_{corpus}_{fold}/latest"
        candidates = [
            ema, latest, f"{root}/loo_{corpus}_{fold}/best",
            f"/tmp/loo_{fold}/latest", f"/tmp/loo_{fold}/best",
        ]
        # a later non-EMA re-run in the same /tmp dir rewrites `latest`
        # but leaves the old latest_ema.npz behind — never score the
        # stale EMA artifact against the fresh row
        if (
            os.path.exists(ema)
            and os.path.exists(latest)
            and os.path.getmtime(ema) < os.path.getmtime(latest)
        ):
            candidates.remove(ema)
        ckpt = next((c for c in candidates if os.path.exists(c)), candidates[0])
        if row is None or not os.path.exists(ckpt):
            print(f"fold {fold}: no result/checkpoint, skipping", flush=True)
            continue
        want_il = int(os.environ.get("IEK_LOO_IL", "0")) > 0
        if "ssim_y_se" in row and not (want_il and "ssim_y_il" not in row):
            print(f"fold {fold}: ensemble row present, skipping", flush=True)
            continue
        t0 = time.time()
        # IEK_LOO_KW: model kwargs matching the run being re-scored (the
        # capacity probes train non-default graphs; row provenance is also
        # in the fold's model_kwargs key)
        model_kw = json.loads(os.environ.get("IEK_LOO_KW", "{}")) or (
            row.get("model_kwargs") or {}
        )
        r = SuperResolver(
            model="didbl", weights=ckpt, mode="fast",
            model_kwargs=model_kw or None,
        )
        gt = imread(f"{_set5_dir()}/{fold}_GT.png")
        h, w = (gt.shape[0] // 4) * 4, (gt.shape[1] // 4) * 4
        gt = gt[:h, :w]
        lr = degrade(gt, 4)
        # single-pass re-score from the SAME checkpoint on the SAME backend
        # — the fair base for the ensemble delta (the recorded train_loo row
        # was scored in-process right after training)
        sb = score_pair(gt, r.upscale(lr), name=fold, crop_border=10)
        r.self_ensemble = True
        s = score_pair(gt, r.upscale(lr), name=fold, crop_border=10)
        row.update(
            psnr_y_single=sb.psnr_y, ssim_y_single=sb.ssim_y,
            ssim_rgb_single=sb.ssim_rgb,
            psnr_y_se=s.psnr_y, ssim_y_se=s.ssim_y, ssim_rgb_se=s.ssim_rgb,
            se_sec=round(time.time() - t0, 1),
        )
        # IEK_LOO_IL>0 adds ZSSR-style internal-learning rows (engine
        # --internal-learn, r4): per-image adaptation on the held-out LR
        # itself — single-pass and adapted+ensemble
        il = int(os.environ.get("IEK_LOO_IL", "0"))
        if il > 0:
            r.self_ensemble = False
            r.back_projection = 0
            r.internal_learn = il
            if os.environ.get("IEK_LOO_IL_LR"):
                r.internal_learn_lr = float(os.environ["IEK_LOO_IL_LR"])
            t_il = time.time()
            sil = score_pair(gt, r.upscale(lr), name=f"{fold}:il", crop_border=10)
            r.self_ensemble = True
            sil_se = score_pair(
                gt, r.upscale(lr), name=f"{fold}:il+se", crop_border=10
            )
            r.internal_learn = 0
            row.update(
                il_steps=il, il_lr=float(getattr(r, "internal_learn_lr", 2e-5)),
                psnr_y_il=sil.psnr_y, ssim_y_il=sil.ssim_y,
                psnr_y_il_se=sil_se.psnr_y, ssim_y_il_se=sil_se.ssim_y,
                il_sec=round(time.time() - t_il, 1),
            )
        # IEK_LOO_BP>0 adds back-projection rows (ops/backproject.py) on
        # top of both the single pass and the ensemble
        bp = int(os.environ.get("IEK_LOO_BP", "3"))
        if bp > 0:
            r.self_ensemble = False
            r.back_projection = bp
            sbp = score_pair(gt, r.upscale(lr), name=f"{fold}:bp", crop_border=10)
            r.self_ensemble = True
            sebp = score_pair(gt, r.upscale(lr), name=f"{fold}:se+bp", crop_border=10)
            row.update(
                bp_iters=bp,
                psnr_y_bp=sbp.psnr_y, ssim_y_bp=sbp.ssim_y,
                psnr_y_se_bp=sebp.psnr_y, ssim_y_se_bp=sebp.ssim_y,
            )
        print(json.dumps({fold: row}), flush=True)
        done = [v for v in results["folds"].values() if "ssim_y_se" in v]
        results["mean_se"] = {
            k: float(np.mean([v[k] for v in done]))
            for k in (
                "psnr_y_single", "ssim_y_single", "ssim_rgb_single",
                "psnr_y_se", "ssim_y_se", "ssim_rgb_se",
            )
        }
        il_done = [v for v in results["folds"].values() if "ssim_y_il" in v]
        if il_done:
            results["mean_il"] = {
                k: float(np.mean([v[k] for v in il_done]))
                for k in (
                    "psnr_y_il", "ssim_y_il", "psnr_y_il_se", "ssim_y_il_se",
                )
            }
        bp_done = [v for v in results["folds"].values() if "ssim_y_bp" in v]
        if bp_done:
            results["mean_bp"] = {
                k: float(np.mean([v[k] for v in bp_done]))
                for k in (
                    "psnr_y_bp", "ssim_y_bp", "psnr_y_se_bp", "ssim_y_se_bp",
                )
            }
        results["ensemble"] = (
            "x8 geometric self-ensemble (flips/rot90 averaged, engine "
            "self_ensemble=True) over the same per-fold checkpoints"
        )
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results.get("mean_se", {})), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
