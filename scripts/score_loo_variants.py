"""Attribute LOO fold quality between the raw final-step params and the
EMA shadow: score BOTH from each fold's saved TrainState on the held-out
image (scorpath protocol).  Use after an EMA-enabled train_loo run to
separate "longer training" effects from "EMA" effects.

Run on the TPU: IEK_LOO_CORPUS=rich python scripts/score_loo_variants.py
Env: IEK_LOO_FOLDS (comma list, default all five).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SET5 = ["baby", "bird", "butterfly", "head", "woman"]


def _set5_dir() -> str:
    from image_enhance_keras_tpu.utils.paths import find_repo_asset

    return find_repo_asset("data_set5") or "data_set5"


def main() -> int:
    import jax

    from image_enhance_keras_tpu.data.io import imread
    from image_enhance_keras_tpu.engine import SuperResolver
    from image_enhance_keras_tpu.eval.evaluate import degrade
    from image_enhance_keras_tpu.eval.scorer import score_pair
    from image_enhance_keras_tpu.train.checkpoints import restore_params

    corpus = os.environ.get("IEK_LOO_CORPUS", "rich")
    folds = os.environ.get("IEK_LOO_FOLDS")
    folds = folds.split(",") if folds else SET5

    rows = {}
    for fold in folds:
        ckpt = f"/tmp/loo_{corpus}_{fold}/latest"
        if not os.path.exists(ckpt):
            print(f"{fold}: no checkpoint at {ckpt}, skipping", flush=True)
            continue
        r = SuperResolver(model="didbl", mode="fast")
        want = jax.tree_util.tree_leaves(r.params)
        leaves = restore_params(ckpt, None)
        n = len(want)
        treedef = jax.tree_util.tree_structure(r.params)

        def tree_from(ls):
            picked = [
                np.asarray(x, dtype=np.asarray(t).dtype)
                for t, x in zip(want, ls)
            ]
            return jax.tree_util.tree_unflatten(treedef, picked)

        raw = tree_from(leaves[:n])
        # TrainState flatten order: (params, opt_state, step, ema).  Adam
        # carries count + mu(n) + nu(n), and a schedule (the LOO cosine)
        # adds one more count leaf — so totals are 3n+{2,3} without EMA
        # and 4n+{2,3} with it.  Adam's nu mirrors the param shapes, so
        # count arithmetic (not shape matching) is the discriminator.
        if len(leaves) - 4 * n in (2, 3):
            ema = tree_from(leaves[-n:])
        elif len(leaves) - 3 * n in (2, 3):
            ema = None
        else:
            print(f"{fold}: unexpected leaf count {len(leaves)} (n={n}); "
                  "skipping ema", flush=True)
            ema = None

        gt = imread(f"{_set5_dir()}/{fold}_GT.png")
        h, w = (gt.shape[0] // 4) * 4, (gt.shape[1] // 4) * 4
        gt = gt[:h, :w]
        lr = degrade(gt, 4)
        out = {}
        for name, params in (("raw", raw), ("ema", ema)):
            if params is None:
                continue
            r.params = jax.device_put(params)
            r._qparams = None
            r._jitted.clear()
            r._jitted_fast.clear()
            s = score_pair(gt, r.upscale(lr), name=f"{fold}:{name}", crop_border=10)
            out[name] = {"psnr_y": s.psnr_y, "ssim_y": s.ssim_y}
        rows[fold] = out
        print(json.dumps({fold: out}), flush=True)
    if rows:
        means = {}
        for v in ("raw", "ema"):
            got = [r[v] for r in rows.values() if v in r]
            if got:
                means[v] = {
                    k: float(np.mean([g[k] for g in got])) for k in got[0]
                }
        print(json.dumps({"mean": means}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
