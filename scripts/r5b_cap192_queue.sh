#!/bin/bash
# Late-r5 continuation: 192-feature capacity probe, two more LOO folds
# (bird, woman — the texture-rich folds where the butterfly screen's
# +0.0027 is most likely to replicate).  Serialized on the single relay
# chip; each fold bounded; rows merge into EVAL_LOO_CAP192.json (the
# trainer skips folds already present).  Reboot-safe ckpt root .ckpts/.
set -u
cd /root/repo
log() { echo "[cap192b $(date +%H:%M:%S)] $*"; }
for FOLD in bird woman; do
  log "fold $FOLD start"
  timeout 3600 env IEK_LOO_STEPS=20000 IEK_LOO_CORPUS=rich_photo \
    IEK_LOO_LOSS=charbonnier IEK_LOO_BLUR=0 IEK_LOO_MOA=0.75 \
    IEK_LOO_ONLY=$FOLD IEK_LOO_KW='{"features":192}' \
    IEK_LOO_OUT=EVAL_LOO_CAP192.json IEK_LOO_CKPT_ROOT=/root/repo/.ckpts/loo_cap192 \
    python scripts/train_loo.py
  log "fold $FOLD done rc=$?"
done
log "cap192b queue complete"
