#!/usr/bin/env bash
# Round-3 quality run: reference-scale two-stage training on the enlarged
# synthetic dataset.  Runs from a SNAPSHOT copy of the repo so the working
# tree can keep evolving while the TPU process trains (editing sources under
# a live process causes lazy-import skew crashes -- see memory notes).
#
#   stage 1: HFRM dim-32 (reference train_hfrm.py scale), device-cached
#   stage 2: flagship 156M UNet wavelet diffusion, matched conditioning
#
# Checkpoints land in the REAL repo (saved_models/r3_*); logs in results/.
set -euo pipefail

REPO=/root/repo
SNAP=/tmp/r3train
CFG=wavedm_tpu/configs/rehearsal_flagship.yaml
STEPS1=${STEPS1:-12000}
STEPS2=${STEPS2:-120000}

rm -rf "$SNAP"
mkdir -p "$SNAP"
cd "$REPO"
git archive HEAD | tar -x -C "$SNAP"
ln -sfn "$REPO/data" "$SNAP/data"
mkdir -p "$REPO/results"

cd "$SNAP"
if [ ! -e "$REPO/saved_models/r3_hfrm/STAGE1_DONE" ]; then
  RESUME=""
  [ -e "$REPO/saved_models/r3_hfrm/lastest" ] \
      && RESUME="--resume $REPO/saved_models/r3_hfrm/lastest"
  python -u scripts/train_hfrm.py --config "$CFG" $RESUME \
      --max-steps "$STEPS1" --ckpt-dir "$REPO/saved_models/r3_hfrm" \
      2>&1 | tee -a "$REPO/results/r3_hfrm_train.log"
  touch "$REPO/saved_models/r3_hfrm/STAGE1_DONE"
fi
python -u scripts/train_diffusion.py --config "$CFG" \
    --max-steps "$STEPS2" --ckpt-dir "$REPO/saved_models/r3_ddpm" \
    --hfrm-ckpt "$REPO/saved_models/r3_hfrm/best" --resume auto \
    2>&1 | tee "$REPO/results/r3_ddpm_train.log"
echo "r3 quality run complete"
