#!/usr/bin/env bash
# Full-protocol dress rehearsal on one chip, no external data needed:
#   synthetic RainDrop-layout dataset -> stage-1 HFRM -> stage-2 wavelet
#   diffusion -> CLI eval (3 PSNR variants + SSIM + image dumps).
# Mirrors the reference's train_weather_script.py / test_weather_script.py
# cycle end-to-end.  ~1h on a tunneled v5e; minutes on a local chip.
set -euo pipefail
cd "$(dirname "$0")/.."

CFG=wavedm_tpu/configs/rehearsal_wavelet.yaml
STEPS1=${STEPS1:-1800}
STEPS2=${STEPS2:-6000}

python tools/make_synthetic_dataset.py
python -u scripts/train_hfrm.py --config "$CFG" \
    --max-steps "$STEPS1" --ckpt-dir saved_models/rehearsal
python -u scripts/train_diffusion.py --config "$CFG" \
    --max-steps "$STEPS2" --ckpt-dir saved_models/rehearsal_ddpm
LATEST=$(ls -t saved_models/rehearsal_ddpm | head -1)
python -u scripts/eval_diffusion.py --config "$CFG" \
    --resume "saved_models/rehearsal_ddpm/$LATEST" \
    --hfrm-ckpt saved_models/rehearsal/best \
    --image-folder results/rehearsal
