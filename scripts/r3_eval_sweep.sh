#!/usr/bin/env bash
# Post-training evaluation sweep for the r3 flagship checkpoints: the
# reference 25-step protocol vs truncated refinement, raw vs EMA weights,
# plus the per-band diagnostic decomposition.  Writes one log per row.
set -uo pipefail
cd "$(dirname "$0")/.."

CFG=wavedm_tpu/configs/rehearsal_flagship.yaml
HF=saved_models/r3_hfrm/best
CK=${CK:-$(python -c "
from wavedm_tpu.utils.checkpoint import find_latest_checkpoint
print(find_latest_checkpoint('saved_models/r3_ddpm') or '')")}
[ -z "$CK" ] && { echo "no r3_ddpm checkpoint"; exit 1; }
echo "evaluating $CK"
OUT=${OUT:-results/r3_sweep}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name : $*"
  python -u scripts/eval_diffusion.py --config "$CFG" --resume "$CK" \
      --hfrm-ckpt "$HF" --eval-batch 8 "$@" 2>&1 \
      | grep -E "psnr|ssim|images|loaded" | tee "$OUT/$name.log"
}

run full_chain
run full_chain_ema --ema
run t300_s10 --t-start 300 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1
run t300_s10_ema --ema --t-start 300 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1
run t200_s10 --t-start 200 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1
run t400_s10 --t-start 400 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1
run t300_s5  --t-start 300 --sampling-timesteps 5 --init-ll hfrm --x0-pred-index -1
run t300_s10_cond --t-start 300 --sampling-timesteps 10 --init-ll cond --x0-pred-index -1

python -u tools/diag_quality.py --config "$CFG" --resume "$CK" \
    --hfrm-ckpt "$HF" --split both --n 8 2>&1 | tail -60 \
    | tee "$OUT/diag.log"
echo "sweep done"
