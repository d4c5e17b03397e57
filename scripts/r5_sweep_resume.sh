#!/usr/bin/env bash
# Row-idempotent flagship eval sweep (relaunch target for the r5 watchdog).
# Same rows as scripts/r3_eval_sweep.sh, but a row whose log already
# contains a psnr line is skipped, so an RPC-drop relaunch does not redo
# finished rows.
set -uo pipefail
cd "$(dirname "$0")/.."

CFG=wavedm_tpu/configs/rehearsal_flagship.yaml
HF=saved_models/r3_hfrm/best
CK=${CK:-$(python -c "
from wavedm_tpu.utils.checkpoint import find_latest_checkpoint
print(find_latest_checkpoint('saved_models/r3_ddpm') or '')")}
[ -z "$CK" ] && { echo "no r3_ddpm checkpoint"; exit 1; }
echo "evaluating $CK"
OUT=${OUT:-results/r5_sweep}
mkdir -p "$OUT"

run() {
  name=$1; shift
  if grep -q psnr "$OUT/$name.log" 2>/dev/null; then
    echo "=== $name : done (skipping)"
    return 0
  fi
  echo "=== $name : $*"
  # full output kept per row (a crash otherwise vanishes in the grep filter
  # -- that is exactly how the r4/r5 full_chain row died invisibly)
  python -u scripts/eval_diffusion.py --config "$CFG" --resume "$CK" \
      --hfrm-ckpt "$HF" --eval-batch 8 "$@" 2>&1 \
      | tee "$OUT/$name.full.log" \
      | grep -E "psnr|ssim|images|loaded" | tee "$OUT/$name.log"
}

# Decisive rows first (the judge's verdict table: reference protocol vs
# production profile, raw + EMA), then the per-band diagnostic (degraded /
# HFRM-alone / oracle bars), then ablations -- a chip window that closes
# early still lands the verdict.
run full_chain
run t300_s10 --t-start 300 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1
run full_chain_ema --ema
run t300_s10_ema --ema --t-start 300 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1

if ! grep -q "LL MSE" "$OUT/diag.log" 2>/dev/null; then
  python -u tools/diag_quality.py --config "$CFG" --resume "$CK" \
      --hfrm-ckpt "$HF" --split both --n 8 2>&1 | tail -60 \
      | tee "$OUT/diag.log"
fi

run t200_s10 --t-start 200 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1
run t400_s10 --t-start 400 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1
run t300_s5  --t-start 300 --sampling-timesteps 5 --init-ll hfrm --x0-pred-index -1
run t300_s10_cond --t-start 300 --sampling-timesteps 10 --init-ll cond --x0-pred-index -1
# DPM-Solver++(2M): same protocol quality at fewer UNet passes?
run full_dpmpp_s10 --solver dpmpp2m --sampling-timesteps 10 --x0-pred-index -1
run t300_s5_dpmpp --solver dpmpp2m --t-start 300 --sampling-timesteps 5 --init-ll hfrm --x0-pred-index -1
echo "sweep done"
