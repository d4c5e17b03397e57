#!/usr/bin/env bash
# Round-5 stretch (VERDICT r4 item 9): can a better parameterization make
# the 25-step reference protocol WIN at rehearsal scale?
#
# Three arms, identical budgets/seed/data (synthetic dress-rehearsal task,
# frozen rehearsal HFRM = the 29.90 dB bar):
#   eps      -- the reference loss (baseline; known full-chain 23.56 dB at
#               this scale from round 2)
#   v        -- velocity parameterization (training.pred_type=v)
#   eps_snr5 -- eps + min-SNR-5 weighting (upweights high-t relative terms)
#
# Each arm: 12k-step stage-2 train, then the 25-step full chain (reference
# protocol, models/restoration.py:106-124) and the t300_s10 production
# profile on 8 held-out images.  Waits for the r5 evidence pipeline to
# finish so the chip stages never contend (every CLI also takes the
# device flock).
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
mkdir -p results/r5_vpred_ab

while pid=$(cat /tmp/r5evidence.pid 2>/dev/null) && [ -n "$pid" ] \
      && kill -0 "$pid" 2>/dev/null; do
  sleep 60
done
echo "evidence pipeline down ($(date -u)); starting v-pred A/B"

CFG=wavedm_tpu/configs/rehearsal_wavelet.yaml
HF=saved_models/rehearsal/best
STEPS=${STEPS:-12000}

commit() {
  git add -A results/r5_vpred_ab 2>/dev/null
  git commit -q -m "$1" 2>/dev/null && echo "committed: $1" || true
}

arm() {  # arm <name> [--set overrides...]
  local name=$1; shift
  local ckdir="saved_models/r5_ab_$name"
  local sent="results/r5_vpred_ab/.done_$name"
  [ -e "$sent" ] && { echo "arm $name: already done"; return 0; }
  echo "=== arm $name ($(date -u)) ==="
  timeout 5400 python -u scripts/train_diffusion.py --config "$CFG" \
      --max-steps "$STEPS" --ckpt-dir "$ckdir" --hfrm-ckpt "$HF" "$@" \
      > "results/r5_vpred_ab/train_$name.log" 2>&1 \
    || { echo "arm $name: train FAILED"; commit "r5 A/B: $name train failed"; return 1; }
  local ck
  ck=$(python -c "
from wavedm_tpu.utils.checkpoint import find_latest_checkpoint
print(find_latest_checkpoint('$ckdir') or '')")
  [ -z "$ck" ] && { echo "arm $name: no checkpoint"; return 1; }
  for proto in full_chain t300; do
    local extra=""
    [ "$proto" = t300 ] && extra="--t-start 300 --sampling-timesteps 10 --init-ll hfrm --x0-pred-index -1"
    timeout 3600 python -u scripts/eval_diffusion.py --config "$CFG" \
        --resume "$ck" --hfrm-ckpt "$HF" --eval-batch 8 $extra "$@" 2>&1 \
      | tee "results/r5_vpred_ab/eval_${name}_${proto}.full.log" \
      | grep -E "psnr|ssim|images" \
      | tee "results/r5_vpred_ab/eval_${name}_${proto}.log"
  done
  touch "$sent"
  commit "r5 A/B: arm $name (train + both protocols)"
}

arm eps
arm v        --set training.pred_type=v
arm eps_snr5 --set training.snr_gamma=5.0

echo "v-pred A/B complete ($(date -u))"
