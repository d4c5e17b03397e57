#!/usr/bin/env bash
# Round-4 evidence pipeline (VERDICT r3 items 1-4, 8): waits for the r3
# flagship training to finish, then produces and COMMITS each artifact
# incrementally so the evidence is in-tree well before the round snapshot
# (VERDICT r3 weak #8).  Idempotent per stage via results/ sentinels; safe
# to relaunch.  Serialized: one TPU process at a time (axon relay rule).
set -u

REPO=/root/repo
cd "$REPO"
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
# persistent compile cache: raw/EMA sweep rows share programs; later
# processes reuse earlier compiles if the axon backend honors it
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
mkdir -p results "$JAX_COMPILATION_CACHE_DIR"

# this script is now the evidence producer: disarm the r4_finish backstop
touch results/R4_EVIDENCE_DONE

commit() {
  git add -A results BENCH_BASELINE.json 2>/dev/null
  git commit -q -m "$1" 2>/dev/null && echo "committed: $1" || true
}

stage() {  # stage <name> <cmd...>: run once, sentinel + commit
  local name=$1; shift
  local sent="results/.r4_stage_$name"
  [ -e "$sent" ] && { echo "stage $name: already done"; return 0; }
  echo "=== stage $name ($(date -u)) ==="
  if "$@"; then
    touch "$sent"
    commit "r4 evidence: $name"
  else
    echo "stage $name FAILED (rc=$?) -- continuing" | tee -a results/r4_evidence_failures.log
    commit "r4 evidence: $name (failed, logs committed)"
  fi
}

# ---- 0. wait for the training driver to exit ---------------------------
while pid=$(cat /tmp/r3run.pid 2>/dev/null) && [ -n "$pid" ] \
      && kill -0 "$pid" 2>/dev/null; do
  sleep 60
done
sleep 30   # let tee flush + watchdog exit on its completion line
touch /tmp/prune_stop 2>/dev/null || true
echo "training stack down ($(date -u)); starting evidence stages"
commit "r4 evidence: final training log"

run_smoke()    { timeout 3600 python tools/pallas_smoke.py \
                   > results/r4_pallas_smoke.jsonl 2>&1; }
run_bench()    { timeout 7200 python bench.py \
                   > results/r4_bench_clean.json 2> results/r4_bench_clean.err; }
run_sweep()    { OUT=results/r4_sweep bash scripts/r3_eval_sweep.sh \
                   > results/r4_sweep.log 2>&1 \
                 && python tools/summarize_sweep.py --dir results/r4_sweep \
                   > results/r4_sweep_table.md 2>&1; }
run_seeds()    { timeout 7200 python tools/seed_study.py \
                   --out results/r4_seed_study.json \
                   > results/r4_seed_study.log 2>&1; }
run_roofline() { timeout 2400 python tools/roofline.py --batch 8 \
                   --dtype bfloat16 > results/r4_roofline.log 2>&1; }
run_roofline_fused() { timeout 2400 python tools/roofline.py --batch 8 \
                   --dtype bfloat16 --fused \
                   > results/r4_roofline_fused.log 2>&1; }
run_bf16_train() {
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r4_dtype_trial_bf16 \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    --set parallel.compute_dtype=bfloat16 \
    > results/r4_train_bf16_trial.log 2>&1
}
run_f32_train() {
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r4_dtype_trial_f32 \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    > results/r4_train_f32_trial.log 2>&1
}
run_bf16_b4_train() {
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r4_dtype_trial_bf16_b4 \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    --set parallel.compute_dtype=bfloat16 --set training.batch_size=4 \
    > results/r4_train_bf16_b4_trial.log 2>&1
}

# Order: sweep first (the single highest-leverage artifact -- flagship
# quality verdict), then clean bench, then the rest.
stage sweep          run_sweep
stage bench_clean    run_bench
stage pallas_smoke   run_smoke
stage seed_study     run_seeds
stage roofline       run_roofline
stage roofline_fused run_roofline_fused
stage bf16_train     run_bf16_train
stage f32_train      run_f32_train
stage bf16_b4_train  run_bf16_b4_train

echo "r4 evidence complete ($(date -u))"
