#!/usr/bin/env bash
# Round-5 evidence pipeline (VERDICT r4 items 1-2, 5-8).  Staged, committed
# incrementally, relaunch-safe, and DOUBLE-LAUNCH-safe: each stage is
# claimed atomically (noclobber) so two live instances can never run the
# same stage (the r4 weak-#2 race), and every device stage is a python CLI
# that itself takes the /tmp/wavedm_tpu.lock flock, so concurrent instances
# serialize on the chip instead of corrupting each other.
set -u

REPO=/root/repo
cd "$REPO"
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
mkdir -p results "$JAX_COMPILATION_CACHE_DIR"

commit() {
  git add -A results 2>/dev/null
  git commit -q -m "$1" 2>/dev/null && echo "committed: $1" || true
}

stage() {  # stage <name> <cmd...>: claim atomically, run once, commit
  local name=$1; shift
  local sent="results/.r5_stage_$name"
  [ -e "$sent" ] && { echo "stage $name: already done"; return 0; }
  # Claim check-and-set runs UNDER a per-stage flock, so two instances can
  # never both pass (the naive rm+recreate reclaim raced).  A claim whose
  # recorded pid is dead is STALE (claimer killed mid-stage) -- reclaimed
  # here instead of wedging the stage forever.
  local claimed
  claimed=$(
    exec 9>"$sent.meta.lock"
    flock 9
    owner=$(cat "$sent.claim" 2>/dev/null)
    if [ -n "$owner" ] && kill -0 "$owner" 2>/dev/null; then
      echo "busy:$owner"
    else
      [ -n "$owner" ] && echo "reclaimed from dead pid $owner" >&2
      echo "$$" > "$sent.claim"
      echo "ok"
    fi
  )
  if [ "$claimed" != "ok" ]; then
    echo "stage $name: claimed by live pid ${claimed#busy:}; skipping"
    return 0
  fi
  echo "=== stage $name ($(date -u)) ==="
  if "$@"; then
    touch "$sent"
    commit "r5 evidence: $name"
  else
    echo "stage $name FAILED (rc=$?) -- continuing" \
      | tee -a results/r5_evidence_failures.log
    commit "r5 evidence: $name (failed, logs committed)"
  fi
  rm -f "$sent.claim"
}

# ---- 0. wait for the manually-launched eval sweep to finish ------------
while pid=$(cat /tmp/r5sweep.pid 2>/dev/null) && [ -n "$pid" ] \
      && kill -0 "$pid" 2>/dev/null; do
  sleep 60
done
echo "sweep down ($(date -u)); starting evidence stages"

run_sweep_table() {
  python tools/summarize_sweep.py --dir results/r5_sweep \
    > results/r5_sweep_table.md 2>&1
}
run_bench()    { timeout 7200 python bench.py \
                   > results/r5_bench_clean.json 2> results/r5_bench_clean.err; }
run_smoke()    { timeout 3600 python tools/pallas_smoke.py \
                   > results/r5_pallas_smoke.jsonl 2>&1; }
run_roofline() { timeout 2400 python tools/roofline.py --batch 8 \
                   --dtype bfloat16 > results/r5_roofline.log 2>&1; }
run_roofline_fused() { timeout 2400 python tools/roofline.py --batch 8 \
                   --dtype bfloat16 --fused \
                   > results/r5_roofline_fused.log 2>&1; }
run_f32_train() {
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r5_dtype_trial_f32 \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    > results/r5_train_f32_trial.log 2>&1
}
run_bf16_train() {
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r5_dtype_trial_bf16 \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    --set parallel.compute_dtype=bfloat16 \
    > results/r5_train_bf16_trial.log 2>&1
}
run_bf16_b4_train() {
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r5_dtype_trial_bf16_b4 \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    --set parallel.compute_dtype=bfloat16 --set training.batch_size=4 \
    > results/r5_train_bf16_b4_trial.log 2>&1
}
run_bf16_b16_train() {
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r5_dtype_trial_bf16_b16 \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    --set parallel.compute_dtype=bfloat16 --set training.batch_size=16 \
    > results/r5_train_bf16_b16_trial.log 2>&1
}
run_bf16_b16_accum_train() {
  # same 128-crop effective batch as bf16_b16, at 1/4 the activation HBM
  timeout 3600 python -u scripts/train_diffusion.py \
    --config wavedm_tpu/configs/rehearsal_flagship.yaml \
    --max-steps 200 --ckpt-dir /tmp/r5_dtype_trial_bf16_b16_accum \
    --hfrm-ckpt saved_models/r3_hfrm/best \
    --set parallel.compute_dtype=bfloat16 --set training.batch_size=16 \
    --set training.grad_accum=4 \
    > results/r5_train_bf16_b16_accum_trial.log 2>&1
}
run_seeds()    { timeout 7200 python tools/seed_study.py \
                   --out results/r5_seed_study.json \
                   > results/r5_seed_study.log 2>&1; }

# Order: sweep table (flagship quality verdict, r4 item 1) -> clean bench
# (capture-proof BENCH, item 2) -> fused-kernel hardware truth + roofline
# (item 5) -> train dtype/batch trials (item 6) -> seed study (item 8).
stage sweep_table    run_sweep_table
stage bench_clean    run_bench
stage pallas_smoke   run_smoke
stage roofline       run_roofline
stage roofline_fused run_roofline_fused
stage f32_train      run_f32_train
stage bf16_train     run_bf16_train
stage bf16_b4_train  run_bf16_b4_train
stage bf16_b16_train run_bf16_b16_train
stage bf16_b16_accum run_bf16_b16_accum_train
stage seed_study     run_seeds

echo "r5 evidence complete ($(date -u))"
