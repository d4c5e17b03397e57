#!/usr/bin/env bash
# Post-training finisher for the r3 quality run.
#
# Waits until DEADLINE (default 17:10 UTC, ~2h20m before round end) or
# until the training driver exits on its own, then:
#   1. stops the watchdog (first, so nothing relaunches), the driver tree,
#      and the checkpoint pruner -- all by pid file, never by pattern;
#   2. runs the evaluation sweep (scripts/r3_eval_sweep.sh) on the latest
#      flagship checkpoint;
#   3. runs bench.py with the trained weights.
#
# Launched detached so the artifacts land even if the interactive session
# dies mid-wait (which ended the previous session).  Idempotent via the
# R3_FINISH_DONE sentinel.
set -u

REPO=/root/repo
DEADLINE=${DEADLINE:-1786986600}
SENTINEL=$REPO/results/R3_FINISH_DONE

[ -e "$SENTINEL" ] && { echo "finisher: already done"; exit 0; }
mkdir -p "$REPO/results"

while true; do
  now=$(date +%s)
  pid=$(cat /tmp/r3run.pid 2>/dev/null || echo "")
  alive=no
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null && alive=yes
  if [ "$now" -ge "$DEADLINE" ] || [ "$alive" = no ]; then
    break
  fi
  sleep 60
done
echo "finisher: stopping training stack ($(date -u))"

kill_tree() {
  local pid=$1 kids k
  kids=$(pgrep -P "$pid" 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill -9 "$pid" 2>/dev/null
}

# order matters: watchdog first, then driver tree, then pruner
touch /tmp/prune_stop
for f in /tmp/watchdog.pid /tmp/r3run.pid /tmp/prune.pid; do
  p=$(cat "$f" 2>/dev/null || echo "")
  [ -n "$p" ] && kill_tree "$p"
done
sleep 20   # let the relay release the device

cd "$REPO"
echo "finisher: eval sweep ($(date -u))"
bash scripts/r3_eval_sweep.sh > results/r3_sweep.log 2>&1
echo "finisher: bench ($(date -u))"
python bench.py > results/r3_bench_trained.json 2> results/r3_bench_trained.err
echo "finisher: roofline ($(date -u))"
python tools/roofline.py --batch 8 --dtype bfloat16 \
    > results/r3_roofline.log 2>&1
python tools/roofline.py --batch 8 --dtype bfloat16 --fused \
    > results/r3_roofline_fused.log 2>&1
touch "$SENTINEL"
echo "finisher: done ($(date -u))"
