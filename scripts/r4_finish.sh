#!/usr/bin/env bash
# Round-4 evidence backstop.  The builder drives Phase B interactively
# (stop training ~18:30-19:00 UTC, then sweep + clean bench + roofline +
# seed study, committing incrementally).  THIS script only fires if the
# interactive session dies: at DEADLINE it stops the training stack and
# produces the same artifacts so the end-of-round snapshot commit (the
# round driver commits any uncommitted work) contains the evidence.
#
# Idempotent via results/R4_EVIDENCE_DONE -- the interactive path touches
# the same sentinel, which turns this script into a no-op.
set -u

REPO=/root/repo
DEADLINE=${DEADLINE:-$(date -u -d "23:30" +%s)}
SENTINEL=$REPO/results/R4_EVIDENCE_DONE
# the interactive session touches this every turn; a stale heartbeat means
# the session died and the backstop must take over
HEARTBEAT=/tmp/r4_heartbeat
HEARTBEAT_STALE=900

[ -e "$SENTINEL" ] && { echo "r4_finish: already done"; exit 0; }
mkdir -p "$REPO/results"

while true; do
  [ -e "$SENTINEL" ] && { echo "r4_finish: done interactively"; exit 0; }
  now=$(date +%s)
  pid=$(cat /tmp/r3run.pid 2>/dev/null || echo "")
  alive=no
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null && alive=yes
  hb_fresh=no
  if [ -e "$HEARTBEAT" ]; then
    hb_age=$(( now - $(stat -c %Y "$HEARTBEAT") ))
    [ "$hb_age" -lt "$HEARTBEAT_STALE" ] && hb_fresh=yes
  fi
  if [ "$now" -ge "$DEADLINE" ]; then
    break                       # hard deadline: engage regardless
  fi
  if [ "$alive" = no ] && [ "$hb_fresh" = no ]; then
    break                       # training done AND the session is dead
  fi
  sleep 60
done
[ -e "$SENTINEL" ] && exit 0
echo "r4_finish: backstop engaged, stopping training stack ($(date -u))"

kill_tree() {
  local pid=$1 kids k
  kids=$(pgrep -P "$pid" 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill -9 "$pid" 2>/dev/null
}
touch /tmp/prune_stop
for f in /tmp/watchdog.pid /tmp/r3run.pid /tmp/prune.pid; do
  p=$(cat "$f" 2>/dev/null || echo "")
  [ -n "$p" ] && kill_tree "$p"
done
sleep 20

cd "$REPO"
echo "r4_finish: eval sweep ($(date -u))"
OUT=results/r4_sweep bash scripts/r3_eval_sweep.sh > results/r4_sweep.log 2>&1
echo "r4_finish: clean bench ($(date -u))"
python bench.py > results/r4_bench_clean.json 2> results/r4_bench_clean.err
echo "r4_finish: pallas smoke ($(date -u))"
python tools/pallas_smoke.py > results/r4_pallas_smoke.jsonl 2>&1
echo "r4_finish: seed study ($(date -u))"
python tools/seed_study.py --out results/r4_seed_study.json \
    > results/r4_seed_study.log 2>&1
echo "r4_finish: roofline ($(date -u))"
python tools/roofline.py --batch 8 --dtype bfloat16 \
    > results/r4_roofline.log 2>&1
touch "$SENTINEL"
echo "r4_finish: done ($(date -u))"
