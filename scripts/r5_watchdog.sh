#!/usr/bin/env bash
# Watchdog for the r5 eval sweep: if no sweep output has been written for
# STALL_S seconds while the sweep is alive, assume a dropped relay RPC
# (axon quirk: blocked-forever device op), kill the sweep tree, and
# relaunch the row-idempotent resume script.  Exits when the sweep
# completes ("sweep done" in the log) or the pidfile goes stale with a
# complete log.
set -u

REPO=/root/repo
PIDFILE=/tmp/r5sweep.pid
LOG="$REPO/results/r5_sweep.log"
STALL_S=${STALL_S:-2400}

newest_mtime() {
  local t f m
  t=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
  for f in "$REPO"/results/r5_sweep/*.log; do
    [ -e "$f" ] || continue
    m=$(stat -c %Y "$f")
    [ "$m" -gt "$t" ] && t=$m
  done
  echo "$t"
}

kill_tree() {
  # TERM first: a TPU client killed with -9 mid-operation can leave the
  # relay refusing backend setup for ~25 min per subsequent attempt
  # (observed round 5) -- give the client a chance to close its session.
  local pid=$1 kids k
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill "$pid" 2>/dev/null
  for _ in 1 2 3 4; do
    kill -0 "$pid" 2>/dev/null || return 0
    sleep 5
  done
  kill -9 "$pid" 2>/dev/null
}

RELAUNCHES=0
while true; do
  sleep 120
  grep -q "sweep done" "$LOG" 2>/dev/null && { echo "watchdog: sweep complete"; exit 0; }
  pid=$(cat "$PIDFILE" 2>/dev/null || echo "")
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    # sweep process gone without the completion line: relaunch resume --
    # bounded, so a sweep that dies at startup (missing checkpoint etc.)
    # cannot loop forever and deadlock the master runner
    RELAUNCHES=$((RELAUNCHES + 1))
    if [ "$RELAUNCHES" -gt 5 ]; then
      echo "watchdog: $((RELAUNCHES - 1)) relaunches without completion; giving up"
      exit 1
    fi
    echo "watchdog: sweep dead without completion ($(date -u)); relaunch #$RELAUNCHES"
    OUT="$REPO/results/r5_sweep" nohup bash "$REPO/scripts/r5_sweep_resume.sh" \
      >> "$LOG" 2>&1 & echo $! > "$PIDFILE"
    continue
  fi
  now=$(date +%s); last=$(newest_mtime)
  if [ $((now - last)) -gt "$STALL_S" ]; then
    echo "watchdog: stall $((now - last))s ($(date -u)); killing $pid + relaunching"
    kill_tree "$pid"
    sleep 10
    OUT="$REPO/results/r5_sweep" nohup bash "$REPO/scripts/r5_sweep_resume.sh" \
      >> "$LOG" 2>&1 & echo $! > "$PIDFILE"
  fi
done
