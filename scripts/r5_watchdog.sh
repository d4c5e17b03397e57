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

rows_done() {  # completed sweep rows (resume skips these): real progress
  grep -l psnr "$REPO"/results/r5_sweep/*.log 2>/dev/null | wc -l
}

relaunch() {  # bounded relaunch, shared by the dead and stalled paths;
              # the counter RESETS whenever a retry completed a new row,
              # so recurring RPC drops on a progressing sweep never give up
  local now_rows
  now_rows=$(rows_done)
  if [ "$now_rows" -gt "$ROWS_AT_LAST_RELAUNCH" ]; then
    RELAUNCHES=0
  fi
  ROWS_AT_LAST_RELAUNCH=$now_rows
  RELAUNCHES=$((RELAUNCHES + 1))
  if [ "$RELAUNCHES" -gt 5 ]; then
    echo "watchdog: $((RELAUNCHES - 1)) relaunches without a new row; giving up"
    exit 1
  fi
  echo "watchdog: relaunch #$RELAUNCHES ($(date -u), $now_rows rows done)"
  OUT="$REPO/results/r5_sweep" nohup bash "$REPO/scripts/r5_sweep_resume.sh" \
    >> "$LOG" 2>&1 & echo $! > "$PIDFILE"
}

RELAUNCHES=0
ROWS_AT_LAST_RELAUNCH=$(rows_done)
while true; do
  sleep 120
  grep -q "sweep done" "$LOG" 2>/dev/null && { echo "watchdog: sweep complete"; exit 0; }
  pid=$(cat "$PIDFILE" 2>/dev/null || echo "")
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    echo "watchdog: sweep dead without completion"
    relaunch
    continue
  fi
  now=$(date +%s); last=$(newest_mtime)
  if [ $((now - last)) -gt "$STALL_S" ]; then
    echo "watchdog: stall $((now - last))s; killing $pid"
    kill_tree "$pid"
    sleep 10
    relaunch
  fi
done
