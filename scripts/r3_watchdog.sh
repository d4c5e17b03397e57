#!/usr/bin/env bash
# Watchdog for the r3 quality run: the axon relay occasionally drops an RPC
# and leaves the training process blocked forever (observed: stage-1 stall
# at step 2500, main thread in futex_wait on a device op).  Both stages are
# idempotent (stage-1 sentinel + --resume, stage-2 --resume auto), so the
# recovery is: kill the stalled tree, relaunch the driver.
#
# Stall = neither train log has been written for STALL_S seconds while the
# driver is alive.  Exits when the driver prints its completion line.
set -u

REPO=/root/repo
DRIVER="$REPO/scripts/r3_quality_run.sh"
RUNLOG=/tmp/r3run.log
PIDFILE=/tmp/r3run.pid
STALL_S=${STALL_S:-2400}

newest_mtime() {
  local t=0 f
  for f in "$REPO/results/r3_hfrm_train.log" "$REPO/results/r3_ddpm_train.log"; do
    if [ -e "$f" ]; then
      local m
      m=$(stat -c %Y "$f")
      [ "$m" -gt "$t" ] && t=$m
    fi
  done
  echo "$t"
}

kill_tree() {
  local pid=$1
  local kids
  kids=$(pgrep -P "$pid" 2>/dev/null)
  for k in $kids; do
    kill_tree "$k"
  done
  kill -9 "$pid" 2>/dev/null
}

while true; do
  if grep -q "r3 quality run complete" "$RUNLOG" 2>/dev/null; then
    echo "watchdog: run complete"
    exit 0
  fi
  pid=$(cat "$PIDFILE" 2>/dev/null || echo "")
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    echo "watchdog: driver not running; relaunching ($(date))"
    nohup bash "$DRIVER" > "$RUNLOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 300
    continue
  fi
  last=$(newest_mtime)
  now=$(date +%s)
  if [ "$last" -gt 0 ] && [ $((now - last)) -gt "$STALL_S" ]; then
    echo "watchdog: logs stalled $((now - last))s; killing driver tree ($(date))"
    kill_tree "$pid"
    sleep 10
  fi
  sleep 60
done
