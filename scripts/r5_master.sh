#!/usr/bin/env bash
# Round-5 master runner: STRICTLY serial evidence production.
#   0. wait for the relay to be healthy (tools/tpu_probe.py; a client killed
#      mid-op leaves the relay failing inits for ~25 min per attempt)
#   1. flagship eval sweep (row-idempotent resume script + stall watchdog)
#   2. evidence stages (bench, pallas smoke, rooflines, dtype trials, seeds)
#   3. v-pred A/B at rehearsal scale
# Each component is idempotent; relaunching this script is safe.
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}

probe() {
  while true; do
    if timeout 2100 python tools/tpu_probe.py > /tmp/r5_probe.json 2>/dev/null; then
      echo "relay healthy ($(date -u)): $(cat /tmp/r5_probe.json)"
      return 0
    fi
    echo "relay unhealthy ($(date -u)): $(cat /tmp/r5_probe.json 2>/dev/null); quiet-waiting 10 min"
    sleep 600
  done
}

probe
if ! grep -q "sweep done" results/r5_sweep.log 2>/dev/null; then
  OUT=results/r5_sweep nohup bash scripts/r5_sweep_resume.sh \
    >> results/r5_sweep.log 2>&1 &
  echo $! > /tmp/r5sweep.pid
  nohup bash scripts/r5_watchdog.sh > /tmp/r5_watchdog.log 2>&1 &
  WD=$!
  # gate on the completion line (the watchdog may replace the sweep pid);
  # bail out if both the sweep and the watchdog died without it
  while ! grep -q "sweep done" results/r5_sweep.log 2>/dev/null; do
    sleep 60
    sp=$(cat /tmp/r5sweep.pid 2>/dev/null || echo "")
    if ! kill -0 "$sp" 2>/dev/null && ! kill -0 "$WD" 2>/dev/null; then
      echo "sweep and watchdog both dead without completion; moving on"
      break
    fi
  done
  kill "$WD" 2>/dev/null
  git add -A results && git commit -q -m "r5 evidence: flagship eval sweep rows" || true
fi
# regenerate the sweep table now that rows exist (the earlier stage ran
# against an empty dir)
python tools/summarize_sweep.py --dir results/r5_sweep \
  > results/r5_sweep_table.md 2>&1 || true
git add -A results && git commit -q -m "r5 evidence: sweep table" || true

probe
rm -f /tmp/r5sweep.pid   # evidence script gates on this pid being dead
bash scripts/r5_evidence.sh >> results/r5_evidence_runner.log 2>&1

probe
rm -f /tmp/r5evidence.pid
bash scripts/r5_vpred_ab.sh >> results/r5_vpred_ab_runner.log 2>&1

echo "r5 master complete ($(date -u))"
