#!/bin/bash
# Launch bench.py during a quiet window: poll the calibration token and
# start the run only after 3 consecutive sub-threshold readings (this
# host's contention arrives in 5-15 min waves — ROUND11.md). Repeats
# until an attempt lands with cal_ratio below the target or attempts run
# out. Queries-phase cleanliness is what matters; the keep-best logic in
# bench.py adjudicates which payload becomes primary.
cd "$(dirname "$0")/.."
THRESH="${THRESH:-2.2}"
ATTEMPTS="${ATTEMPTS:-3}"
for a in $(seq 1 "$ATTEMPTS"); do
  echo "[watcher] attempt $a: waiting for quiet window (token < ${THRESH}x)"
  quiet=0
  for i in $(seq 1 120); do
    r=$(python -c "
import sys; sys.path.insert(0,'.')
from bench import cpu_calibration_token, CAL_REF_S
print(cpu_calibration_token(reps=1)/CAL_REF_S)" 2>/dev/null)
    ok=$(python -c "print(1 if $r < $THRESH else 0)")
    if [ "$ok" = "1" ]; then quiet=$((quiet+1)); else quiet=0; fi
    echo "[watcher] token ratio $r (streak $quiet)"
    if [ "$quiet" -ge 3 ]; then break; fi
    sleep 45
  done
  if [ "$quiet" -lt 3 ]; then echo "[watcher] no quiet window found"; continue; fi
  echo "[watcher] launching bench (attempt $a)"
  python bench.py > "/tmp/bench_attempt_$a.log" 2>&1
  TAG=$(python -c "import bench; print(bench.ROUND_TAG)")
  cal=$(python -c "
import json
d = json.load(open('docs/bench_full_$TAG.json'))
c = d['calibration']
print(c['cal_ratio'], len(c['queries_contended']), d['value'])")
  echo "[watcher] attempt $a primary now: cal/contended/value = $cal"
  good=$(python -c "
import json
d = json.load(open('docs/bench_full_$TAG.json'))
c = d['calibration']
print(1 if c['cal_ratio'] < 2.0 and not c['queries_contended'] and 'sim_job_limeqo_final_latency' in d else 0)")
  if [ "$good" = "1" ]; then echo "[watcher] clean full run landed"; break; fi
done
echo "[watcher] done"
