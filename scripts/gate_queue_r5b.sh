#!/bin/bash
# Round-5 session-11 follow-up queue (separate file: gate_queue.sh was mid-
# execution when this plan landed, and bash re-reads scripts it is running).
# Waits for any live gate_queue.sh runner to drain (the chip is exclusive),
# then re-runs every training gate under the fixed class-term gradient
# ([loss] class_grad = darknet, commit 196a51d) so each shipped artifact is
# evidence about the shipped default, and ends with the round-5 bench set.
# Usage:
#   setsid nohup bash scripts/gate_queue_r5b.sh > .gate/logs/queue_r5b.log 2>&1 &
#   echo $! > .gate/queue_r5b.pid
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p .gate/logs

# drain the previous queue (pattern-WAIT only — never pattern-kill; the
# stored pid file points at the launcher shell, not the queue bash itself)
while pgrep -f 'scripts/gate_queue\.sh' > /dev/null 2>&1; do
  echo "waiting for a live gate_queue.sh run $(date -u '+%T')"
  sleep 60
done

run() {
  local name=$1; shift
  echo "=== $name start $(date -u '+%F %T') ==="
  "$@" >> ".gate/logs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date -u '+%F %T') ==="
}

# 1. the headline: 80-class training under the fixed gradient (VERDICT r4 #1)
rm -rf .gate/coco80
run coco80_fixed python -u scripts/synth_gate.py --format coco --classes 80 \
    --images 1600 --root "$REPO/.gate/coco80"

# 2-4. re-prove the closed 8-class gates under the new default
rm -rf .gate/flagship5
run flagship5 python -u scripts/synth_gate.py --root "$REPO/.gate/flagship5"
rm -rf .gate/tiny5
run tiny5 python -u scripts/synth_gate.py --model tiny --root "$REPO/.gate/tiny5"
rm -rf .gate/mobilenet5
run mobilenet5 python -u scripts/synth_gate.py --model mobilenet \
    --root "$REPO/.gate/mobilenet5"

# 5. prune gate under the new default (controls + sweep, VERDICT r4 #3)
rm -rf .gate/prune5b
run prune5b python -u scripts/prune_gate.py --fresh --steps 3000 \
    --scratch-control --sweep 0.05,0.1 --root "$REPO/.gate/prune5b"

# 6. round-5 bench artifact set (VERDICT r4 #9)
run bench05 python -u scripts/bench_all.py --round 05
