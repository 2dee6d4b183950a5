#!/bin/bash
# Serial TPU job queue — the chip is exclusive (DEVNOTES), so long gate jobs
# run one at a time from one detached runner that survives session death
# (machine restarts still kill it; workspaces under .gate/ are volatile too,
# which is why this script is COMMITTED — relaunching after a wipe is one
# line).  Usage:
#   setsid nohup bash scripts/gate_queue.sh tiny prune > .gate/logs/queue.log 2>&1 &
# Jobs: e2e | tiny [RESUME=1] | prune
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p .gate/logs
for job in "$@"; do
  echo "=== $job start $(date -u '+%F %T') ==="
  case $job in
    e2e)
      python -u scripts/bench_all.py --round 04 --only e2e \
        >> .gate/logs/e2e.log 2>&1 ;;
    e2e_devdata)
      python -u scripts/bench_all.py --round 04 --only e2e_devdata \
        >> .gate/logs/e2e_devdata.log 2>&1 ;;
    tiny)
      args=()
      [ "${RESUME:-0}" = 1 ] && args+=(--resume)
      python -u scripts/synth_gate.py --model tiny --root "$REPO/.gate/tiny" \
        "${args[@]}" >> .gate/logs/tiny_gate.log 2>&1 ;;
    prune)
      python -u scripts/prune_gate.py --fresh --steps 3000 \
        --root "$REPO/.gate/prune" >> .gate/logs/prune_gate.log 2>&1 ;;
    prune5)
      # round-5 prune gate: corrected ratio semantics + equal-budget
      # scratch control + sparsity-λ sweep (VERDICT r4 #3)
      args=()
      [ "${SKIP_FINETUNE:-0}" = 1 ] && args+=(--skip-finetune)
      python -u scripts/prune_gate.py --fresh --steps 3000 \
        --scratch-control --sweep 0.05,0.1 \
        --root "$REPO/.gate/prune5" "${args[@]}" \
        >> .gate/logs/prune5_gate.log 2>&1 ;;
    coco80)
      # 80-class training gate (VERDICT r4 #1): BASELINE config 4's class
      # count through generate → cache → k-means → 6000-step train → eval
      args=()
      [ "${RESUME:-0}" = 1 ] && args+=(--resume)
      python -u scripts/synth_gate.py --format coco --classes 80 \
        --images 1600 --root "$REPO/.gate/coco80" "${args[@]}" \
        >> .gate/logs/coco80_gate.log 2>&1 ;;
    bench05)
      python -u scripts/bench_all.py --round 05 \
        >> .gate/logs/bench05.log 2>&1 ;;
    *) echo "unknown job: $job" ;;
  esac
  echo "=== $job done rc=$? $(date -u '+%F %T') ==="
done
