#!/bin/bash
# Round-5 session-12 recovery queue.  The axon tunnel wedged at flagship5's
# first training step (the train process blocked forever in a device RPC;
# fresh processes could not even enumerate devices within 120 s, so the
# wedge is tunnel-side, not ours).  This queue first WAITS for device
# health, then re-runs the remaining r5b jobs.  coco80 is EXCLUDED: it ran
# to completion earlier and PASSED (SYNTH_GATE_COCO80.json).
# Usage:
#   setsid nohup bash scripts/gate_queue_r5c.sh > .gate/logs/queue_r5c.log 2>&1 &
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p .gate/logs

echo "waiting for TPU tunnel health $(date -u '+%F %T')"
until timeout 120 python -c \
    "import jax, jax.numpy as jnp; (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" \
    > /dev/null 2>&1; do
  echo "tunnel still down $(date -u '+%T')"
  sleep 60
done
echo "tunnel healthy $(date -u '+%F %T')"

run() {
  local name=$1; shift
  echo "=== $name start $(date -u '+%F %T') ==="
  "$@" >> ".gate/logs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date -u '+%F %T') ==="
}

rm -rf .gate/flagship5
run flagship5 python -u scripts/synth_gate.py --root "$REPO/.gate/flagship5"
rm -rf .gate/tiny5
run tiny5 python -u scripts/synth_gate.py --model tiny --root "$REPO/.gate/tiny5"
rm -rf .gate/mobilenet5
run mobilenet5 python -u scripts/synth_gate.py --model mobilenet \
    --root "$REPO/.gate/mobilenet5"
rm -rf .gate/prune5b
run prune5b python -u scripts/prune_gate.py --fresh --steps 3000 \
    --scratch-control --sweep 0.05,0.1 --root "$REPO/.gate/prune5b"
run bench05 python -u scripts/bench_all.py --round 05
