#!/bin/bash
# Watchdog for the axon tunnel flapping outage (BASELINE.md axon notes):
# the tunnel goes unreachable for 30-120 min stretches and can flap back
# down seconds after answering a probe. For each queued bench cell: wait
# until a tiny-matmul probe answers, run the cell, and retry the cell if it
# died on the preflight deadline instead of producing a measurement.
# Usage: bash scripts/tpu_watchdog_ab.sh <outdir>
set -u
OUT=${1:-/tmp/gru_unroll_ab}
mkdir -p "$OUT"

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float(jnp.sum(x @ x)))
EOF
}

wait_up() {
  until probe; do
    echo "$(date -u +%H:%M:%S) tunnel down" >> "$OUT/log"
    sleep 240
  done
}

run_cell() {  # name, extra bench args... — retries until the cell measures
  name=$1; shift
  for attempt in 1 2 3 4 5 6 7 8; do
    wait_up
    echo "$(date -u +%H:%M:%S) cell $name attempt $attempt" >> "$OUT/log"
    timeout 1800 python bench.py "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
    rc=$?
    if [ -s "$OUT/$name.json" ] && grep -q '"metric"' "$OUT/$name.json"; then
      echo "$(date -u +%H:%M:%S) cell $name ok" >> "$OUT/log"
      return 0
    fi
    echo "$(date -u +%H:%M:%S) cell $name failed rc=$rc (no measurement)" >> "$OUT/log"
    sleep 60
  done
  echo "$(date -u +%H:%M:%S) cell $name GAVE UP" >> "$OUT/log"
}

echo "$(date -u +%H:%M:%S) watchdog start" >> "$OUT/log"
# interleaved A/B/A/B so tunnel drift affects both arms equally
# (--metric train: since r5 the plain invocation measures both graded
# metrics; the A/B targets the train number only)
run_cell u1_a --metric train
run_cell u8_a --metric train --set model.gru_scan_unroll=8
run_cell u1_b --metric train
run_cell u8_b --metric train --set model.gru_scan_unroll=8
run_cell u4_a --metric train --set model.gru_scan_unroll=4
echo "$(date -u +%H:%M:%S) all cells done" >> "$OUT/log"
