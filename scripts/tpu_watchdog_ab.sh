#!/bin/bash
# Watchdog for the axon tunnel flapping outage (BASELINE.md axon notes):
# probe with a tiny matmul under timeout every ~4 min; when the tunnel
# answers, run the queued gru_scan_unroll A/B cells sequentially.
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

echo "$(date -u +%H:%M:%S) watchdog start" >> "$OUT/log"
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel down" >> "$OUT/log"
  sleep 240
done
echo "$(date -u +%H:%M:%S) tunnel up — running cells" >> "$OUT/log"

run_cell() {  # name, extra bench args...
  name=$1; shift
  echo "$(date -u +%H:%M:%S) cell $name start" >> "$OUT/log"
  timeout 1800 python bench.py "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "$(date -u +%H:%M:%S) cell $name exit $?" >> "$OUT/log"
}

# interleaved A/B/A/B so tunnel drift affects both arms equally
run_cell u1_a
run_cell u8_a --set model.gru_scan_unroll=8
run_cell u1_b
run_cell u8_b --set model.gru_scan_unroll=8
run_cell u4_a --set model.gru_scan_unroll=4
echo "$(date -u +%H:%M:%S) all cells done" >> "$OUT/log"
