#!/bin/bash
# Generic tunnel-tolerant bench cell runner (same protocol as
# tpu_watchdog_ab.sh, but the cell list comes from a file).
#
# Usage: bash scripts/tpu_watchdog_cells.sh <outdir> <cells-file>
# where each line of <cells-file> is:  <name> <bench.py args...>
# Lines starting with '#' are skipped. Each cell retries until it produces
# a JSON measurement (the axon tunnel flaps for 30-120 min stretches —
# BASELINE.md axon notes).
set -u
OUT=${1:?outdir}
CELLS=${2:?cells file}
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

run_cell() {
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

echo "$(date -u +%H:%M:%S) watchdog start ($CELLS)" >> "$OUT/log"
while read -r name rest; do
  case "$name" in ''|'#'*) continue;; esac
  # shellcheck disable=SC2086
  run_cell "$name" $rest
done < "$CELLS"
echo "$(date -u +%H:%M:%S) all cells done" >> "$OUT/log"
