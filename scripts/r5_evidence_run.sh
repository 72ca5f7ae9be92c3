#!/bin/bash
# Flagship r=5 renderable-regime evidence run (VERDICT r4 next #1).
#
# Trains the full 256-d model at r=5 on a char_sec 0.06 corpus — at
# sr 22050 / hop 128 that is ~2.07 teacher-forced decoder steps per
# character, the only measured ALIGNING regime for the full model
# (BASELINE.md audio-evidence bullets), while tones are ~10 analysis
# frames long, i.e. comfortably renderable (the 0.025 corpus's 0.84/0.48
# free-running plateau came from ~4.3-frame tones rushed to ~1 frame).
#
# Auto-resumes across axon tunnel flaps (BASELINE.md axon notes): each
# attempt continues from the newest checkpoint in $RUN/ckpt; --save-every
# guarantees forward progress survives a mid-run wedge.
set -u
TOTAL=${1:-50000}
OUT=artifacts/alignment_r5
RUN=artifacts/alignment_r5_work/run
LOG=${2:-/tmp/r5_run}
# Corpus size is overridable: the 25k-step probe on the initial 512-utt
# corpus measured corpus-prompts 0.70 vs held-out 0.275 — a memorization
# gap, not a rendering failure (errors are tail drift + off-grid pitch).
# Resuming the same weights on a 4x corpus removes the memorization
# capacity; with ~60 instances per character bigram the free-running
# decode has to generalize.
N_UTTS=${N_UTTS:-512}
mkdir -p "$LOG"

latest_step() {
  ls "$RUN/ckpt" 2>/dev/null | sed -n 's/^step_//p' | sort -n | tail -1
}

for attempt in $(seq 1 40); do
  at=$(latest_step); at=${at:-0}
  left=$((TOTAL - at))
  if [ "$left" -le 0 ]; then
    echo "$(date -u +%H:%M:%S) done at step $at" >> "$LOG/log"
    exit 0
  fi
  resume=""
  if [ "$at" -gt 0 ]; then resume="--resume-from $RUN"; fi
  echo "$(date -u +%H:%M:%S) attempt $attempt from step $at ($left left)" >> "$LOG/log"
  timeout 14400 python scripts/alignment_run.py \
    --preset full_1chip --set model.r=5 \
    --char-sec 0.06 --char-sec-jitter 0.3 \
    --n-utts "$N_UTTS" --text-len 20 --batch-size 32 \
    --steps "$left" --save-every 2500 --log-every 250 \
    --out "$OUT" --save-run "$RUN" $resume \
    >> "$LOG/train.log" 2>&1
  rc=$?
  echo "$(date -u +%H:%M:%S) attempt $attempt exited rc=$rc" >> "$LOG/log"
  [ "$rc" -eq 0 ] && exit 0
  sleep 120
done
echo "$(date -u +%H:%M:%S) GAVE UP" >> "$LOG/log"
exit 1
