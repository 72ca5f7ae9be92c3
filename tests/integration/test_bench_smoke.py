"""End-to-end smoke of the driver's bench invocation (slow, CPU).

The driver runs plain ``python bench.py`` every round and archives the one
JSON line it prints as BENCH_r{N}.json — since r5 that line must carry BOTH
graded metrics (train primary + synth nested, VERDICT r4 next #3). This test
runs the real subprocess at tiny shapes on CPU and validates the record
shape, so a refactor can't silently break the driver's capture path."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..", "..")


@pytest.mark.slow
def test_default_invocation_emits_combined_record():
    r = subprocess.run(
        [sys.executable, "bench.py", "--platform", "cpu",
         "--steps", "2", "--warmup", "1", "--batch", "2",
         "--t-in", "16", "--t-out", "20", "--gl-iters", "2", "--iters", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=1200,
        env={**{k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
             # the test session's 8-fake-device XLA_FLAGS must not leak in:
             # batch 2 on an 8-device mesh fails the shard divisibility check
             "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_comp_cache"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line on stdout, got: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "train_frames_per_s_per_chip"
    assert rec["unit"] == "frames/s/chip" and rec["value"] > 0
    assert "vs_baseline" in rec
    synth = rec["synth"]
    assert synth["metric"] == "synth_audio_sec_per_s"
    assert synth["unit"] == "audio-seconds/s" and synth["value"] > 0
    # per-stage diagnostics go to stderr, never stdout
    diag = [json.loads(ln) for ln in r.stderr.splitlines()
            if ln.startswith("{")]
    assert any("gl_ms" in d for d in diag)
