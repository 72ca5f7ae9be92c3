"""bench.py CLI misuse guards (ADVICE r4): every flag combination that would
measure one cell while LOOKING like another must error at argparse time,
before any device work. These run bench.py as a subprocess — the guards sit
before the jax import, so each call returns in well under a second."""

import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
BENCH = os.path.join(REPO, "bench.py")


def run_bench(*args):
    return subprocess.run([sys.executable, BENCH, *args], cwd=REPO,
                          capture_output=True, text=True, timeout=120)


@pytest.mark.parametrize("args,needle", [
    # device-cache without the pipeline would measure resident-batch
    (["--device-cache"], "--with-pipeline"),
    # pipeline flags with the synth metric would measure a resident synth
    # cell while looking like a pipeline cell (ADVICE r4)
    (["--metric", "synth", "--with-pipeline"], "train"),
    (["--metric", "synth", "--with-pipeline", "--device-cache"], "train"),
    # variant flags under the plain combined invocation would make the
    # driver-captured record ambiguous about what it measured
    (["--fused"], "explicit --metric"),
    (["--with-pipeline"], "explicit --metric"),
    (["--gl-momentum", "0.99"], "explicit --metric"),
], ids=["cache-no-pipeline", "synth-pipeline", "synth-cache",
        "both-fused", "both-pipeline", "both-momentum"])
def test_misuse_combinations_error_before_measuring(args, needle):
    r = run_bench(*args)
    assert r.returncode == 2, (r.returncode, r.stderr)
    assert needle in r.stderr
    assert r.stdout == ""          # no half-measurement escaped


def test_explicit_metric_allows_variant_flags():
    """The same variant flags parse fine under an explicit --metric train —
    only the plain combined invocation rejects them. --platform cpu with a
    bogus steps=0 exits AFTER argparse; we only assert it got past the
    guard (no argparse usage error on stderr)."""
    r = subprocess.run(
        [sys.executable, BENCH, "--metric", "train", "--with-pipeline",
         "--help"], cwd=REPO, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert "usage" in r.stdout
