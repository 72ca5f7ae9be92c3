"""CLI smoke tests: the three drivers run end-to-end as subprocesses
(reference workflow: preprocess -> train -> synthesize, SURVEY.md §3)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..", "..")


def _run(args, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(REPO)  # drops sitecustomize -> CPU
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # single CPU device (conftest sets 8 fakes)
    r = subprocess.run([sys.executable, "-m"] + args, capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=REPO)
    assert r.returncode == 0, f"{args} failed:\n{r.stderr[-3000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


def test_preprocess_cli(workdir):
    out = _run([
        "tacotron_tpu.cli.preprocess",
        "--corpus-dir", str(workdir / "corpus"),
        "--data-dir", str(workdir / "data"),
        "--preset", "tiny_cpu", "--synthetic", "6", "--chunk", "6",
    ])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n_utterances"] == 6


@pytest.mark.slow
def test_train_cli_and_resume(workdir):
    args = [
        "tacotron_tpu.cli.train",
        "--data-dir", str(workdir / "data"),
        "--run-dir", str(workdir / "run"),
        "--preset", "tiny_cpu", "--batch-size", "4", "--num-buckets", "1",
        "--summary-every", "5", "--checkpoint-every", "5",
    ]
    out = _run(args + ["--steps", "10", "--trace-steps", "4:6"])
    last = json.loads(out.strip().splitlines()[-1])
    assert last == {"done": True, "step": 10}
    # profiler trace captured around steps 4-6 (SURVEY.md §5.1)
    assert "trace written" in out
    assert os.path.isdir(os.path.join(str(workdir / "run"), "trace"))
    # resume picks up at 10 and runs to 12; --set override applies
    out = _run(args + ["--steps", "12", "--set", "model.tf_decoder=hoisted"])
    assert "resumed from step 10" in out
    assert json.loads(out.strip().splitlines()[-1])["step"] == 12


@pytest.mark.slow
def test_synthesize_cli(workdir):
    out = _run([
        "tacotron_tpu.cli.synthesize",
        "--run-dir", str(workdir / "run"),
        "--data-dir", str(workdir / "data"),
        "--out-dir", str(workdir / "out"),
        "--text", "hello world", "--steps", "6", "--gl-iters", "5",
        # overrides on the restored run config (audio fields reach the GL call)
        "--set", "audio.gl_trim_chunks=true", "--set", "audio.gl_momentum=0.9",
    ])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n"] == 1
    assert os.path.exists(os.path.join(str(workdir / "out"), "utt_000.wav"))
