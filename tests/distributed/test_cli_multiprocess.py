"""CLI-level multi-host launch test (SURVEY.md §2.4, §5.8).

VERDICT.md round-1 item 5: the shipped train CLI must be able to rendezvous a
real multi-process run — not just the library-level step function. Two
subprocesses launch ``tacotron_tpu.cli.train`` with the
``--coordinator/--num-processes/--process-id`` flags (2 fake CPU devices
each -> a 4-device global mesh), sharing one preprocessed data dir. Exercises
end-to-end: ``multihost.initialize`` rendezvous, per-host loader shards,
``shard_batch``'s host-local -> global assembly, ``--debug-sync`` (step
agreement + input-shard distinctness), barriers + collective checkpoint save,
and host-0-gated writes.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def _env(n_local_devices=2):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drops sitecustomize -> CPU backend
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    return env


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_train_cli_two_processes(tmp_path):
    data = tmp_path / "data"
    run = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "-m", "tacotron_tpu.cli.preprocess",
         "--corpus-dir", str(tmp_path / "corpus"), "--data-dir", str(data),
         "--preset", "tiny_cpu", "--synthetic", "12", "--chunk", "6"],
        capture_output=True, text=True, timeout=300, env=_env(1), cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tacotron_tpu.cli.train",
             "--data-dir", str(data), "--run-dir", str(run),
             # num-buckets 3 over a length-diverse corpus: the hosts must
             # agree on the per-step bucket (= batch shape) sequence — the
             # shared-seed schedule (data/loader.py); --debug-sync checks
             # shape agreement EVERY step, so divergence fails loudly here
             # instead of deadlocking (VERDICT r2 weak #2)
             "--preset", "tiny_cpu", "--batch-size", "4", "--num-buckets", "3",
             "--steps", "6", "--summary-every", "3", "--checkpoint-every", "6",
             "--debug-sync",
             # multi-host eval: ALL processes join the param gather
             # (collective), only host 0 synthesizes — the round-2 fix for
             # the single-process-jit-on-sharded-state crash
             "--eval-every", "4", "--eval-text", "ab",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_env(2), cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"train CLI worker failed:\n{err[-3000:]}"
        outs.append(out)

    finals = [json.loads(o.strip().splitlines()[-1]) for o in outs]
    assert finals[0] == finals[1] == {"done": True, "step": 6}
    # host 0 (and only a complete checkpoint) exists; both processes took part
    # in the collective gather but only process 0 wrote
    from tacotron_tpu.train import checkpoint

    assert checkpoint.latest(str(run / "ckpt")) is not None
    # host-0 summaries written, config serialized once
    assert (run / "config.json").exists()
    # both processes printed the SAME global loss at the summary steps
    def losses(o):
        return [json.loads(l)["total_loss"] for l in o.strip().splitlines()
                if l.startswith("{") and "total_loss" in l]

    l0, l1 = losses(outs[0]), losses(outs[1])
    assert len(l0) == len(l1) >= 2
    for a, b in zip(l0, l1):
        assert abs(a - b) < 1e-6, (l0, l1)
