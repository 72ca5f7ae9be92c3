"""Two-process DP synthesis: the multi-host inference path end-to-end.

Each process holds the same prompt list and contributes its process-order
slice of the global batch (Synthesizer's multi-host branch); outputs are
allgathered, so BOTH processes must return the full batch and agree bitwise.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json, dataclasses
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, sys.argv[4])
from tacotron_tpu.config import MeshConfig, get_config
from tacotron_tpu.data.vocab import Vocab
from tacotron_tpu.infer import Synthesizer
from tacotron_tpu.models import Tacotron
from tacotron_tpu.parallel import make_mesh

cfg = get_config("tiny_cpu")
cfg = dataclasses.replace(
    cfg, model=dataclasses.replace(cfg.model, vocab_size=32,
                                   prenet_dropout=0.0))
vocab = Vocab.build(["abcdefghijklmnopqrstuvwxyz "])
model = Tacotron(cfg.model, train=False)
text = jnp.ones((2, 8), jnp.int32)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    text, jnp.full((2,), 8, jnp.int32),
    gt_mel=jnp.zeros((2, 2 * cfg.model.r, cfg.model.n_mels)))

mesh = make_mesh(MeshConfig())
assert mesh.devices.size == 4
s = Synthesizer(cfg, variables["params"], variables["batch_stats"], vocab,
                mesh=mesh)
out = s(["hello world", "abc", "two hosts"], n_steps=6, gl_iters=3,
        peak_normalize=False)
print(json.dumps({"pid": pid,
                  "shape": list(out["wavs"].shape),
                  "sum": float(np.abs(out["wavs"]).sum()),
                  "mel_sum": float(np.abs(out["mel"]).sum())}), flush=True)
"""


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

@pytest.mark.slow
@pytest.mark.timeout(600)
def test_two_process_synthesis_agrees():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), "2", port, REPO],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    import json

    results = [json.loads(o.strip().splitlines()[-1]) for o in outs]
    # full (unpadded) batch on both hosts, bitwise-identical outputs
    assert results[0]["shape"] == results[1]["shape"]
    assert results[0]["shape"][0] == 3
    np.testing.assert_allclose(results[0]["sum"], results[1]["sum"], rtol=0)
    np.testing.assert_allclose(results[0]["mel_sum"], results[1]["mel_sum"],
                               rtol=0)
