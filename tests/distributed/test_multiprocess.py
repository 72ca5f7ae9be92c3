"""Multi-process distributed test: the DCN rendezvous code path.

SURVEY.md §4.3: "multi-process on one machine via jax.distributed.initialize
with local coordinator covers the DCN code path". Two processes, each with 2
fake CPU devices, run the identical DP train step over a 4-device global mesh
and must agree on the loss (gradient psum across processes).
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
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, sys.argv[4])
from tacotron_tpu.config import get_config
from tacotron_tpu.parallel import make_mesh
from tacotron_tpu.train.step import create_train_state, make_train_step
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

cfg = get_config("tiny_cpu")
cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, vocab_size=32),
                          train=dataclasses.replace(cfg.train, batch_size=8))
mesh = make_mesh(cfg.mesh)
assert mesh.devices.size == 4, mesh.devices
state = create_train_state(cfg, jax.random.PRNGKey(0))
step_fn = make_train_step(cfg, mesh)

b_local = cfg.train.batch_size // nproc
t_in, t_out = 16, 4 * cfg.model.r
rng = np.random.default_rng(7)  # SAME content on both hosts for determinism,
text_l = rng.integers(1, 30, (b_local, t_in)).astype(np.int32) + pid * 0  # per-host shard
lens_l = np.full((b_local,), t_in, np.int32)
mel_l = rng.random((b_local, t_out, cfg.model.n_mels)).astype(np.float32)
lin_l = rng.random((b_local, t_out, cfg.model.n_freq)).astype(np.float32)
fl_l = np.full((b_local,), t_out, np.int32)

def to_global(x):
    return multihost_utils.host_local_array_to_global_array(
        x, mesh, P(cfg.mesh.data_axis))

batch = tuple(to_global(a) for a in (text_l, lens_l, mel_l, lin_l, fl_l))
with mesh:
    state, metrics, _ = step_fn(state, *batch)
    state, metrics, _ = step_fn(state, *batch)
loss = float(metrics["total_loss"])
print(json.dumps({"pid": pid, "loss": loss, "step": int(state.step)}), flush=True)
"""


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

@pytest.mark.slow
@pytest.mark.timeout(600)
def test_two_process_dp_agrees():
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
    assert results[0]["step"] == results[1]["step"] == 2
    # both processes see the same global loss (psum'd over the mesh)
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)
