"""Device mesh and sharding helpers.

The reference is single-process single-device (SURVEY.md §2.3/§2.4 [R]);
this module is the rebuild's distribution layer: an explicit
``jax.sharding.Mesh`` with a ``data`` axis (primary: DP over utterance
batches) and a ``model`` axis kept in the API for the wide projections
(default size 1). Gradient all-reduce is emitted by jit/GSPMD as ``psum``
over ICI — no hand-written collectives (SURVEY.md §5.8).

A size-1 mesh on CPU runs the identical code path as a pod slice, which is
what makes the fake-device tests (conftest: 8 CPU devices) faithful.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tacotron_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    m = cfg.model_parallel_size
    assert n % m == 0, f"{n} devices not divisible by model_parallel_size={m}"
    grid = devices.reshape(n // m, m)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Leading axis over `data`, rest replicated."""
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Place a batch pytree on the mesh with batch-axis sharding.

    Single-process: a plain sharded ``device_put`` (the input IS the global
    batch). Multi-process: the loader yields each host's local shard
    (data/loader.py per-host sharding), so the shards are assembled into a
    global array — ``device_put`` alone would misread a local shard as the
    global batch.
    """
    s = batch_sharding(mesh, cfg)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(s, np.asarray(a)),
            batch)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)
