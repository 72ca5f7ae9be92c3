"""Parameter sharding rules (SURVEY.md §2.3).

DP is the primary strategy; the ``model`` mesh axis exists so the widest
matmuls CAN shard when model_parallel_size > 1. For a ~7M-param Tacotron this
is never required for capacity — the rules keep the TP code path real
(exercised in tests on a fake multi-device mesh) rather than notional.

Sharded (output-column / row partitioning; GSPMD inserts the collectives):
  postnet linear_proj kernel/bias  (256 -> 1025, the widest projection)
  encoder embed table              (vocab x 256, rows over model axis)
Everything else is replicated. Rules match by PATH SUFFIX, so they apply
uniformly to params and to optimizer moments (Adam mu/nu mirror param paths).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tacotron_tpu.config import MeshConfig


def _spec_for(path: tuple, leaf, axis: str, axis_size: int) -> P:
    if axis_size <= 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
        return P()
    joined = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
    if joined.endswith("postnet/linear_proj/kernel") and leaf.shape[-1] % axis_size == 0:
        return P(None, axis)
    if joined.endswith("postnet/linear_proj/bias") and leaf.shape[-1] % axis_size == 0:
        return P(axis)
    if joined.endswith("encoder/embed/embedding") and leaf.shape[0] % axis_size == 0:
        return P(axis, None)
    return P()


def tree_shardings(tree, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """NamedSharding pytree for any state tree (params, TrainState, ...)."""
    axis_size = mesh.shape[cfg.model_axis]

    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, cfg.model_axis, axis_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


# back-compat aliases
param_shardings = tree_shardings
state_shardings = tree_shardings
