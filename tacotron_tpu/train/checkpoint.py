"""Checkpoint / resume: atomic pytree snapshots (SURVEY.md §5.4).

Replaces the reference's ``tf.train.Saver``+Supervisor auto-restore [R] with
the same contract, automated: ``{params, batch_stats, opt_state, step, rng}``
written atomically (write to temp dir, fsync, rename), keep-latest-N, and
``latest()`` for always-resume semantics. Bit-identical resume is asserted by
a fault-injection test (SURVEY.md §5.3).

Multi-host: only process 0 writes (callers gate on multihost.is_primary());
arrays are gathered to host implicitly by np.asarray on addressable shards.

Format: one .npz of flattened leaves + a JSON treedef descriptor — no pickle,
no framework lock-in; a TF1-checkpoint converter can target the same layout
when/if reference weights appear (SURVEY.md §7.3 item 6).
"""

from __future__ import annotations

import json
import os
import re
import shutil

import numpy as np

import jax


_STEP_RE = re.compile(r"^step_(\d+)$")


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _to_host(leaf):
    """Materialise a (possibly sharded) leaf as a full host ndarray.

    Fully-addressable arrays (single process — incl. TP/DP sharded over local
    devices) assemble via np.asarray. Non-fully-addressable arrays (multi-
    process) are gathered with a collective — which is why save() must be
    called by EVERY process, not just the writer (see save()).
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


def save(ckpt_dir: str, step: int, tree, keep: int = 5) -> str | None:
    """Atomically write checkpoint `step_<N>` under ckpt_dir.

    Collective in multi-process runs: ALL processes must call (non-addressable
    shards are gathered with a collective); only process 0 touches the
    filesystem, and None is returned on the others.
    """
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": _to_host(l) for i, l in enumerate(leaves)}
    if jax.process_index() != 0:
        return None

    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"step_{step}"
    tmp = os.path.join(ckpt_dir, f".tmp_{name}")
    final = os.path.join(ckpt_dir, name)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "leaves.npz"), "wb") as f:
        np.savez(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    with open(os.path.join(tmp, "treedef.json"), "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves), "step": step}, f)
        f.flush()
        os.fsync(f.fileno())
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)

    _prune(ckpt_dir, keep)
    return final


def _prune(ckpt_dir: str, keep: int) -> None:
    steps = all_steps(ckpt_dir)
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)


def all_steps(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and os.path.exists(os.path.join(ckpt_dir, name, "treedef.json")):
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest(ckpt_dir: str) -> int | None:
    steps = all_steps(ckpt_dir)
    return steps[-1] if steps else None


def restore(ckpt_dir: str, target, step: int | None = None):
    """Restore into the structure of `target` (a template pytree).

    Returns (tree, step). Raises FileNotFoundError if no checkpoint exists.
    """
    if step is None:
        step = latest(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step}")
    data = np.load(os.path.join(path, "leaves.npz"))
    leaves, treedef = _flatten(target)
    with open(os.path.join(path, "treedef.json")) as f:
        meta = json.load(f)
    assert meta["n_leaves"] == len(leaves), (
        f"checkpoint has {meta['n_leaves']} leaves, target expects {len(leaves)} "
        "(model/optimizer config mismatch)"
    )
    if meta.get("treedef") is not None and meta["treedef"] != str(treedef):
        raise ValueError(
            f"checkpoint treedef does not match the target's — model/optimizer "
            f"config changed since this checkpoint was written ({path})"
        )
    # per-leaf shape/dtype validation with the offending pytree path named —
    # a leaf-count-preserving config change must fail HERE, not at apply time
    paths = jax.tree_util.tree_flatten_with_path(target)[0]
    new_leaves = []
    for i, ((keypath, tgt), _) in enumerate(zip(paths, leaves)):
        leaf = data[f"leaf_{i}"]
        tgt_shape = tuple(np.shape(tgt))
        tgt_dtype = np.asarray(tgt).dtype if not hasattr(tgt, "dtype") else tgt.dtype
        if tuple(leaf.shape) != tgt_shape or leaf.dtype != np.dtype(tgt_dtype):
            raise ValueError(
                f"checkpoint leaf {jax.tree_util.keystr(keypath)} has "
                f"shape/dtype {leaf.shape}/{leaf.dtype}, target expects "
                f"{tgt_shape}/{np.dtype(tgt_dtype)} ({path})"
            )
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), step
