"""Multi-host control plane (SURVEY.md §2.4, §5.2, §5.8).

The reference has no multi-host story [R]. Here: `jax.distributed.initialize`
for rendezvous, `process_index`-gated host-0 I/O, barriers around checkpoint/
eval, and a debug-mode cross-host batch-hash agreement check (host-side
divergence is the main remaining hazard in a pure-functional program).
"""

from __future__ import annotations

import hashlib

import numpy as np

import jax


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent jax.distributed.initialize (no-op single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def batch_hash(batch_arrays) -> str:
    """Deterministic content hash of a host-local batch (debug divergence check,
    SURVEY.md §5.2)."""
    h = hashlib.sha256()
    for a in jax.tree_util.tree_leaves(batch_arrays):
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def assert_same_step(step: int) -> None:
    """Cross-host agreement on the step counter (cheap divergence guard)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        steps = multihost_utils.process_allgather(np.asarray(step))
        # explicit raise, not assert: these guards are the debug mechanism
        # for host divergence and must survive python -O
        if int(steps.min()) != int(steps.max()):
            raise RuntimeError(f"step divergence across hosts: {steps}")


def assert_same_shapes(batch_arrays) -> None:
    """Cross-host agreement on the batch SHAPES only (--debug-sync, every
    step): one 8-byte fingerprint allgather — cheap enough for per-step use,
    and it catches the bucket-schedule divergence (hazard (a) below) at the
    exact step it happens instead of deadlocking inside pjit."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    leaves = jax.tree_util.tree_leaves(batch_arrays)
    fp = hashlib.sha256(
        repr([(np.asarray(a).shape, str(np.asarray(a).dtype)) for a in leaves]
             ).encode()).digest()[:8]
    allg = multihost_utils.process_allgather(np.frombuffer(fp, np.uint8))
    if len({bytes(r) for r in allg}) != 1:
        raise RuntimeError(
            "hosts disagree on batch shapes (bucket divergence)")


def assert_shard_consistency(batch_arrays) -> None:
    """Debug-mode cross-host input-shard check (SURVEY.md §5.2, --debug-sync).

    Two host-side hazards GSPMD cannot catch: (a) hosts pick different bucket
    shapes for the same step -> shape mismatch/deadlock inside pjit; (b) hosts
    feed the SAME data (broken per-host sharding) -> silently train on
    duplicated batches. Gathers (shape fingerprint, content hash) from every
    process; shapes must agree, content hashes must be pairwise distinct.
    """
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    leaves = jax.tree_util.tree_leaves(batch_arrays)
    shape_fp = hashlib.sha256(
        repr([(np.asarray(a).shape, str(np.asarray(a).dtype)) for a in leaves]
             ).encode()).digest()[:8]
    content = bytes.fromhex(batch_hash(batch_arrays))
    packed = np.frombuffer(shape_fp + content, np.uint8)
    allg = multihost_utils.process_allgather(packed)          # (P, 16)
    shapes = {bytes(r[:8]) for r in allg}
    contents = [bytes(r[8:]) for r in allg]
    if len(shapes) != 1:
        raise RuntimeError(
            "hosts disagree on batch shapes (bucket divergence)")
    if len(set(contents)) != len(contents):
        raise RuntimeError(
            "duplicate batch content across hosts (per-host data sharding "
            "broken)")
