"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference had none [R]. The rebuild wires jax.profiler: a trace server
for live capture (tensorboard profile plugin or xprof), a context manager for
programmatic traces, and step timing that forces completion with a host read
(block_until_ready is unreliable on the axon platform — see BASELINE.md
protocol and scripts/tpu_smoke.py).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def enable_compilation_cache(path: str = "/tmp/jax_comp_cache") -> None:
    """Persistent XLA compilation cache shared across processes.

    First compile of the big graphs (200-step decode scan ~20 s, fused GL
    kernel ~20 s, each remote-compiled on axon) is paid once per machine
    instead of once per process. Safe no-op if the backend can't serialize.
    """
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def start_server(port: int = 9999):
    """Live profiling endpoint; connect with TensorBoard's profile plugin."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(x) -> float:
    """Device->host read that guarantees completion (axon-safe)."""
    return float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(x)[0])))


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds per call, completion-forced."""
    for _ in range(warmup):
        out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / iters
