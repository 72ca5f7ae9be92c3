"""Test harness: force CPU with 8 virtual devices (SURVEY.md §4.3).

The full mesh/pjit/psum path is exercised on fake CPU devices; real-TPU runs
happen only in bench.py.

NOTE: this environment's sitecustomize imports jax at interpreter startup and
ships JAX_PLATFORMS=axon (one real TPU), so env vars set here are too late —
the backend must be redirected via jax.config before first backend init
(backends are lazy, so this works from conftest).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by ~25
# tests with 10-40 s jit compiles (full-model grads, GSPMD mesh programs).
# Warm-cache reruns skip those — the "hostile to iteration" cost is paid once
# per machine, not once per run. Keyed by backend + jax version internally.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (CLI subprocess + "
                          "multi-process tests, ~5 min extra)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test, skipped unless --runslow")
    config.addinivalue_line(
        "markers", "timeout(seconds): advisory cap (no pytest-timeout plugin "
                   "in this image; the mark is inert but documents intent)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
