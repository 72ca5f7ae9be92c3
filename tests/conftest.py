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

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
