"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-chip
tests via 8-device CPU simulation). The real-TPU path is exercised by
bench.py, not the test suite.
"""

import os

# Force CPU regardless of the session platform (the driver may export
# JAX_PLATFORMS=axon/tpu): the suite needs the 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.makedirs("/root/.cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon site hook (PYTHONPATH=/root/.axon_site) force-prepends the TPU
# platform at import time, overriding JAX_PLATFORMS; config.update wins.
# The same early import also snapshots the cache env vars before this
# file runs, so the cache too is enabled via config.update
# (utils/compile_cache owns that workaround).
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bsgs_tpu.utils import compile_cache

compile_cache.enable()

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "fast: sub-second tier (pytest -m fast) for every-iteration runs",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
