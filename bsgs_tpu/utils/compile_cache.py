"""Persistent XLA compile cache enablement.

Setting JAX_COMPILATION_CACHE_DIR via os.environ is NOT enough in this
deployment: the TPU transport's sitecustomize hook imports jax at
interpreter startup, so jax's config snapshot of the env vars is taken
before any application code runs and the cache silently stays disabled
(round-3 postmortem: every fresh process re-paid ~2 min of kernel
compiles; the round-1/2 "cache" never existed). jax.config.update after
import is authoritative, so this helper is what bench.py, the CLI, tests,
and the tools call first.

The cached entries are full serialized TPU executables (Mosaic kernels
included), so a warm cache removes Pallas compile latency entirely from
fresh processes — the remaining cold-start is the per-process device
claim through the transport, which no cache can remove.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/root/.cache/jax"


def enable(cache_dir: str = DEFAULT_DIR) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    # env for child processes that import jax before calling us
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
