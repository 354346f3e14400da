"""Microbenchmark: random row-gather strategies on the real chip.

The epoch profile shows the baby-table probe (dense row gather) is ~70% of
epoch time at ~36ns/probe. This sweeps the design space: row width, table
size, index order, batch size, 1D word gather, fused dual probe — to find
the fastest formulation before redesigning the probe path.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    return dt


def main():
    rng = np.random.default_rng(7)
    M = 1 << 20  # probes per call

    print(f"{'case':58s} {'ms':>8s} {'ns/probe':>9s}")

    def report(name, dt, m=M):
        print(f"{name:58s} {dt*1e3:8.2f} {dt/m*1e9:9.1f}")

    # --- row gather: vary table rows x window
    for log_rows, window in [(24, 20), (24, 8), (24, 4), (24, 1),
                             (20, 20), (16, 20), (22, 16), (26, 4)]:
        rows = 1 << log_rows
        gib = rows * window * 4 / 2**30
        if gib > 6:
            continue
        tab = jnp.asarray(
            rng.integers(0, 2**32, (rows, window), dtype=np.uint64
                         ).astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, rows, M, dtype=np.int64
                                       ).astype(np.int32))
        disc = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint64
                                        ).astype(np.uint32))
        f = jax.jit(lambda t, i, d: jnp.any(t[i] == d[:, None], axis=-1))
        dt = timeit("x", f, tab, idx, disc)
        report(f"row gather rows=2^{log_rows} win={window} ({gib:.2f} GiB)",
               dt)
        # sorted indices
        sidx = jnp.sort(idx)
        dt = timeit("x", f, tab, sidx, disc)
        report(f"  ... presorted indices", dt)
        del tab

    # --- 1D word gather (bitmap-style)
    for log_words in [24, 27]:
        n = 1 << log_words
        tab1 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64
                                        ).astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, n, M, dtype=np.int64
                                       ).astype(np.int32))
        f1 = jax.jit(lambda t, i: t[i])
        dt = timeit("x", f1, tab1, idx)
        report(f"1D word gather 2^{log_words} words ({n*4/2**30:.2f} GiB)",
               dt)

    # --- batch size scaling (window 8, 2^24 rows)
    tab = jnp.asarray(rng.integers(0, 2**32, (1 << 24, 8), dtype=np.uint64
                                   ).astype(np.uint32))
    for log_m in [18, 20, 22]:
        m = 1 << log_m
        idx = jnp.asarray(rng.integers(0, 1 << 24, m, dtype=np.int64
                                       ).astype(np.int32))
        disc = jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint64
                                        ).astype(np.uint32))
        f = jax.jit(lambda t, i, d: jnp.any(t[i] == d[:, None], axis=-1))
        dt = timeit("x", f, tab, idx, disc)
        report(f"batch 2^{log_m} probes, win=8 rows=2^24", dt, m)

    # --- two gathers in one program vs two programs
    idx = jnp.asarray(rng.integers(0, 1 << 24, M, dtype=np.int64
                                   ).astype(np.int32))
    idx2 = jnp.asarray(rng.integers(0, 1 << 24, M, dtype=np.int64
                                    ).astype(np.int32))
    disc = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint64
                                    ).astype(np.uint32))
    f2 = jax.jit(lambda t, i, j, d: (
        jnp.any(t[i] == d[:, None], axis=-1),
        jnp.any(t[j] == d[:, None], axis=-1)))
    dt = timeit("x", f2, tab, idx, idx2, disc)
    report("dual gather in one jit (2x 2^20, win=8)", dt, 2 * M)

    # --- gather expressed as one-level smaller rows: win=8 flat take
    flat = tab.reshape(-1)
    f3 = jax.jit(lambda t, i, d: jnp.any(
        jax.lax.dynamic_slice_in_dim(t, 0, t.shape[0]).reshape(-1, 8)[i]
        == d[:, None], axis=-1))
    # --- take with unique_indices hints
    f4 = jax.jit(lambda t, i, d: jnp.any(
        jnp.take(t, i, axis=0, indices_are_sorted=True) == d[:, None],
        axis=-1))
    sidx = jnp.sort(idx)
    dt = timeit("x", f4, tab, sidx, disc)
    report("take(sorted, indices_are_sorted=True) win=8", dt)


if __name__ == "__main__":
    main()
