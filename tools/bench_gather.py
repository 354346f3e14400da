"""Microbenchmark: random row-gather strategies on the real chip.

The epoch profile shows the baby-table probe (dense row gather) is ~70% of
epoch time at ~36ns/probe. This sweeps the design space: row width, table
size, index order, batch size — to find the fastest formulation before
redesigning the probe path.

NOTE: on the axon backend block_until_ready does not actually block, so
every measurement here chains each rep's input on the previous rep's
output and the last output is pulled to the host. Calibrated against a
known-FLOPs matmul.
"""

import os
import time

os.makedirs("/root/.cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def timeit_chain(name, step, x0, m, reps=REPS):
    """step: x -> x' (same shape/dtype); times reps with a data chain."""
    x = step(x0)
    np.asarray(x)  # force completion to host
    x = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    np.asarray(x)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:8.2f} ms {dt/m*1e9:7.1f} ns/probe")
    return dt


def main():
    rng = np.random.default_rng(7)
    M = 1 << 20

    # calibration: chained matmul
    a = jnp.asarray(rng.standard_normal((8192, 8192)), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x: (x @ a))
    dt = timeit_chain("matmul 8192^3 bf16 chained", mm, a, M, reps=10)
    print(f"    -> {2*8192**3/dt/1e12:.0f} TFLOPs (v5e peak ~197)\n")

    # row gathers: perturb indices with the previous output so reps chain
    for log_rows, window in [(24, 20), (24, 8), (24, 4), (25, 8), (26, 4),
                             (20, 16), (16, 16), (12, 16)]:
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

        @jax.jit
        def step(i, tab=tab, disc=disc, rows=rows):
            hit = jnp.any(tab[i] == disc[:, None], axis=-1)
            return (i * 1664525 + 1013904223 + hit.astype(jnp.int32)) % rows

        timeit_chain(
            f"row gather rows=2^{log_rows} win={window} ({gib:.2f} GiB)",
            step, idx, M)
        del tab

    # sorted indices: sort inside the step (costs the sort, chained)
    rows, window = 1 << 24, 8
    tab = jnp.asarray(rng.integers(0, 2**32, (rows, window),
                                   dtype=np.uint64).astype(np.uint32))
    disc = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint64
                                    ).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, rows, M, dtype=np.int64
                                   ).astype(np.int32))

    @jax.jit
    def step_sorted(i):
        s = jnp.sort(i)
        hit = jnp.any(tab[s] == disc[:, None], axis=-1)
        return (i * 1664525 + 1013904223 + hit.astype(jnp.int32)) % rows

    timeit_chain("rows=2^24 win=8, sort+gather(sorted) fused", step_sorted,
                 idx, M)

    @jax.jit
    def step_sort_only(i):
        s = jnp.sort(i)
        return (i * 1664525 + s[0]) % rows

    timeit_chain("  sort 2^20 i32 alone", step_sort_only, idx, M)

    # presorted (ascending) index gather: how fast IS ordered access?
    base = np.sort(rng.integers(0, rows, M, dtype=np.int64)).astype(np.int32)
    sidx = jnp.asarray(base)

    @jax.jit
    def step_pre(i):
        hit = jnp.any(jnp.take(tab, i, axis=0, indices_are_sorted=True)
                      == disc[:, None], axis=-1)
        return i + (hit[0]).astype(jnp.int32)  # keeps ascending, chains

    timeit_chain("rows=2^24 win=8, presorted ascending idx", step_pre,
                 sidx, M)

    # 1D word gather (4 B payload)
    n = 1 << 27
    tab1 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64
                                    ).astype(np.uint32))
    idx1 = jnp.asarray(rng.integers(0, n, M, dtype=np.int64).astype(np.int32))

    @jax.jit
    def step1(i):
        v = tab1[i]
        return (i * 1664525 + 1013904223 + (v & 1).astype(jnp.int32)) % n

    timeit_chain("1D word gather 2^27 words (0.5 GiB)", step1, idx1, M)

    # batch scaling at win=8 rows=2^24
    for log_m in [18, 22]:
        m = 1 << log_m
        idxm = jnp.asarray(rng.integers(0, rows, m, dtype=np.int64
                                        ).astype(np.int32))
        discm = jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint64
                                         ).astype(np.uint32))

        @jax.jit
        def stepm(i, discm=discm):
            hit = jnp.any(tab[i] == discm[:, None], axis=-1)
            return (i * 1664525 + 1013904223 + hit.astype(jnp.int32)) % rows

        timeit_chain(f"batch 2^{log_m} probes win=8 rows=2^24", stepm,
                     idxm, m)


if __name__ == "__main__":
    main()
