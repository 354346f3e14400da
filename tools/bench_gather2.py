"""Follow-up gather microbench: u32 vs i32 indices, exact probe_keys
replication, and sanity checks on whether the fast numbers are real."""

import os
import time

os.makedirs("/root/.cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    m = 1 << 20
    print(f"{name:58s} {dt*1e3:8.2f} ms {dt/m*1e9:7.1f} ns/probe")
    return out


def main():
    rng = np.random.default_rng(7)
    M = 1 << 20
    rows, window = 1 << 24, 20
    tab = jnp.asarray(rng.integers(0, 2**32, (rows, window),
                                   dtype=np.uint64).astype(np.uint32))
    idx_i32 = jnp.asarray(rng.integers(0, rows, M, dtype=np.int64
                                       ).astype(np.int32))
    idx_u32 = idx_i32.astype(jnp.uint32)
    disc = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint64
                                    ).astype(np.uint32))

    f = jax.jit(lambda t, i, d: jnp.any(t[i] == d[:, None], axis=-1))
    timeit("win=20 i32 idx", f, tab, idx_i32, disc)
    timeit("win=20 u32 idx", f, tab, idx_u32, disc)

    # changing indices every rep (defeat any caching)
    idxs = [jnp.asarray(rng.integers(0, rows, M, dtype=np.int64
                                     ).astype(np.int32)) for _ in range(8)]
    outs = []
    f(tab, idxs[0], disc)
    jax.block_until_ready(idxs)
    t0 = time.perf_counter()
    for r in range(REPS):
        outs.append(f(tab, idxs[r % 8], disc))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'win=20 i32, fresh idx each rep':58s} {dt*1e3:8.2f} ms"
          f" {dt/M*1e9:7.1f} ns/probe")

    # keys coming as rows of an (8, M) u32 plane, like epoch output
    keys = jnp.asarray(rng.integers(0, 2**32, (8, M), dtype=np.uint64
                                    ).astype(np.uint32))
    keys = keys.at[0].set(idx_u32)  # row 0: bucket, row 1: disc

    def probe_from_plane(t, k):
        return jnp.any(t[k[0]] == k[1][:, None], axis=-1)

    timeit("probe from (8,M) plane rows, u32", jax.jit(probe_from_plane),
           tab, keys)

    # sum-only consumer (the usual no-hit epoch path)
    g = jax.jit(lambda t, i, d: jnp.sum(
        jnp.any(t[i] == d[:, None], axis=-1)))
    timeit("win=20 i32 idx, sum-consumer", g, tab, idx_i32, disc)


if __name__ == "__main__":
    main()
