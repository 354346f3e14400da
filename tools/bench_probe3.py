"""Microbench for the round-3 probe redesign candidates.

The dense row gather costs ~36 ns/probe and is ~70% of epoch time
(tools/bench_gather.py). Candidate replacements all hinge on a few
primitive costs on the real chip:

  - sort: jax.lax.sort_key_val of the epoch's ~2M probe keys (sort-merge
    join needs the probes grouped by table position)
  - segment histogram: counts per table slab from sorted slab ids
  - scatter: is scatter as bad as gather?
  - sorted gather: does indices_are_sorted + actually-sorted indices make
    the XLA gather fast enough on its own?
  - word gather: is gather latency-bound (bytes don't matter)?

NOTE: on the axon backend block_until_ready does not reliably block, so
each rep chains its input on the previous output and the final output is
pulled to the host (same discipline as tools/bench_gather.py).
"""

import os
import time

os.makedirs("/root/.cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10
M = 1 << 21  # probes per epoch (2 streams x T*N at T=4, N=2^18)


def timeit_chain(name, step, x0, per, reps=REPS):
    x = step(x0)
    np.asarray(jax.tree.leaves(x)[0])
    x = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    np.asarray(jax.tree.leaves(x)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:8.2f} ms {dt/per*1e9:7.2f} ns/elt")
    return dt


def main():
    rng = np.random.default_rng(7)
    rows = 1 << 24
    win = 16

    # calibration
    a = jnp.asarray(rng.standard_normal((8192, 8192)), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x: (x @ a))
    dt = timeit_chain("matmul 8192^3 bf16 chained", mm, a, M, reps=6)
    print(f"    -> {2*8192**3/dt/1e12:.0f} TFLOPs (v5e peak ~197)\n")

    keys = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint64
                                    ).astype(np.uint32))
    vals = jnp.asarray(np.arange(M, dtype=np.uint32))

    # --- sort costs
    @jax.jit
    def s1(k):
        s = jnp.sort(k)
        return s ^ k  # chain

    timeit_chain(f"jnp.sort 2^21 u32", s1, keys, M)

    @jax.jit
    def s2(k):
        sk, sv = jax.lax.sort_key_val(k, vals)
        return sk ^ sv ^ k

    timeit_chain(f"sort_key_val 2^21 (u32,u32)", s2, keys, M)

    @jax.jit
    def s3(k):
        sk, sk2, sv = jax.lax.sort((k, k ^ jnp.uint32(123), vals),
                                   num_keys=2)
        return sk ^ sv ^ k

    timeit_chain(f"lax.sort 2-key u32 + val", s3, keys, M)

    k64 = jnp.asarray(rng.integers(0, 2**63, M, dtype=np.uint64))

    @jax.jit
    def s4(k):
        sk, sv = jax.lax.sort_key_val(k, vals)
        return sk ^ k

    timeit_chain(f"sort_key_val 2^21 (u64,u32)", s4, k64, M)

    # smaller sorts (per-job sorting option)
    for logm in (18, 19, 20):
        m = 1 << logm
        km = keys[:m]
        vm = vals[:m]

        @jax.jit
        def sm(k, vm=vm):
            sk, sv = jax.lax.sort_key_val(k, vm)
            return sk ^ sv ^ k

        timeit_chain(f"sort_key_val 2^{logm} (u32,u32)", sm, km, m)

    # --- segment histogram: counts of sorted ids into 2^16 bins
    ids_sorted = jnp.asarray(np.sort(
        rng.integers(0, 1 << 16, M, dtype=np.int64)).astype(np.int32))

    @jax.jit
    def hist_seg(i):
        h = jax.ops.segment_sum(jnp.ones_like(i), i, num_segments=1 << 16,
                                indices_are_sorted=True)
        return i + (h[0] // jnp.int32(1 << 30))

    timeit_chain("segment_sum hist 2^21 -> 2^16 bins (sorted)", hist_seg,
                 ids_sorted, M)

    @jax.jit
    def hist_unsorted(i):
        h = jax.ops.segment_sum(jnp.ones_like(i), i, num_segments=1 << 16)
        return i + (h[0] // jnp.int32(1 << 30))

    ids_rand = jnp.asarray(rng.integers(0, 1 << 16, M, dtype=np.int64
                                        ).astype(np.int32))
    timeit_chain("segment_sum hist 2^21 -> 2^16 bins (unsorted)",
                 hist_unsorted, ids_rand, M)

    # searchsorted: 2^16 slab boundaries into 2^21 sorted probes
    bounds = jnp.asarray((np.arange(1 << 16, dtype=np.int64)
                          << 5).astype(np.int32))

    @jax.jit
    def ss(i):
        pos = jnp.searchsorted(i, bounds)
        return i + (pos[0] // jnp.int32(1 << 30))

    timeit_chain("searchsorted 2^16 bounds in 2^21 sorted", ss, ids_sorted,
                 1 << 16)

    # --- scatter
    tgt_idx = jnp.asarray(rng.integers(0, rows, M, dtype=np.int64
                                       ).astype(np.int32))

    @jax.jit
    def scat(i):
        out = jnp.zeros(rows, jnp.uint32).at[i].set(jnp.uint32(1))
        return (i * 1664525 + 1013904223 + out[0].astype(jnp.int32)) % rows

    timeit_chain("scatter-set 2^21 -> 2^24 words", scat, tgt_idx, M)

    # --- gathers
    tab = jnp.asarray(rng.integers(0, 2**32, (rows, win), dtype=np.uint64
                                   ).astype(np.uint32))
    disc = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint64
                                    ).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, rows, M, dtype=np.int64
                                   ).astype(np.int32))

    @jax.jit
    def g_row(i):
        hit = jnp.any(tab[i] == disc[:, None], axis=-1)
        return (i * 1664525 + 1013904223 + hit.astype(jnp.int32)) % rows

    timeit_chain(f"row gather 2^24 x {win} (current probe)", g_row, idx, M)

    tab1 = jnp.asarray(rng.integers(0, 2**32, rows, dtype=np.uint64
                                    ).astype(np.uint32))

    @jax.jit
    def g_word(i):
        v = tab1[i]
        return (i * 1664525 + 1013904223 + (v & 1).astype(jnp.int32)) % rows

    timeit_chain("1D word gather 2^24 words", g_word, idx, M)

    sidx = jnp.asarray(np.sort(rng.integers(0, rows, M, dtype=np.int64)
                               ).astype(np.int32))

    @jax.jit
    def g_sorted(i):
        v = jnp.take(tab1, i, indices_are_sorted=True)
        return i + (v[0] & 1).astype(jnp.int32)

    timeit_chain("1D word gather, presorted idx + hint", g_sorted, sidx, M)

    @jax.jit
    def g_row_sorted(i):
        hit = jnp.any(jnp.take(tab, i, axis=0, indices_are_sorted=True)
                      == disc[:, None], axis=-1)
        return i + hit[0].astype(jnp.int32)

    timeit_chain("row gather 2^24 x 16, presorted idx + hint", g_row_sorted,
                 sidx, M)

    # gather into small (VMEM-sized) tables: does XLA specialize?
    for logr in (10, 13, 16):
        r = 1 << logr
        tabs = tab1[:r]
        idxs = jnp.asarray(rng.integers(0, r, M, dtype=np.int64
                                        ).astype(np.int32))

        @jax.jit
        def g_small(i, tabs=tabs, r=r):
            v = tabs[i]
            return (i * 1664525 + 1013904223 + (v & 1).astype(jnp.int32)) % r

        timeit_chain(f"1D word gather 2^{logr} words (small)", g_small,
                     idxs, M)

    # --- take_along_axis within rows of a 2D reshape (lane-local gather)
    tab2d = tab1.reshape(M, rows // M)

    @jax.jit
    def g_lane(i):
        col = (i % (rows // M))[:, None]
        v = jnp.take_along_axis(tab2d, col, axis=1)[:, 0]
        return (i * 1664525 + 1013904223 + (v & 1).astype(jnp.int32)
                ) % (1 << 24)

    timeit_chain("take_along_axis row-local gather", g_lane, idx, M)


if __name__ == "__main__":
    main()
