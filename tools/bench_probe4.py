"""Round-3 probe decision bench: the final measurements that pick the design.

Questions this answers (all on the real chip):
  1. XLA 1D word gather ns/elt vs batch size and table size — is the
     ~24 ns/elt a fixed issue rate? (Answered: yes, ~23-24 ns/elt flat at
     2^21+, independent of table 2^24 words; see log below.)
  2. Does a (B,128) take_along_axis(axis=0) "per-lane column gather" lower
     to something faster than the generic gather at scale?
  3. Do two independent gathers in ONE program overlap (cost < 2x)?
  4. Device->host transfer bandwidth (for a host-pipelined probe).
  5. Host-side hash-probe throughput (numpy as stand-in; C++ will beat it).

NOTE: big tables must be passed as jit ARGUMENTS — a closure-captured
array is baked into the HLO as a constant and the axon remote_compile
endpoint rejects the oversized request (HTTP 413).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10


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
    rng = np.random.default_rng(11)

    # --- 1b. word gather, 2^26-word (256 MB) table, table passed as arg
    rows = 1 << 26
    tab1 = jnp.asarray(rng.integers(0, 2**31, rows, np.int64).astype(np.int32))
    m = 1 << 21
    ia = jnp.asarray(rng.integers(0, rows, m, np.int64).astype(np.int32))
    ib = jnp.asarray(rng.integers(0, rows, m, np.int64).astype(np.int32))

    @jax.jit
    def g1(i, t):
        v = t[i]
        return (i * 1664525 + 1013904223 + (v & 1)) % t.shape[0]

    timeit_chain("word gather 2^21 of 2^26 words", lambda i: g1(i, tab1),
                 ia, m)

    # --- 2. take_along_axis axis=0 at scale (per-lane column gather)
    rows2 = 1 << 19
    tab2 = jnp.asarray(
        rng.integers(0, 2**31, (rows2, 128), np.int64).astype(np.int32))

    @jax.jit
    def g2(i, t):
        v = jnp.take_along_axis(t, i, axis=0)
        return (i * 1664525 + 1013904223 + (v & 1)) % t.shape[0]

    for logb in (14, 16):
        B = 1 << logb
        idx2 = jnp.asarray(
            rng.integers(0, rows2, (B, 128), np.int64).astype(np.int32))
        timeit_chain(f"taa axis=0 (2^{logb},128) of (2^19,128)",
                     lambda i: g2(i, tab2), idx2, B * 128)

    # --- 3. two independent gathers in one program
    @jax.jit
    def g2x(ab, t):
        a, b = ab
        va = t[a]
        vb = t[b]
        n = t.shape[0]
        return ((a * 1664525 + 1013904223 + (va & 1)) % n,
                (b * 1664525 + 1013904223 + (vb & 1)) % n)

    timeit_chain("dual gather 2x2^21 of 2^26 (one jit)",
                 lambda ab: g2x(ab, tab1), (ia, ib), 2 * m)

    # --- 3b. u8 gather (does element width matter?)
    tab8 = jnp.asarray(rng.integers(0, 255, rows, np.int64).astype(np.uint8))

    @jax.jit
    def g8(i, t):
        v = t[i]
        return (i * 1664525 + 1013904223 + (v & 1).astype(jnp.int32)
                ) % t.shape[0]

    timeit_chain("u8 gather 2^21 of 2^26", lambda i: g8(i, tab8), ia, m)

    # --- 3c. 2-word row gather ((2^25, 2) table)
    tabr = tab1.reshape(1 << 25, 2)
    iar = jnp.asarray(rng.integers(0, 1 << 25, m, np.int64).astype(np.int32))

    @jax.jit
    def gr(i, t):
        v = t[i]
        return (i * 1664525 + 1013904223 + (v[:, 0] & 1)) % t.shape[0]

    timeit_chain("2-word row gather 2^21 of (2^25,2)",
                 lambda i: gr(i, tabr), iar, m)

    # --- 4. D2H bandwidth
    for mb in (4, 32):
        nbytes = mb << 20
        dev = jnp.asarray(rng.integers(0, 2**31, nbytes // 4, np.int64
                                       ).astype(np.int32))
        jax.block_until_ready(dev)
        np.asarray(dev)  # warm
        t0 = time.perf_counter()
        for _ in range(5):
            h = np.asarray(dev)
        dt = (time.perf_counter() - t0) / 5
        print(f"{'D2H ' + str(mb) + ' MB':58s} {dt*1e3:8.2f} ms "
              f"{nbytes/dt/1e9:7.2f} GB/s")

    # --- 4b. H2D bandwidth
    h = np.asarray(rng.integers(0, 2**31, (32 << 20) // 4, np.int64
                                ).astype(np.int32))
    jax.block_until_ready(jnp.asarray(h))
    t0 = time.perf_counter()
    for _ in range(5):
        d = jnp.asarray(h)
        jax.block_until_ready(d)
    dt = (time.perf_counter() - t0) / 5
    print(f"{'H2D 32 MB':58s} {dt*1e3:8.2f} ms {h.nbytes/dt/1e9:7.2f} GB/s")

    # --- 5. host-side probe throughput (numpy direct-map fp table)
    nslots = 1 << 27
    host_tab = rng.integers(0, 2**16, nslots, np.int64).astype(np.uint16)
    keys = rng.integers(0, nslots, 1 << 22, np.int64).astype(np.int64)
    fps = rng.integers(0, 2**16, 1 << 22, np.int64).astype(np.uint16)
    t0 = time.perf_counter()
    for _ in range(3):
        hit = host_tab[keys] == fps
    dt = (time.perf_counter() - t0) / 3
    print(f"{'host numpy probe 2^22 of 2^27 slots':58s} {dt*1e3:8.2f} ms "
          f"{dt/len(keys)*1e9:7.2f} ns/elt")
    import multiprocessing
    print(f"host cores: {multiprocessing.cpu_count()}")


if __name__ == "__main__":
    main()
