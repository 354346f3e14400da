"""Validate the chosen probe design on-chip before implementation:

  1. (2^20, 128) u32 row gather + fp compare + OR-reduce, k-way split —
     the full new probe path at epoch scale (4M probes).
  2. Device-side scatter of 2^26 u32 (one-time table build cost).
  3. Device-side sort of 2^26 (u32,u32,u32) (build: sort by prefix).
"""

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
    # all inputs generated ON DEVICE: the tunnel H2D is ~30 MB/s, so
    # uploading hundreds of MB of random test data dominates everything.
    key = jax.random.PRNGKey(5)
    rows = 1 << 20
    tab = jax.jit(lambda k: jax.random.bits(k, (rows, 128), jnp.uint32))(key)
    jax.block_until_ready(tab)
    M = 1 << 22

    for k in (1, 4, 8, 16):
        m = M // k
        mk = jax.jit(lambda kk, m=m: (
            (jax.random.bits(kk, (m,), jnp.uint32) & jnp.uint32(rows - 1)
             ).astype(jnp.int32),
            jax.random.bits(jax.random.fold_in(kk, 1), (m,), jnp.uint32)))
        pairs = [mk(jax.random.fold_in(key, i)) for i in range(k)]
        buckets = tuple(p[0] for p in pairs)
        discs = tuple(p[1] for p in pairs)
        jax.block_until_ready((buckets, discs))

        @jax.jit
        def probe(bs, t, discs=discs):
            outs = []
            for b, d in zip(bs, discs):
                win = t[b]
                hit = jnp.any(win == d[:, None], axis=-1)
                outs.append((b * 1664525 + 1013904223
                             + hit.astype(jnp.int32)) % t.shape[0])
            return tuple(outs)

        timeit_chain(f"row128 gather+cmp {k}x2^{int(np.log2(m))}",
                     lambda bs: probe(bs, tab), buckets, M)

    # 2. scatter build cost: place 2^26 u32 at given flat indices
    n = 1 << 26
    flat = jax.jit(lambda k: jax.random.permutation(k, n).astype(jnp.int32))(key)
    vals = jax.jit(lambda k: jax.random.bits(k, (n,), jnp.uint32))(
        jax.random.fold_in(key, 7))
    jax.block_until_ready((flat, vals))

    @jax.jit
    def scat(i, v):
        out = jnp.zeros(n, jnp.uint32).at[i].set(v)
        return out

    out = scat(flat, vals)
    np.asarray(out[:8])
    t0 = time.perf_counter()
    for _ in range(3):
        out = scat(flat, vals)
    np.asarray(out[:8])
    dt = (time.perf_counter() - t0) / 3
    print(f"{'scatter 2^26 u32 (build)':58s} {dt*1e3:8.2f} ms "
          f"{dt/n*1e9:7.2f} ns/elt")

    # 3. sort build cost: 2-key sort of (hi, lo) + 1 value
    hi = jax.random.bits(jax.random.fold_in(key, 8), (n,), jnp.uint32)
    lo = jax.random.bits(jax.random.fold_in(key, 9), (n,), jnp.uint32)
    pos = jnp.arange(n, dtype=jnp.uint32)
    jax.block_until_ready((hi, lo))

    @jax.jit
    def srt(h, l, p):
        sh, sl, sp = jax.lax.sort((h, l, p), num_keys=2)
        return sh, sl, sp

    o = srt(hi, lo, pos)
    np.asarray(o[0][:8])
    t0 = time.perf_counter()
    for _ in range(3):
        o = srt(hi, lo, pos)
    np.asarray(o[0][:8])
    dt = (time.perf_counter() - t0) / 3
    print(f"{'2-key sort 2^26 (u32,u32)+val (build)':58s} {dt*1e3:8.2f} ms "
          f"{dt/n*1e9:7.2f} ns/elt")


if __name__ == "__main__":
    main()
