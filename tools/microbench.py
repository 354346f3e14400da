"""Maintained TPU microbenchmarks for the probe/memory subsystem.

Folds the round-2/3 scratch benches (bench_gather*, bench_probe3-6,
probe_gather_caps) into one entry point; their conclusions live in
PROFILE_r03.md/PROFILE_r04.md. Subcommands:

  gather  - dense-row gather issue rate vs row width and split count
            (the probe hot op: measured issue-bound ~9-13 ns/row on v5e)
  memops  - lax.sort / scatter-add / scalar-gather element rates at scale
            (the building blocks of any alternative membership test)
  probe   - end-to-end probe_keys_split on a real packed table across
            (htsz, window) layouts at matched w
  epoch   - one fused epoch end-to-end at the bench geometry

Run on the real chip: python tools/microbench.py <sub> [opts]. Results are
forced to the host (np.asarray) because block_until_ready is a no-op on
the axon transport (PROFILE_r03.md).
"""

import argparse
import os
import time

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bsgs_tpu.utils import compile_cache
compile_cache.enable()

import numpy as np


def _force(x):
    """Force device completion with a real readback (block_until_ready is
    a no-op on the axon tunnel)."""
    import jax.numpy as jnp

    return np.asarray(jnp.sum(x.astype(jnp.uint32)))


def _time(fn, *args, reps=5):
    """Best-of-reps wall time of fn(*args) with forced completion."""
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _force(fn(*args))
        best = min(best, time.time() - t0)
    return best


def gather_sweep(n_rows_log2=20, n_probes=1 << 21, widths=(1, 16, 32, 48,
                 64, 128), splits=(1, 4, 8, 16)):
    """ns per gathered row vs row width (u32 lanes) and split count."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rows = 1 << n_rows_log2
    idx = jnp.asarray(rng.integers(0, rows, n_probes).astype(np.uint32))
    print(f"gather: {n_probes} probes over 2^{n_rows_log2} rows")
    print(f"{'width(B)':>9} " + " ".join(f"split={s:<2}" for s in splits))
    for wdt in widths:
        tab = jnp.asarray(rng.integers(0, 1 << 32, (rows, wdt),
                                       dtype=np.uint32))
        line = f"{wdt * 4:>9} "
        for s in splits:
            def g(idx, tab, s=s):
                m = idx.shape[0] // s
                parts = []
                for i in range(s):
                    part = jax.lax.slice_in_dim(idx, i * m, (i + 1) * m)
                    parts.append(tab[part].max(axis=-1))
                return jnp.concatenate(parts)

            gj = jax.jit(g)
            dt = _time(gj, idx, tab)
            line += f"{dt / n_probes * 1e9:7.2f}ns "
        print(line, flush=True)


def memops(n=1 << 26):
    """Element rates of the memory-system primitives."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    p1 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    p2 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    sort3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1)[0])
    dt = _time(sort3, k, p1, p2)
    print(f"lax.sort {n} (1 key + 2 payloads): {dt:.3f}s "
          f"({dt / n * 1e9:.1f} ns/elt)")
    rows = 1 << 20
    idx = jnp.asarray(rng.integers(0, rows, n).astype(np.uint32))
    scat = jax.jit(lambda i, v: jnp.zeros((rows,), jnp.uint32).at[i].add(v))
    dt = _time(scat, idx, k)
    print(f"scatter-add {n} -> 2^20: {dt:.3f}s ({dt / n * 1e9:.1f} ns/elt)")
    tabs = jnp.asarray(rng.integers(0, 1 << 32, rows, dtype=np.uint32))
    gath = jax.jit(lambda i, t: t[i])
    dt = _time(gath, idx, tabs)
    print(f"scalar gather {n} from 2^20: {dt:.3f}s "
          f"({dt / n * 1e9:.1f} ns/elt)", flush=True)


def probe_layouts(w_bits=26, n_probes=1 << 21,
                  layouts=((20, 128), (21, 64), (22, 48), (23, 32),
                           (24, 16))):
    """End-to-end probe rate across (htsz, window) table layouts at one w.

    Uses synthetic uniform prefixes (layout cost is what is measured; the
    probe math is identical to models/table.probe_keys_split).
    """
    import jax
    import jax.numpy as jnp
    from bsgs_tpu.models import table as T

    rng = np.random.default_rng(2)
    w = 1 << w_bits
    pre = rng.integers(0, 1 << 64, w, dtype=np.uint64)
    ph = jnp.asarray(rng.integers(0, 1 << 32, n_probes, dtype=np.uint32))
    pl = jnp.asarray(rng.integers(0, 1 << 32, n_probes, dtype=np.uint32))
    for htsz, window in layouts:
        nb = 1 << htsz
        bucket = (pre >> np.uint64(64 - htsz)).astype(np.int64)
        disc = (pre >> np.uint64(32 - htsz)).astype(np.uint32)
        order = np.argsort(bucket, kind="stable")
        counts = np.bincount(bucket, minlength=nb)
        if counts.max() > window:
            print(f"htsz={htsz} window={window}: overflow "
                  f"(max {counts.max()}), skipped")
            continue
        dense_h = np.full((nb, window), T.DENSE_FILL, np.uint32)
        within = np.arange(w) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        dense_h[bucket[order], within] = disc[order]
        dense = jnp.asarray(dense_h)

        @jax.jit
        def pr(ph, pl, dense):
            b, d = T.bucket_disc(ph, pl, htsz)
            return T.probe_keys_split(b, d, dense, n_split=8)

        dt = _time(pr, ph, pl, dense)
        print(f"htsz={htsz:2d} window={window:3d} "
              f"({window * 4:4d} B rows, {nb * window * 4 / 2**20:6.0f} "
              f"MiB): {dt / n_probes * 1e9:6.2f} ns/probe", flush=True)


def dmaprobe(htsz=20, n_probes=1 << 18, groups=(128, 256, 512)):
    """Pallas in-kernel DMA probe vs the XLA gather probe, same table
    and key stream (round-5 item 2a: is the ~9.5 ns/probe floor XLA's
    descriptor path or the hardware's?)."""
    import jax
    import jax.numpy as jnp
    from bsgs_tpu.models import table as T
    from bsgs_tpu.ops.probe_kernel import probe_rows_dma

    rng = np.random.default_rng(4)
    rows = 1 << htsz
    dense = jnp.asarray(
        rng.integers(0, 1 << 32, (rows, 128), dtype=np.uint32)
    )
    bucket = jnp.asarray(rng.integers(0, rows, n_probes).astype(np.uint32))
    disc = jnp.asarray(rng.integers(0, 1 << 32, n_probes, dtype=np.uint32))

    @jax.jit
    def xla8(b, d, t):
        return T.probe_keys_split(b, d, t, n_split=8)

    dt = _time(xla8, bucket, disc, dense)
    print(f"XLA gather n_split=8   : {dt / n_probes * 1e9:6.2f} ns/probe")
    for g in groups:
        fn = jax.jit(lambda b, d, t, g=g: probe_rows_dma(b, d, t, group=g))
        try:
            dt = _time(fn, bucket, disc, dense)
        except Exception as e:  # Mosaic limits (SMEM, sem count) vary
            print(f"pallas DMA group={g:4d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        print(f"pallas DMA group={g:4d}: {dt / n_probes * 1e9:6.2f} "
              f"ns/probe", flush=True)


def epoch(w_bits=26, n_offsets=1 << 18, jobs=8, n_split=8):
    from bsgs_tpu.models import solver as smod
    from bsgs_tpu.utils import ecpy

    cfg = smod.SolverConfig(w=1 << w_bits, n_offsets=n_offsets,
                            jobs_per_epoch=jobs, n_split=n_split)
    t0 = time.time()
    baby = smod.build_table(cfg)
    print(f"build: {time.time() - t0:.1f}s")
    s = smod.Solver(cfg, baby=baby)
    pub = ecpy.mul((1 << 200) + 12345)
    pk = 1 << 40
    s.solve(pub, pk, pk + cfg.keys_per_epoch - 1, max_epochs=1)  # warm
    t0 = time.time()
    res = s.solve(pub, pk, pk + 8 * cfg.keys_per_epoch - 1, max_epochs=8)
    dt = time.time() - t0
    print(f"epoch rate: {res.giant_steps / dt / 1e6:.1f} M steps/s")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sub", choices=["gather", "memops", "probe", "epoch",
                                   "dmaprobe"])
    p.add_argument("--w-bits", type=int, default=26)
    p.add_argument("--n-probes", type=int, default=1 << 21)
    args = p.parse_args()
    if args.sub == "gather":
        gather_sweep(n_probes=args.n_probes)
    elif args.sub == "memops":
        memops()
    elif args.sub == "probe":
        probe_layouts(w_bits=args.w_bits, n_probes=args.n_probes)
    elif args.sub == "dmaprobe":
        dmaprobe(n_probes=args.n_probes)
    else:
        epoch(w_bits=args.w_bits)


if __name__ == "__main__":
    main()
