"""Per-stage timing of one fused giant-step epoch on the real chip.

Breaks run_epoch_fused into its stages and times each in steady state
(block_until_ready between reps), so optimization follows evidence rather
than guesswork (VERDICT round 1, next-round item 1). Run on the TPU:

    python tools/profile_epoch.py [w_bits] [n_offsets_log2] [jobs]

Writes a human summary to stdout; pass --trace to also dump a
jax.profiler trace directory for xprof.
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=10, warmup=2, **kw):
    for _ in range(warmup):
        r = fn(*args, **kw)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args, **kw)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("w_bits", nargs="?", type=int, default=26)
    ap.add_argument("n_log2", nargs="?", type=int, default=18)
    ap.add_argument("jobs", nargs="?", type=int, default=4)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from bsgs_tpu.models import solver as smod, giant, table as T
    from bsgs_tpu.ops import epoch_kernel as EK, field as F
    from bsgs_tpu.utils import artifacts, ecpy

    w = 1 << args.w_bits
    htsz = max(4, args.w_bits - 2)
    n = 1 << args.n_log2
    jobs = args.jobs
    cfg = smod.SolverConfig(
        w=w, htsz=htsz, n_offsets=n, jobs_per_epoch=jobs,
        window=16, table_tile=1 << 18,
    )
    print(f"device={jax.devices()[0].device_kind} backend={jax.default_backend()}")
    print(f"w=2^{args.w_bits} htsz={htsz} N=2^{args.n_log2} T={jobs} "
          f"pairs/epoch={jobs*n} steps/epoch={(2*n+1)*jobs}")

    t0 = time.time()
    baby = artifacts.get_baby_table(
        w, htsz, window=16,
        cache_dir=os.environ.get("BENCH_CACHE", "/root/repo/.bench_cache"),
        tile=cfg.table_tile)
    print(f"table: {time.time()-t0:.1f}s (window={baby.window})")
    s = smod.Solver(cfg, baby=baby)
    assert s.fused, "fused path not engaged"

    pub = ecpy.mul((1 << 200) + 12345)
    q0 = ecpy.sub(pub, ecpy.mul(1 << 40))

    # --- stage 0: center generation (host EC + fill) -----------------------
    t_host0 = time.perf_counter()
    for rep in range(5):
        cx, cy, cinf = s.epoch_centers(q0, rep, jobs)
        jax.block_until_ready(cx)
    t_centers = (time.perf_counter() - t_host0) / 5
    cxp = jnp.swapaxes(cx, 0, 1)
    cyp = jnp.swapaxes(cy, 0, 1)

    C, W = cfg.chunk_c, cfg.lanes_w
    nb = n // (C * W)
    nl = F.NLIMBS

    # --- full fused epoch ---------------------------------------------------
    full = functools.partial(
        giant.run_epoch_fused, htsz=htsz, chunk_c=C, lanes_w=W,
        hit_cap=cfg.hit_cap, interpret=False)
    t_full, _ = timed(full, cx, cy, cinf, s.ox_pl, s.oy_pl, baby.dense,
                      reps=args.reps)

    # --- epoch_landing_keys (fwd + inv + bwd) -------------------------------
    elk = functools.partial(EK.epoch_landing_keys, htsz=htsz, chunk_c=C,
                            lanes_w=W, interpret=False)
    t_keys, keys = timed(elk, cxp, cyp, s.ox_pl, s.oy_pl, reps=args.reps)

    # --- fwd kernel alone ---------------------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cx_wide = jnp.repeat(cxp, 128, axis=1)
    cy_wide = jnp.repeat(cyp, 128, axis=1)
    ox_spec = pl.BlockSpec((nl, C * W), lambda t, jb: (0, jb),
                           memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((nl, 128), lambda t, jb: (0, t),
                          memory_space=pltpu.VMEM)
    pre_spec = pl.BlockSpec((nl, C * W), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)
    tot_spec = pl.BlockSpec((nl, W), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)
    fwd = jax.jit(lambda ox, cxw: pl.pallas_call(
        functools.partial(EK._fwd_kernel, C=C, W=W),
        grid=(jobs, nb),
        in_specs=[ox_spec, c_spec],
        out_specs=[pre_spec, tot_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nl, jobs * n), jnp.uint32),
            jax.ShapeDtypeStruct((nl, jobs * nb * W), jnp.uint32),
        ],
    )(ox, cxw))
    t_fwd, (pre, tot) = timed(fwd, s.ox_pl, cx_wide, reps=args.reps)

    # --- batch inversion of totals ------------------------------------------
    inv = jax.jit(functools.partial(EK.batch_inv_planar, chunk_c=C, lanes_w=W))
    t_inv, itot = timed(inv, tot, reps=args.reps)

    # --- bwd kernel alone ---------------------------------------------------
    out_spec = pl.BlockSpec((8, C * W), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)
    bwd = jax.jit(lambda ox, oy, cxw, cyw, pre, itot: pl.pallas_call(
        functools.partial(EK._bwd_kernel, C=C, W=W, htsz=htsz),
        grid=(jobs, nb),
        in_specs=[ox_spec, ox_spec, c_spec, c_spec, pre_spec, tot_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((8, jobs * n), jnp.uint32),
    )(ox, oy, cxw, cyw, pre, itot))
    t_bwd, out = timed(bwd, s.ox_pl, s.oy_pl, cx_wide, cy_wide, pre, itot,
                       reps=args.reps)

    # --- probe: two dense row gathers ----------------------------------------
    probe2 = jax.jit(lambda k, d: (T.probe_keys(k[0], k[1], d),
                                   T.probe_keys(k[2], k[3], d)))
    t_probe, _ = timed(probe2, keys, baby.dense, reps=args.reps)

    # --- mask + compaction ----------------------------------------------------
    def tail(keys, fp, fm, cinf, cx):
        exact = keys[4] != 0
        hc_hi, hc_lo = F.x_prefix64(cx)
        found_c = T.probe(hc_hi, hc_lo, baby.dense, htsz=htsz)
        mask = jnp.concatenate(
            [fp & ~exact, fm & ~exact, exact, found_c | cinf])
        return giant._mask_to_hits(mask, cfg.hit_cap)
    fp, fm = probe2(keys, baby.dense)
    t_tail, _ = timed(jax.jit(tail), keys, fp, fm, cinf, cx, reps=args.reps)

    steps = (2 * n + 1) * jobs
    print(f"\n--- per-epoch stage times ({args.reps} reps) ---")
    rows = [
        ("epoch_centers (host EC + fill)", t_centers),
        ("fwd kernel", t_fwd),
        ("batch_inv (totals)", t_inv),
        ("bwd kernel", t_bwd),
        ("probe gathers (2x)", t_probe),
        ("mask+compaction tail", t_tail),
        ("sum of stages", t_fwd + t_inv + t_bwd + t_probe + t_tail),
        ("epoch_landing_keys (fwd+inv+bwd)", t_keys),
        ("run_epoch_fused (full)", t_full),
    ]
    for name, t in rows:
        print(f"{name:36s} {t*1e3:9.2f} ms  {steps/t/1e6:9.1f} Msteps/s")
    print(f"\nfull-epoch rate: {steps / t_full / 1e6:.1f} Msteps/s "
          f"(VERDICT r1: 16.75; target >= 100)")

    if args.trace:
        d = "/tmp/bsgs_trace"
        with jax.profiler.trace(d):
            r = full(cx, cy, cinf, s.ox_pl, s.oy_pl, baby.dense)
            jax.block_until_ready(r)
        print(f"trace written to {d}")


if __name__ == "__main__":
    main()
