"""Per-stage timing of one fused epoch on the real chip.

Breaks the epoch into its pipeline stages and times each with
block_until_ready so the round-2 perf work attacks evidence, not guesses:
  1. epoch_landing_keys total (fwd kernel + batch inversion + bwd kernel)
  1a/1b/1c. the three sub-stages individually
  2. probe (dense row gather + compare) for +, -, center streams
  3. mask concat + count + compaction (_mask_to_hits)
  4. epoch_centers (per-epoch center fill)
  5. full fused epoch end-to-end (giant.run_epoch_fused)
"""

import os
import time

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bsgs_tpu.utils import compile_cache
compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from bsgs_tpu.models import solver as smod, giant, table as T
from bsgs_tpu.ops import epoch_kernel as EK, field as F
from bsgs_tpu.utils import artifacts, ecpy

W_BITS = int(os.environ.get("BENCH_W_BITS", "26"))
N_OFFSETS = int(os.environ.get("BENCH_N_OFFSETS", str(1 << 18)))
JOBS = int(os.environ.get("BENCH_JOBS", "4"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def timeit(name, fn, *args, reps=REPS, **kw):
    out = fn(*args, **kw)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    w = 1 << W_BITS
    cfg = smod.SolverConfig(
        w=w, n_offsets=N_OFFSETS, jobs_per_epoch=JOBS,
        table_tile=1 << 18,
    )
    htsz = cfg.htsz
    t0 = time.time()
    baby = smod.build_table(cfg)
    jax.block_until_ready(baby.dense)
    print(f"table ready in {time.time()-t0:.1f}s  htsz={htsz} "
          f"window={baby.window}")
    s = smod.Solver(cfg, baby=baby)
    print("fused:", s.fused, "backend:", jax.default_backend())

    pub = ecpy.mul((1 << 200) + 12345)
    q0 = ecpy.sub(pub, ecpy.mul(1 << 40))
    cx, cy, cinf = s.epoch_centers(q0, 0, cfg.jobs_per_epoch)
    jax.block_until_ready((cx, cy, cinf))

    tn = cfg.jobs_per_epoch * cfg.n_offsets
    gs_per_epoch = (2 * cfg.n_offsets + 1) * cfg.jobs_per_epoch

    # --- stage 4: center generation
    timeit("epoch_centers", lambda: s.epoch_centers(q0, 0, JOBS))

    # --- stage 1: landing keys (fused kernels + inversion)
    cxp = jnp.swapaxes(cx, 0, 1)
    cyp = jnp.swapaxes(cy, 0, 1)
    keys, t_keys = timeit(
        "epoch_landing_keys (fwd+inv+bwd)",
        EK.epoch_landing_keys, cxp, cyp, s.ox_pl, s.oy_pl, htsz=htsz,
    )

    # sub-stages — replicate the internals
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nl = F.NLIMBS
    C, W_l = cfg.chunk_c, cfg.lanes_w
    n = N_OFFSETS
    nb = n // (C * W_l)
    t_jobs = JOBS
    grid = (t_jobs, nb)
    cx_wide = jnp.repeat(cxp, 128, axis=1)
    cy_wide = jnp.repeat(cyp, 128, axis=1)
    ox_spec = pl.BlockSpec((nl, C * W_l), lambda t, jb: (0, jb),
                           memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((nl, 128), lambda t, jb: (0, t),
                          memory_space=pltpu.VMEM)
    pre_spec = pl.BlockSpec((nl, C * W_l), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)
    tot_spec = pl.BlockSpec((nl, W_l), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)

    fwd = jax.jit(lambda ox, cxw: pl.pallas_call(
        functools.partial(EK._fwd_kernel, C=C, W=W_l),
        grid=grid, in_specs=[ox_spec, c_spec],
        out_specs=[pre_spec, tot_spec],
        out_shape=[jax.ShapeDtypeStruct((nl, t_jobs * n), jnp.uint32),
                   jax.ShapeDtypeStruct((nl, t_jobs * nb * W_l), jnp.uint32)],
    )(ox, cxw))
    (pre, tot), t_fwd = timeit("  fwd kernel", fwd, s.ox_pl, cx_wide)

    inv = jax.jit(lambda t: EK.batch_inv_planar(t, chunk_c=C, lanes_w=W_l))
    itot, t_inv = timeit("  batch_inv_planar(tot)", inv, tot)

    out_spec = pl.BlockSpec((8, C * W_l), lambda t, jb: (0, t * nb + jb),
                            memory_space=pltpu.VMEM)
    bwd = jax.jit(lambda ox, oy, cxw, cyw, pre, itot: pl.pallas_call(
        functools.partial(EK._bwd_kernel, C=C, W=W_l, htsz=htsz),
        grid=grid,
        in_specs=[ox_spec, ox_spec, c_spec, c_spec, pre_spec, tot_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((8, t_jobs * n), jnp.uint32),
    )(ox, oy, cxw, cyw, pre, itot))
    _, t_bwd = timeit("  bwd kernel", bwd, s.ox_pl, s.oy_pl, cx_wide,
                      cy_wide, pre, itot)

    # --- stage 2: probes
    pk1 = jax.jit(T.probe_keys)
    _, t_p1 = timeit("probe_keys(+)", pk1, keys[0], keys[1], baby.dense)
    _, t_p2 = timeit("probe_keys(-)", pk1, keys[2], keys[3], baby.dense)
    ns = cfg.n_split
    pks = jax.jit(lambda b, d, t: T.probe_keys_split(b, d, t, n_split=ns))
    _, t_ps = timeit(f"probe_keys_split(+) n_split={ns}", pks,
                     keys[0], keys[1], baby.dense)

    def both_split(k0, k1, k2, k3, t):
        return (T.probe_keys_split(k0, k1, t, n_split=ns),
                T.probe_keys_split(k2, k3, t, n_split=ns))

    _, t_pb = timeit(f"both streams split n_split={ns} (one jit)",
                     jax.jit(both_split), keys[0], keys[1], keys[2],
                     keys[3], baby.dense)

    # --- stage 3: mask + compaction
    found_p = pk1(keys[0], keys[1], baby.dense)
    found_m = pk1(keys[2], keys[3], baby.dense)
    exact = keys[4] != 0
    hc_hi, hc_lo = F.x_prefix64(cx)
    found_c = T.probe(hc_hi, hc_lo, baby.dense, htsz=htsz)

    def mask_stage(found_p, found_m, exact, found_c, cinf):
        mask = jnp.concatenate([
            found_p & ~exact, found_m & ~exact, exact, found_c | cinf])
        return giant._mask_to_hits(mask, cfg.hit_cap)

    _, t_mask = timeit("mask+compaction", jax.jit(mask_stage),
                       found_p, found_m, exact, found_c, cinf)

    # --- stage 5: whole fused epoch
    def whole():
        return giant.run_epoch_fused(
            cx, cy, cinf, s.ox_pl, s.oy_pl, baby.dense,
            htsz=htsz, hit_cap=cfg.hit_cap)

    def whole_split():
        return giant.run_epoch_fused(
            cx, cy, cinf, s.ox_pl, s.oy_pl, baby.dense,
            htsz=htsz, hit_cap=cfg.hit_cap, n_split=cfg.n_split)

    _, t_all = timeit("run_epoch_fused (end-to-end)", whole)
    _, t_all2 = timeit("run_epoch_fused (split probes)", whole_split)

    print()
    print(f"giant steps/epoch: {gs_per_epoch:,}  pairs: {tn:,}")
    print(f"end-to-end rate: {gs_per_epoch/t_all/1e6:.1f} M steps/s")
    acc = t_fwd + t_inv + t_bwd + t_pb + t_mask
    print(f"sum of stages (split probes): {acc*1e3:.2f} ms vs end-to-end "
          f"{t_all2*1e3:.2f} ms")
    print(f"split-probe rate: {gs_per_epoch/t_all2/1e6:.1f} M steps/s")


if __name__ == "__main__":
    main()
