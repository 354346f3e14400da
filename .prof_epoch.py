"""Micro-profile of the giant-step epoch's stages on the real chip."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from bsgs_tpu.models import solver as smod, giant, table as T
from bsgs_tpu.ops import field as F, ec
from bsgs_tpu.utils import artifacts, ecpy

W_BITS = 20
N = 131072
JOBS = 4
w = 1 << W_BITS
cfg = smod.SolverConfig(w=w, htsz=W_BITS - 2, n_offsets=N, jobs_per_epoch=JOBS,
                        window=16, chunk=256, table_tile=1 << 18)
baby = artifacts.get_baby_table(w, cfg.htsz, window=16,
                                cache_dir="/root/repo/.bench_cache",
                                tile=cfg.table_tile)
s = smod.Solver(cfg, baby=baby)
q0 = ecpy.mul((1 << 200) + 12345)
cx, cy, cinf = s.epoch_centers(q0, 0, JOBS)

def timeit(name, fn, *args, n=3):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        jax.block_until_ready(r)
    print(f"{name:28s} {(time.time()-t0)/n*1000:9.1f} ms")
    return r

B = JOBS * N
ox, oy = s.ox, s.oy

# stage 1: denominators
f_d = jax.jit(lambda cx, ox: F.sub_mod(ox[None], cx[:, None, :]).reshape(B, F.NLIMBS))
d = timeit("sub_mod (denoms)", f_d, cx, ox)

# stage 2: batch inversion
f_inv = jax.jit(lambda d: ec.batch_inv(d, chunk=256, chain=True))
inv_d = timeit("batch_inv", f_inv, d)

# stage 2b: one mul_mod at full width
f_mul = jax.jit(F.mul_mod)
timeit("mul_mod (B)", f_mul, d, inv_d)

# stage 3: the 4-mulmod landing math
def landings(cx, cy, ox, oy, inv_d):
    cxb, cyb = cx[:, None, :], cy[:, None, :]
    ivd = inv_d.reshape(JOBS, N, F.NLIMBS)
    lam_p = F.mul_mod(F.sub_mod(oy[None], cyb), ivd)
    xp = F.sub_mod(F.sub_mod(F.sqr_mod(lam_p), cxb), ox[None])
    lam_m = F.mul_mod(F.add_mod(oy[None], cyb), ivd)
    xm = F.sub_mod(F.sub_mod(F.sqr_mod(lam_m), cxb), ox[None])
    return xp, xm
f_land = jax.jit(landings)
xp, xm = timeit("landing math (4 mulmod)", f_land, cx, cy, ox, oy, inv_d)

# stage 4: prefixes + probe
xp2 = xp.reshape(B, F.NLIMBS)
f_pre = jax.jit(F.x_prefix64)
hi, lo = timeit("x_prefix64", f_pre, xp2)
f_probe = jax.jit(lambda hi, lo: T.probe(hi, lo, baby.dense, htsz=baby.htsz))
found = timeit("probe (B)", f_probe, hi, lo)

# stage 5: mask + count + cond-extract
def tail(found):
    cnt = jnp.sum(found, dtype=jnp.int32)
    idxs = jax.lax.cond(
        cnt > 0,
        lambda m: jnp.where(jnp.nonzero(m, size=512, fill_value=-1)[0] >= 0,
                            jnp.nonzero(m, size=512, fill_value=-1)[0].astype(jnp.uint32),
                            jnp.uint32(0xFFFFFFFF)),
        lambda m: jnp.full((512,), jnp.uint32(0xFFFFFFFF)),
        found)
    return idxs, cnt
f_tail = jax.jit(tail)
timeit("count+extract tail", f_tail, found)

# whole epoch for reference
f_epoch = lambda: giant.run_epoch(cx, cy, cinf, ox, oy, baby.dense,
                                  htsz=cfg.htsz, chunk=cfg.chunk, hit_cap=cfg.hit_cap)
timeit("run_epoch (full)", f_epoch)
