"""Dissect epoch_probes overhead beyond raw probe cost."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from bsgs_tpu.models import solver as smod, giant, table as T
from bsgs_tpu.ops import field as F, ec
from bsgs_tpu.utils import artifacts, ecpy

W_BITS, N, JOBS = 20, 131072, 4
w = 1 << W_BITS
cfg = smod.SolverConfig(w=w, htsz=W_BITS - 2, n_offsets=N, jobs_per_epoch=JOBS,
                        window=16, chunk=256, table_tile=1 << 18)
baby = artifacts.get_baby_table(w, cfg.htsz, window=16,
                                cache_dir="/root/repo/.bench_cache",
                                tile=cfg.table_tile)
s = smod.Solver(cfg, baby=baby)
q0 = ecpy.mul((1 << 200) + 12345)
cx, cy, cinf = s.epoch_centers(q0, 0, JOBS)
ox, oy = s.ox, s.oy
dense = baby.dense

def timeit(name, fn, *args, n=5):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = jax.block_until_ready(fn(*args))
    print(f"{name:36s} {(time.time()-t0)/n*1000:9.1f} ms")
    return r

tj, nn = JOBS, N
B = tj * nn

def math_and_prefixes(cx, cy, cinf, ox, oy):
    cxb = cx[:, None, :]
    cyb = cy[:, None, :]
    d = F.sub_mod(ox[None], cxb).reshape(B, F.NLIMBS)
    exact = F.is_zero(d)
    d_safe = F._select(exact, F.broadcast_const(1, d.shape[:-1]), d)
    inv_d = ec.batch_inv(d_safe, chunk=256, chain=True).reshape(tj, nn, F.NLIMBS)
    lam_p = F.mul_mod(F.sub_mod(oy[None], cyb), inv_d)
    xp = F.sub_mod(F.sub_mod(F.sqr_mod(lam_p), cxb), ox[None])
    lam_m = F.mul_mod(F.add_mod(oy[None], cyb), inv_d)
    xm = F.sub_mod(F.sub_mod(F.sqr_mod(lam_m), cxb), ox[None])
    hp = F.x_prefix64(xp.reshape(B, F.NLIMBS))
    hm = F.x_prefix64(xm.reshape(B, F.NLIMBS))
    hc = F.x_prefix64(cx)
    return hp, hm, hc, exact

f1 = jax.jit(math_and_prefixes)
(hp, hm, hc, exact) = timeit("math+prefixes", f1, cx, cy, cinf, ox, oy)

def probes_only(hp, hm, hc):
    all_hi = jnp.concatenate([hp[0], hm[0], hc[0]])
    all_lo = jnp.concatenate([hp[1], hm[1], hc[1]])
    return T.probe(all_hi, all_lo, dense, htsz=cfg.htsz)
f2 = jax.jit(probes_only)
found = timeit("concat+probe (2TN+T)", f2, hp, hm, hc)

def mask_cnt(found, exact, cinf):
    tn = B
    mask = jnp.concatenate([
        found[:tn] & ~exact,
        found[tn:2*tn] & ~exact,
        exact,
        found[2*tn:] | cinf,
    ])
    return jnp.sum(mask, dtype=jnp.int32), mask
f3 = jax.jit(mask_cnt)
cnt, mask = timeit("mask+count", f3, found, exact, cinf)

def extract_cond(mask, cnt):
    def extract(m):
        (idx,) = jnp.nonzero(m, size=512, fill_value=-1)
        return jnp.where(idx >= 0, idx.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    return jax.lax.cond(cnt > 0, extract,
                        lambda m: jnp.full((512,), jnp.uint32(0xFFFFFFFF)), mask)
f4 = jax.jit(extract_cond)
timeit("cond extract (no hits)", f4, mask, cnt)

# everything fused as one jit (like run_epoch)
def full(cx, cy, cinf, ox, oy):
    hp, hm, hc, exact = math_and_prefixes(cx, cy, cinf, ox, oy)
    found = probes_only(hp, hm, hc)
    cnt, mask = mask_cnt(found, exact, cinf)
    idx = extract_cond(mask, cnt)
    return idx, cnt
f5 = jax.jit(full)
timeit("full fused (one jit)", f5, cx, cy, cinf, ox, oy)

f6 = lambda: giant.run_epoch(cx, cy, cinf, ox, oy, dense,
                             htsz=cfg.htsz, chunk=cfg.chunk, hit_cap=cfg.hit_cap)
timeit("run_epoch", f6)
