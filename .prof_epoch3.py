"""Epoch stage breakdown with REAL host syncs (block_until_ready does not
sync over the axon tunnel; force a scalar to host instead)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from bsgs_tpu.models import solver as smod, giant, table as T
from bsgs_tpu.ops import field as F, ec
from bsgs_tpu.utils import artifacts, ecpy

W_BITS, N, JOBS = 20, 1 << 18, 4
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
tj, nn = JOBS, N
B = tj * nn


def sync(r):
    # pull one scalar to host: forces completion of the whole graph feeding it
    leaves = jax.tree_util.tree_leaves(r)
    acc = 0
    for l in leaves:
        acc += int(l.ravel()[0].astype(jnp.int32)) if l.size else 0
    return acc


def timeit(name, fn, *args, n=5):
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*args))
    print(f"{name:40s} {(time.time()-t0)/n*1000:9.1f} ms")


# stage 1: denominators
@jax.jit
def stage_d(cx, cy, ox, oy):
    cxb = cx[:, None, :]
    d = F.sub_mod(ox[None], cxb).reshape(B, F.NLIMBS)
    exact = F.is_zero(d)
    return F._select(exact, F.broadcast_const(1, d.shape[:-1]), d), exact

timeit("d = sub_mod (B,16)", stage_d, cx, cy, ox, oy)
d_safe, exact = stage_d(cx, cy, ox, oy)

# stage 2: batch inversion
@jax.jit
def stage_inv(d):
    return ec.batch_inv(d, chunk=256, chain=True)

timeit("batch_inv chunk=256", stage_inv, d_safe)
inv_d = stage_inv(d_safe)

# stage 2b: just the 3-muls part (fwd scan + bwd scan without the Fermat)
@jax.jit
def one_mul(a, b):
    return F.mul_mod(a, b)
timeit("single mul_mod (B,16)", one_mul, d_safe, inv_d)
timeit("single sqr_mod (B,16)", jax.jit(F.sqr_mod), d_safe)

@jax.jit
def fermat_only(t):
    return F.inv_mod_chain(t)
tot_small = d_safe[: B // 256]
timeit("fermat on (B/256,16)", fermat_only, tot_small)

# stage 3: lambda + x for both branches
@jax.jit
def stage_lam(cx, cy, ox, oy, inv_d):
    cxb, cyb = cx[:, None, :], cy[:, None, :]
    iv = inv_d.reshape(tj, nn, F.NLIMBS)
    lam_p = F.mul_mod(F.sub_mod(oy[None], cyb), iv)
    xp = F.sub_mod(F.sub_mod(F.sqr_mod(lam_p), cxb), ox[None])
    lam_m = F.mul_mod(F.add_mod(oy[None], cyb), iv)
    xm = F.sub_mod(F.sub_mod(F.sqr_mod(lam_m), cxb), ox[None])
    return xp, xm

timeit("lambda+x both branches", stage_lam, cx, cy, ox, oy, inv_d)
xp, xm = stage_lam(cx, cy, ox, oy, inv_d)

# stage 4: prefixes + probe
@jax.jit
def stage_probe(xp, xm, cx):
    hp = F.x_prefix64(xp.reshape(B, F.NLIMBS))
    hm = F.x_prefix64(xm.reshape(B, F.NLIMBS))
    hc = F.x_prefix64(cx)
    all_hi = jnp.concatenate([hp[0], hm[0], hc[0]])
    all_lo = jnp.concatenate([hp[1], hm[1], hc[1]])
    return T.probe(all_hi, all_lo, dense, htsz=cfg.htsz)

timeit("prefix+probe (2B+T)", stage_probe, xp, xm, cx)

# full epoch
def full():
    return giant.run_epoch(cx, cy, cinf, ox, oy, dense, htsz=cfg.htsz,
                           chunk=cfg.chunk, hit_cap=cfg.hit_cap)
timeit("run_epoch full", full)
print(f"B = {B} lanes; giant steps/epoch = {(2*nn+1)*tj}")
