"""Honest gather-strategy timing on TPU (scalar readback each rep)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np

B = 1 << 21          # probes per epoch scale
HT = 1 << 24         # buckets
rng = np.random.default_rng(0)
bkt = jnp.asarray(rng.integers(0, HT, B, dtype=np.int64).astype(np.uint32))
d = jnp.asarray(rng.integers(0, 1 << 31, B, dtype=np.int64).astype(np.uint32))

def timeit(name, fn, *args, n=3):
    r = fn(*args); _ = int(jax.block_until_ready(r))
    t0 = time.time()
    for _ in range(n): _ = int(fn(*args))
    dt = (time.time()-t0)/n
    print(f"{name:36s} {dt*1000:9.2f} ms  {dt/B*1e9:6.2f} ns/probe")

for WIN in (16, 8, 4):
    dense = jnp.asarray(rng.integers(0, 1 << 31, (HT, WIN), dtype=np.int64).astype(np.uint32))
    f = jax.jit(lambda b, dd: jnp.sum(jnp.any(dense[b] == dd[:, None], axis=-1).astype(jnp.int32)))
    timeit(f"row gather win={WIN}", f, bkt, d)

# element-plane gathers: WIN separate (HT,) planes
for WIN in (4, 2):
    planes = [jnp.asarray(rng.integers(0, 1 << 31, HT, dtype=np.int64).astype(np.uint32)) for _ in range(WIN)]
    def mk(planes):
        def f(b, dd):
            acc = jnp.zeros(b.shape, bool)
            for p in planes:
                acc = acc | (p[b] == dd)
            return jnp.sum(acc.astype(jnp.int32))
        return jax.jit(f)
    timeit(f"{WIN}x element-plane gathers", mk(planes), bkt, d)

# single element gather (fingerprint-only table: 1 u32 per bucket)
plane = jnp.asarray(rng.integers(0, 1 << 31, HT, dtype=np.int64).astype(np.uint32))
f1 = jax.jit(lambda b, dd: jnp.sum((plane[b] == dd).astype(jnp.int32)))
timeit("1x element gather (u32 plane)", f1, bkt, d)

# u64-ish: gather from (HT, 2) rows
dense2 = jnp.asarray(rng.integers(0, 1 << 31, (HT, 2), dtype=np.int64).astype(np.uint32))
f2 = jax.jit(lambda b, dd: jnp.sum(jnp.any(dense2[b] == dd[:, None], axis=-1).astype(jnp.int32)))
timeit("row gather win=2", f2, bkt, d)

# sorted probes help? sort by bucket first (count sort cost separately)
fs = jax.jit(lambda b: jnp.sum(jnp.sort(b)))
timeit("sort B u32 (for reference)", fs, bkt)
bs = jnp.sort(bkt)
f3 = jax.jit(lambda b, dd: jnp.sum((plane[b] == dd).astype(jnp.int32)))
timeit("1x element gather, SORTED idx", f3, bs, d)
