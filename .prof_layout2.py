"""Pin down the fast vs slow gather paths: length, dtype, index origin."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np

key = jax.random.PRNGKey(0)
HT = 1 << 18
WIN = 16
dense = jax.random.randint(key, (HT, WIN), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)

def timeit(name, fn, *args, n=10):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = jax.block_until_ready(fn(*args))
    print(f"{name:44s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

probe = jax.jit(lambda b, d: jnp.any(dense[b] == d[:, None], axis=-1))

for B in [1 << 20, (1 << 20) + 4, 1572868, 1572992]:
    b = jax.random.randint(key, (B,), 0, HT, dtype=jnp.int32).astype(jnp.uint32)
    d = jax.random.randint(key, (B,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    r = timeit(f"probe B={B} (%128={B%128})", probe, b, d)
    # correctness spot check
    bn, dn, rn = np.asarray(b[:64]), np.asarray(d[:64]), np.asarray(r[:64])
    expect = (np.asarray(dense)[bn] == dn[:, None]).any(-1)
    assert (rn == expect).all(), "WRONG RESULT"

# int32 vs uint32 indices
B = 1 << 20
b32 = jax.random.randint(key, (B,), 0, HT, dtype=jnp.int32)
d = jax.random.randint(key, (B,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
timeit("probe int32 idx B=2^20", probe, b32, d)

# gather only, both dtypes
g = jax.jit(lambda b: dense[b])
timeit("gather only u32 idx", g, b32.astype(jnp.uint32))
timeit("gather only i32 idx", g, b32)

# bigger table (32 MB)
dense2 = jax.random.randint(key, (1 << 20, WIN), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
probe2 = jax.jit(lambda b, d: jnp.any(dense2[b] == d[:, None], axis=-1))
b2 = jax.random.randint(key, (B,), 0, 1 << 20, dtype=jnp.int32).astype(jnp.uint32)
timeit("probe 32MB table u32 idx", probe2, b2, d)
timeit("probe 32MB table i32 idx", probe2, b2.astype(jnp.int32), d)
