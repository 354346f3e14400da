"""Layout experiments: 1-D vs 2-D streams for probe/mask/reduce ops."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np

B = 3 * (1 << 19) + 4  # mimic 3TN+T odd size
B128 = (B // 128 + 1) * 128
R = B128 // 128
key = jax.random.PRNGKey(0)
HT = 1 << 18
WIN = 16
dense = jax.random.randint(key, (HT, WIN), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
b1 = jax.random.randint(key, (B,), 0, HT, dtype=jnp.int32).astype(jnp.uint32)
d1 = jax.random.randint(key, (B,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
b2 = jax.random.randint(key, (R, 128), 0, HT, dtype=jnp.int32).astype(jnp.uint32)
d2 = jax.random.randint(key, (R, 128), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
f1d = jax.random.randint(key, (B,), 0, 2, dtype=jnp.int32) > 0
f2d = jax.random.randint(key, (R, 128), 0, 2, dtype=jnp.int32) > 0

def timeit(name, fn, *args, n=10):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = jax.block_until_ready(fn(*args))
    print(f"{name:40s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

timeit("sum bool 1-D (B,)", jax.jit(lambda m: jnp.sum(m, dtype=jnp.int32)), f1d)
timeit("sum bool 2-D (R,128)", jax.jit(lambda m: jnp.sum(m, dtype=jnp.int32)), f2d)
timeit("probe 1-D", jax.jit(lambda b, d: jnp.any(dense[b] == d[:, None], axis=-1)), b1, d1)
timeit("probe 2-D", jax.jit(lambda b, d: jnp.any(dense[b] == d[..., None], axis=-1)), b2, d2)
timeit("nonzero 1-D size512", jax.jit(lambda m: jnp.nonzero(m, size=512, fill_value=-1)[0]), f1d)

# cumsum-based compaction on 2-D
def compact2d(m):
    mi = m.astype(jnp.int32)
    flatpos = jnp.cumsum(mi.reshape(-1)) - 1
    return flatpos[-1]
timeit("cumsum flat from 2-D", jax.jit(compact2d), f2d)

# scatter-based extraction: positions of hits via scatter into (512,) buffer
def scatter_extract(m):
    mi = m.astype(jnp.uint32)
    flat = mi.reshape(-1)
    pos = jnp.cumsum(flat) - flat  # rank of each hit
    idx = jnp.arange(flat.shape[0], dtype=jnp.uint32)
    tgt = jnp.where(flat > 0, jnp.minimum(pos, 511), jnp.uint32(511))
    buf = jnp.full((512,), jnp.uint32(0xFFFFFFFF))
    return buf.at[tgt].set(jnp.where(flat > 0, idx, jnp.uint32(0xFFFFFFFF)))
timeit("scatter extract 2-D", jax.jit(scatter_extract), f2d)

# padded-to-128 1-D
bp = jnp.pad(b1, (0, B128 - B))
dp = jnp.pad(d1, (0, B128 - B))
timeit("probe 1-D padded128", jax.jit(lambda b, d: jnp.any(dense[b] == d[:, None], axis=-1)), bp, dp)
