"""Benchmark gather strategies for the table probe on TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np

B = 1 << 20
W = 1 << 20
WIN = 16
key = jax.random.PRNGKey(0)
disc = jax.random.randint(key, (W + WIN,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
idx = jax.random.randint(key, (B,), 0, W, dtype=jnp.int32).astype(jnp.uint32)
d = jax.random.randint(key, (B,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
dense = jax.random.randint(key, (W // 4, WIN), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
bkt = (idx >> jnp.uint32(2)).astype(jnp.uint32)

def timeit(name, fn, *args, n=5):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = jax.block_until_ready(fn(*args))
    print(f"{name:32s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

# 1. current: vmap(dynamic_slice) window
f1 = jax.jit(lambda o: jax.vmap(lambda oo: jax.lax.dynamic_slice(disc, (oo,), (WIN,)))(o))
timeit("vmap dynamic_slice win16", f1, idx)

# 2. single-element gather
f2 = jax.jit(lambda o: disc[o])
timeit("single gather disc[idx]", f2, idx)

# 3. advanced indexing window: disc[idx[:,None]+arange(16)]
f3 = jax.jit(lambda o: disc[o[:, None] + jnp.arange(WIN, dtype=jnp.uint32)[None, :]])
timeit("adv-index win16", f3, idx)

# 4. 16 separate single gathers
def g4(o):
    return jnp.stack([disc[o + jnp.uint32(i)] for i in range(WIN)], axis=-1)
timeit("16x single gathers", jax.jit(g4), idx)

# 5. dense row gather (embedding-style): dense[bucket]
f5 = jax.jit(lambda b: dense[b])
timeit("dense row gather (B,16)", f5, bkt)

# 6. jnp.take along axis 0 rows
f6 = jax.jit(lambda b: jnp.take(dense, b, axis=0))
timeit("jnp.take rows", f6, bkt)

# 7. sort-based: sort probe keys only
f7 = jax.jit(lambda x: jax.lax.sort(x))
timeit("sort B u32 keys", f7, d)

# 8. searchsorted into table
f8 = jax.jit(lambda x: jnp.searchsorted(disc, x))
timeit("searchsorted B into W", f8, d)

# 9. one-hot matmul probe... skip (w too big)

# 10. dense row gather then compare (full probe replacement)
def probe_dense(b, dd):
    win = dense[b]
    return jnp.any(win == dd[:, None], axis=-1)
timeit("dense gather + compare", jax.jit(probe_dense), bkt, d)
