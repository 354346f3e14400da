"""Is the ~36ms per probe call dispatch overhead or device time?

Chain K dependent gathers inside ONE jit; slope vs K = true device cost,
intercept = dispatch overhead.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from functools import partial

key = jax.random.PRNGKey(0)
HT = 1 << 18
dense = jax.random.randint(key, (HT, 16), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
B = 1 << 20
b = jax.random.randint(key, (B,), 0, HT, dtype=jnp.int32).astype(jnp.uint32)
d = jax.random.randint(key, (B,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)

def timeit(name, fn, *args, n=10):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:44s} {dt:9.2f} ms")
    return dt

@partial(jax.jit, static_argnames=("k",))
def probe_k(dense, b, d, *, k):
    acc = jnp.zeros((B,), bool)
    for i in range(k):
        acc = acc ^ jnp.any(dense[(b + jnp.uint32(i)) & jnp.uint32(HT - 1)] == d[:, None], axis=-1)
    return acc

t1 = timeit("probe k=1", partial(probe_k, k=1), dense, b, d)
t2 = timeit("probe k=2", partial(probe_k, k=2), dense, b, d)
t4 = timeit("probe k=4", partial(probe_k, k=4), dense, b, d)
t8 = timeit("probe k=8", partial(probe_k, k=8), dense, b, d)
per = (t8 - t1) / 7
print(f"per-gather device cost ~{per:.2f} ms, dispatch/overhead ~{t1-per:.2f} ms")
print(f"gather bytes: {B*16*4/1e6:.0f} MB -> {B*16*4/per/1e6:.1f} GB/s effective")

# noop dispatch overhead
@jax.jit
def nop(b, d):
    return b + d
timeit("elementwise add (B,)", nop, b, d)
