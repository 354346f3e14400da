"""Trustworthy timing: host readback each rep + scaling in T."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from bsgs_tpu.ops import field as F, epoch_kernel as EK

N, C, W = 1 << 18, 64, 256
HTSZ = 24
rng = np.random.default_rng(0)
def rand_pl(n):
    return jnp.asarray(rng.integers(0, 1 << 16, (F.NLIMBS, n), dtype=np.uint32))
ox, oy = rand_pl(N), rand_pl(N)

for T in (1, 4, 16):
    cx, cy = rand_pl(T), rand_pl(T)
    f = jax.jit(lambda cx, cy: jnp.sum(EK.epoch_landing_keys(
        cx, cy, ox, oy, htsz=HTSZ, chunk_c=C, lanes_w=W)[1]))
    r = jax.block_until_ready(f(cx, cy)); _ = int(r)
    REPS = 3
    t0 = time.time()
    for _ in range(REPS):
        _ = int(jax.block_until_ready(f(cx, cy)))
    dt = (time.time() - t0) / REPS
    pairs = T * N
    print(f"T={T:3d}: {dt*1000:8.2f} ms  {2*pairs/dt/1e6:9.1f}M landings/s")
