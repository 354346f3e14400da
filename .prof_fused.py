"""Time the fused Pallas epoch kernels on the real TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from bsgs_tpu.ops import field as F, epoch_kernel as EK
from bsgs_tpu.models import giant

T = int(os.environ.get("T", "4"))
N = int(os.environ.get("N", str(1 << 18)))
C = int(os.environ.get("C", "64"))
W = int(os.environ.get("W", "256"))
HTSZ = 24

rng = np.random.default_rng(0)
def rand_pl(n):
    return jnp.asarray(rng.integers(0, 1 << 16, (F.NLIMBS, n), dtype=np.uint32))
ox, oy = rand_pl(N), rand_pl(N)
cx, cy = rand_pl(T), rand_pl(T)

f = jax.jit(lambda *a: EK.epoch_landing_keys(*a, htsz=HTSZ, chunk_c=C, lanes_w=W))
t0 = time.time()
out = jax.block_until_ready(f(cx, cy, ox, oy))
print(f"compile+first: {time.time()-t0:.1f}s")
REPS = 5
t0 = time.time()
for _ in range(REPS):
    out = jax.block_until_ready(f(cx, cy, ox, oy))
dt = (time.time() - t0) / REPS
pairs = T * N
print(f"epoch_landing_keys: {dt*1000:.1f} ms for {pairs} pairs -> "
      f"{2*pairs/dt/1e6:.1f}M landings/s")

# full fused epoch with a real-size dense table (random contents)
dense = jnp.asarray(rng.integers(0, 1 << 31, (1 << HTSZ, 16), dtype=np.int32).astype(np.uint32))
cinf = jnp.zeros(T, bool)
cxr = jnp.swapaxes(cx, 0, 1)
cyr = jnp.swapaxes(cy, 0, 1)
g = jax.jit(lambda *a: giant.run_epoch_fused(*a, htsz=HTSZ, chunk_c=C, lanes_w=W, hit_cap=512))
r = jax.block_until_ready(g(cxr, cyr, cinf, ox, oy, dense))
t0 = time.time()
for _ in range(REPS):
    r = jax.block_until_ready(g(cxr, cyr, cinf, ox, oy, dense))
dt = (time.time() - t0) / REPS
gs = (2 * N + 1) * T
print(f"run_epoch_fused: {dt*1000:.1f} ms -> {gs/dt/1e6:.1f}M giant-steps/s  (hits={int(r[1])})")
