"""Full fused epoch timing incl. probe, larger T."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from bsgs_tpu.ops import field as F, epoch_kernel as EK
from bsgs_tpu.models import giant

N, C, W = 1 << 18, 64, 256
HTSZ = 24
rng = np.random.default_rng(0)
def rand_pl(n):
    return jnp.asarray(rng.integers(0, 1 << 16, (F.NLIMBS, n), dtype=np.uint32))
ox, oy = rand_pl(N), rand_pl(N)
dense = jnp.asarray(rng.integers(0, 1 << 31, (1 << HTSZ, 16), dtype=np.int32).astype(np.uint32))

for T in (16, 64):
    cx, cy = rand_pl(T), rand_pl(T)
    # keys only
    f = jax.jit(lambda cx, cy: jnp.sum(EK.epoch_landing_keys(
        cx, cy, ox, oy, htsz=HTSZ, chunk_c=C, lanes_w=W)[1]))
    _ = int(jax.block_until_ready(f(cx, cy)))
    t0 = time.time(); REPS = 3
    for _ in range(REPS): _ = int(f(cx, cy))
    dt = (time.time() - t0) / REPS
    pairs = T * N
    print(f"T={T:3d} keys-only : {dt*1000:8.1f} ms  {2*pairs/dt/1e6:8.1f}M landings/s")
    # full epoch with probe
    cinf = jnp.zeros(T, bool)
    cxr = jnp.swapaxes(cx, 0, 1); cyr = jnp.swapaxes(cy, 0, 1)
    g = jax.jit(lambda *a: giant.run_epoch_fused(*a, htsz=HTSZ, chunk_c=C, lanes_w=W, hit_cap=512))
    r = jax.block_until_ready(g(cxr, cyr, cinf, ox, oy, dense)); _ = int(r[1])
    t0 = time.time()
    for _ in range(REPS): _ = int(g(cxr, cyr, cinf, ox, oy, dense)[1])
    dt = (time.time() - t0) / REPS
    gs = (2 * N + 1) * T
    print(f"T={T:3d} full epoch: {dt*1000:8.1f} ms  {gs/dt/1e6:8.1f}M giant-steps/s")
