# TPU throughput profile at increasing scale, unbuffered
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time, jax, jax.numpy as jnp, numpy as np
print(jax.devices(), flush=True)
from bsgs_tpu.models import solver as smod
from bsgs_tpu.utils import ecpy

t0 = time.time()
cfg = smod.SolverConfig(w=1<<14, htsz=12, n_offsets=1<<14, jobs_per_epoch=4,
                        window=16, chunk=256, table_tile=1<<12)
s = smod.Solver(cfg)
print('setup', round(time.time()-t0,1), flush=True)
pub = ecpy.mul((1<<100)+12345)
pk = 1<<40
t0=time.time()
res = s.solve(pub, pk, pk + cfg.keys_per_epoch-1, max_epochs=1)
print('epoch1 compile+run', round(time.time()-t0,1), flush=True)
for trial in range(3):
    t0=time.time()
    res = s.solve(pub, pk, pk + 4*cfg.keys_per_epoch-1, max_epochs=4)
    dt=time.time()-t0
    print(f'rate {res.giant_steps/dt:,.0f} gsteps/s  (N=2^14, T=4, {dt:.2f}s)', flush=True)
