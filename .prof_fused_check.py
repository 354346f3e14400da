"""TPU-side correctness check of the fused kernels vs the XLA reference."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from bsgs_tpu.ops import field as F, ec, epoch_kernel as EK
from bsgs_tpu.models import table as T
from bsgs_tpu.utils import ecpy

TJ, N, C, W = 2, 1 << 15, 64, 256
HTSZ = 12
s = 2 * 64
s_g = ecpy.mul(s)
ox, oy = ec.fill_multiples(s_g, s_g, N)
q = ecpy.mul(123457)
step = ecpy.neg(ecpy.mul((2 * N + 1) * s))
m0 = ecpy.sub(q, ecpy.mul(N * s))
cx, cy, cinf = ec.fill_multiples(m0, step, TJ, with_inf=True)

keys = jax.block_until_ready(EK.epoch_landing_keys(
    jnp.swapaxes(cx, 0, 1), jnp.swapaxes(cy, 0, 1),
    jnp.swapaxes(ox, 0, 1), jnp.swapaxes(oy, 0, 1),
    htsz=HTSZ, chunk_c=C, lanes_w=W))

cxb = cx[:, None, :]
cyb = cy[:, None, :]
d = F.sub_mod(ox[None], cxb).reshape(TJ * N, F.NLIMBS)
exact = F.is_zero(d)
d_safe = F._select(exact, F.broadcast_const(1, d.shape[:-1]), d)
inv_d = ec.batch_inv(d_safe, chunk=256).reshape(TJ, N, F.NLIMBS)
lam_p = F.mul_mod(F.sub_mod(oy[None], cyb), inv_d)
xp = F.sub_mod(F.sub_mod(F.sqr_mod(lam_p), cxb), ox[None])
lam_m = F.mul_mod(F.add_mod(oy[None], cyb), inv_d)
xm = F.sub_mod(F.sub_mod(F.sqr_mod(lam_m), cxb), ox[None])
hp = F.x_prefix64(xp.reshape(-1, F.NLIMBS))
hm = F.x_prefix64(xm.reshape(-1, F.NLIMBS))
bp, dp = T.bucket_disc(hp[0], hp[1], HTSZ)
bm, dm = T.bucket_disc(hm[0], hm[1], HTSZ)
names = ["bucket+", "disc+", "bucket-", "disc-"]
for i, ref in enumerate([bp, dp, bm, dm]):
    got = np.asarray(keys[i])
    ref = np.asarray(ref)
    n_bad = int((got != ref).sum())
    print(f"{names[i]}: {n_bad}/{ref.size} mismatched")
print("exact:", int((np.asarray(keys[4]) != 0).sum()), "ref:", int(np.asarray(exact).sum()))
