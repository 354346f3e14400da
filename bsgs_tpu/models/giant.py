"""Giant-step epoch scan: the device hot loop.

Re-design of the reference GPU kernel `_test1` (decoded PTX,
bsgscudaussualHTchangeble1_7_3.pb:4979-6862; nvcc build
1_9_7File.pb:5181-23978) and its per-GPU launch loop (cuda(),
1_9_7File.pb:2095-2553) as a single jitted lax.scan:

- The precomputed offsets O_j = j*S*G (j = 1..N, S = 2w) are the analog of
  the reference's g2 giant buffer (Save_Load_Giants, 1_9_7File.pb:1905-2058)
  and stay device-resident in HBM.
- One scan step = one "job": a center point M probes the 2N+1 giant indices
  {m_c - N .. m_c + N} by computing x(M + O_j) and x(M - O_j) with ONE
  shared Montgomery-trick inversion per batch — the +/- pair shares the
  denominator (Ox - Mx), which is the TPU form of the reference's x2GS
  symmetry (hit codes 1/2).
- Degenerate lanes Ox == Mx mean M = +-O_j, i.e. an exact giant landing
  (reference hit code 4); the center's own X is probed too (code 5).
- Hits are compacted into a fixed-capacity record buffer with a running
  counter — no atomics on TPU; overflow is detected and the epoch re-run
  finer by the host (hits are astronomically rare, so the capacity is pure
  safety margin).
- T jobs are scanned per jit call, so the host syncs once per epoch, not
  per launch.

Hit record: (t, flat) uint32 where flat indexes [0,N): +branch at offset
j=flat+1; [N,2N): -branch; [2N,3N): exact landing; 3N: center probe.

``epoch_scan`` is the raw body (probe function pluggable) so that
bsgs_tpu/parallel can wrap it in shard_map for multi-chip range striping
and sharded-table probing.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F, ec
from . import table as T

_U32 = jnp.uint32
FILL = np.uint32(0xFFFFFFFF)


def make_probe(offsets, disc, *, htsz: int, window: int):
    """Default single-device probe closure over a replicated table."""

    def probe_fn(hi, lo):
        return T.probe(hi, lo, offsets, disc, htsz=htsz, window=window)

    return probe_fn


def step_probes(cx, cy, ox, oy, probe_fn, *, chunk):
    """All probe masks for one job center against all offsets.

    Returns (found_plus, found_minus, exact, center_found) with shapes
    (N,), (N,), (N,), (1,).
    """
    n = ox.shape[0]
    cxb = jnp.broadcast_to(cx, ox.shape)
    cyb = jnp.broadcast_to(cy, oy.shape)
    d = F.sub_mod(ox, cxb)
    exact = F.is_zero(d)  # M == +-O_j (code 4)
    d_safe = F._select(exact, F.broadcast_const(1, (n,)), d)
    inv_d = ec.batch_inv(d_safe, chunk=chunk)
    # x(M + O_j): lambda = (Oy - My) / (Ox - Mx)
    lam_p = F.mul_mod(F.sub_mod(oy, cyb), inv_d)
    xp = F.sub_mod(F.sub_mod(F.sqr_mod(lam_p), cxb), ox)
    # x(M - O_j) = x(M + (-O_j)): lambda' = (-Oy - My)/(Ox - Mx); only its
    # square is needed, so compute (Oy + My) * inv and square.
    lam_m = F.mul_mod(F.add_mod(oy, cyb), inv_d)
    xm = F.sub_mod(F.sub_mod(F.sqr_mod(lam_m), cxb), ox)

    hp_hi, hp_lo = F.x_prefix64(xp)
    hm_hi, hm_lo = F.x_prefix64(xm)
    hc_hi, hc_lo = F.x_prefix64(cx[None, :])
    all_hi = jnp.concatenate([hp_hi, hm_hi, hc_hi])
    all_lo = jnp.concatenate([hp_lo, hm_lo, hc_lo])
    found = probe_fn(all_hi, all_lo)
    found_p = found[:n] & ~exact
    found_m = found[n : 2 * n] & ~exact
    return found_p, found_m, exact, found[2 * n :]


def epoch_scan(
    centers_x,
    centers_y,
    centers_inf,
    ox,
    oy,
    probe_fn,
    *,
    chunk: int,
    hit_cap: int,
    per_job_cap: int,
):
    """Scan T jobs (one per center) against N device-resident offsets.

    centers_inf flags center lanes whose true value is the point at
    infinity (coords garbage): those are forced center hits — Q0 landed
    exactly on the job center, k0 = c_t * S.

    Returns (records (hit_cap, 2) uint32 with FILL padding, (1,) total_hits).
    """
    n = ox.shape[0]
    t_total = centers_x.shape[0]

    def job(carry, xs):
        buf, cnt = carry
        cx, cy, cinf, t = xs
        fp, fm, ex, fc = step_probes(cx, cy, ox, oy, probe_fn, chunk=chunk)
        fc = fc | cinf[None]
        mask = jnp.concatenate([fp, fm, ex, fc])
        (flat,) = jnp.nonzero(mask, size=per_job_cap, fill_value=3 * n + 1)
        njob = jnp.sum(mask, dtype=jnp.int32)
        recs = jnp.stack(
            [jnp.broadcast_to(t, flat.shape).astype(_U32), flat.astype(_U32)],
            axis=1,
        )
        recs = jnp.where(flat[:, None] <= 3 * n, recs, jnp.asarray(FILL))
        start = jnp.minimum(cnt, hit_cap - per_job_cap)
        buf = jax.lax.dynamic_update_slice(buf, recs, (start, 0))
        return (buf, cnt + njob), None

    buf0 = jnp.full((hit_cap, 2), jnp.asarray(FILL))
    ts = jnp.arange(t_total, dtype=_U32)
    (buf, cnt), _ = jax.lax.scan(
        job, (buf0, jnp.int32(0)), (centers_x, centers_y, centers_inf, ts)
    )
    return buf, cnt[None]


@partial(
    jax.jit,
    static_argnames=("htsz", "window", "chunk", "hit_cap", "per_job_cap"),
)
def run_epoch(
    centers_x,
    centers_y,
    centers_inf,
    ox,
    oy,
    offsets,
    disc,
    *,
    htsz: int,
    window: int,
    chunk: int = 256,
    hit_cap: int = 512,
    per_job_cap: int = 32,
):
    """Single-device epoch. Returns (records, total_hits, giant_steps) —
    giant_steps counts probed landings, matching the reference's counter
    semantics (2 per offset add + specials, 1_9_7File.pb:2371)."""
    probe_fn = make_probe(offsets, disc, htsz=htsz, window=window)
    buf, cnt = epoch_scan(
        centers_x, centers_y, centers_inf, ox, oy, probe_fn,
        chunk=chunk, hit_cap=hit_cap, per_job_cap=per_job_cap,
    )
    n = ox.shape[0]
    return buf, cnt[0], (2 * n + 1) * centers_x.shape[0]
