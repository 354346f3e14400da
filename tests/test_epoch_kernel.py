"""The Pallas-fused epoch must agree exactly with the XLA reference epoch.

Runs the kernels in interpreter mode on CPU and cross-checks hit sets,
counts, and the raw (bucket, disc, exact) key planes against the jnp path
— the same independent-paths verification idea the reference bakes into
its build (checkGiantArr / checkHT, 1_9_7File.pb:1524,3599).
"""

import numpy as np
import jax.numpy as jnp

from bsgs_tpu.models import giant, table as T
from bsgs_tpu.ops import ec, field as F, epoch_kernel as EK
from bsgs_tpu.utils import ecpy


def _setup(w=64, htsz=6, n=256, t_jobs=4, key_offset=0):
    baby = T.build_baby_table(w, htsz, window=16, tile=32)
    s = 2 * w
    s_g = ecpy.mul(s)
    ox, oy = ec.fill_multiples(s_g, s_g, n)
    # centers: Q - c*S*G walk, Q chosen so a known key may fall in range
    q = ecpy.mul(key_offset + 123457)
    step = ecpy.neg(ecpy.mul((2 * n + 1) * s))
    m0 = ecpy.sub(q, ecpy.mul(n * s))
    cx, cy, cinf = ec.fill_multiples(m0, step, t_jobs, with_inf=True)
    return baby, ox, oy, cx, cy, cinf


def test_fused_epoch_matches_reference():
    baby, ox, oy, cx, cy, cinf = _setup()
    idxs_r, cnt_r, gs_r = giant.run_epoch(
        cx, cy, cinf, ox, oy, baby.dense, htsz=baby.htsz, chunk=64,
        hit_cap=64,
    )
    ox_pl = jnp.swapaxes(ox, 0, 1)
    oy_pl = jnp.swapaxes(oy, 0, 1)
    idxs_f, cnt_f, gs_f = giant.run_epoch_fused(
        cx, cy, cinf, ox_pl, oy_pl, baby.dense, htsz=baby.htsz,
        chunk_c=2, lanes_w=128, hit_cap=64, interpret=True,
    )
    assert gs_r == gs_f
    assert int(cnt_r) == int(cnt_f)
    assert set(np.asarray(idxs_r).tolist()) == set(np.asarray(idxs_f).tolist())
    # the scan must actually find the planted key's landing somewhere
    assert int(cnt_r) > 0


def test_landing_keys_exactness():
    """Every (bucket, disc) pair from the kernel equals the direct
    recomputation from the epoch's landing X coordinates."""
    baby, ox, oy, cx, cy, cinf = _setup(t_jobs=2)
    htsz = baby.htsz
    keys = EK.epoch_landing_keys(
        jnp.swapaxes(cx, 0, 1), jnp.swapaxes(cy, 0, 1),
        jnp.swapaxes(ox, 0, 1), jnp.swapaxes(oy, 0, 1),
        htsz=htsz, chunk_c=2, lanes_w=128, interpret=True,
    )
    t_jobs, n = cx.shape[0], ox.shape[0]
    # reference landing math (row-major jnp path internals)
    cxb = cx[:, None, :]
    cyb = cy[:, None, :]
    d = F.sub_mod(ox[None], cxb).reshape(t_jobs * n, F.NLIMBS)
    exact = F.is_zero(d)
    d_safe = F._select(exact, F.broadcast_const(1, d.shape[:-1]), d)
    inv_d = ec.batch_inv(d_safe, chunk=64).reshape(t_jobs, n, F.NLIMBS)
    lam_p = F.mul_mod(F.sub_mod(oy[None], cyb), inv_d)
    xp = F.sub_mod(F.sub_mod(F.sqr_mod(lam_p), cxb), ox[None])
    lam_m = F.mul_mod(F.add_mod(oy[None], cyb), inv_d)
    xm = F.sub_mod(F.sub_mod(F.sqr_mod(lam_m), cxb), ox[None])
    hp = F.x_prefix64(xp.reshape(-1, F.NLIMBS))
    hm = F.x_prefix64(xm.reshape(-1, F.NLIMBS))
    bp, dp = T.bucket_disc(hp[0], hp[1], htsz)
    bm, dm = T.bucket_disc(hm[0], hm[1], htsz)
    np.testing.assert_array_equal(np.asarray(keys[0]), np.asarray(bp))
    np.testing.assert_array_equal(np.asarray(keys[1]), np.asarray(dp))
    np.testing.assert_array_equal(np.asarray(keys[2]), np.asarray(bm))
    np.testing.assert_array_equal(np.asarray(keys[3]), np.asarray(dm))
    np.testing.assert_array_equal(
        np.asarray(keys[4]) != 0, np.asarray(exact)
    )


def test_phased_epoch_matches_unphased():
    """phases=2 staggers the epoch's probe blocks; after decode the hit
    set must equal the unphased epoch's exactly."""
    baby, ox, oy, cx, cy, cinf = _setup(t_jobs=4)
    ox_pl = jnp.swapaxes(ox, 0, 1)
    oy_pl = jnp.swapaxes(oy, 0, 1)
    kw = dict(htsz=baby.htsz, chunk_c=2, lanes_w=128, hit_cap=64,
              interpret=True)
    i1, c1, _ = giant.run_epoch_fused(
        cx, cy, cinf, ox_pl, oy_pl, baby.dense, phases=1, **kw)
    i2, c2, _ = giant.run_epoch_fused(
        cx, cy, cinf, ox_pl, oy_pl, baby.dense, phases=2, **kw)
    assert int(c1) == int(c2) and int(c1) > 0
    t_jobs, n = cx.shape[0], ox.shape[0]
    d1 = {giant.decode_flat_phased(int(f), t_jobs, n, 1)
          for f in np.asarray(i1) if f != giant.FILL}
    d2 = {giant.decode_flat_phased(int(f), t_jobs, n, 2)
          for f in np.asarray(i2) if f != giant.FILL}
    assert d1 == d2


def test_fused_solver_end_to_end():
    """Full solve through the fused path (interpret mode) finds the key
    via cross-epoch pipelining (giant.pipelined_step; opt-in — see
    SolverConfig.cross_pipeline)."""
    from bsgs_tpu.models import solver as smod

    cfg = smod.SolverConfig(
        w=64, htsz=6, n_offsets=256, jobs_per_epoch=2,
        fused=True, chunk_c=2, lanes_w=128, table_tile=32,
        cross_pipeline=True,
    )
    s = smod.Solver(cfg)
    assert s._pipelined
    key = 99991
    pub = ecpy.mul(key)
    res = s.solve(pub, pk=key - 50000, pke=key + 50000)
    assert res.key == key


def test_pipelined_matches_unpipelined():
    """Cross-pipelined and direct fused solves must agree on the key, the
    scanned step count, and exhaustion behavior."""
    from bsgs_tpu.models import solver as smod

    kw = dict(w=64, htsz=6, n_offsets=256, jobs_per_epoch=2, fused=True,
              chunk_c=2, lanes_w=128, table_tile=32)
    s_p = smod.Solver(smod.SolverConfig(cross_pipeline=True, **kw))
    s_d = smod.Solver(smod.SolverConfig(cross_pipeline=False, **kw),
                      baby=s_p.baby)
    assert s_p._pipelined and not s_d._pipelined
    key = 99991
    pub = ecpy.mul(key)
    r_p = s_p.solve(pub, key - 50000, key + 50000)
    r_d = s_d.solve(pub, key - 50000, key + 50000)
    assert r_p.key == r_d.key == key
    # exhaustion: same total steps either way (flush drains the last epoch)
    pub2 = ecpy.mul((1 << 90) + 5)
    r_p = s_p.solve(pub2, 1 << 20, (1 << 20) + (1 << 19))
    r_d = s_d.solve(pub2, 1 << 20, (1 << 20) + (1 << 19))
    assert r_p.key is None and r_d.key is None
    assert r_p.giant_steps == r_d.giant_steps
    assert r_p.epochs == r_d.epochs


def test_pipelined_overflow_redispatch():
    """HitOverflow recovery through the cross-pipelined dispatch path."""
    from bsgs_tpu.models import solver as smod
    from test_parallel import _landing_prefix_table

    cfg = smod.SolverConfig(
        w=64, htsz=6, n_offsets=64, jobs_per_epoch=2, fused=True,
        chunk_c=1, lanes_w=64, table_tile=32, hit_cap=8,
        cross_pipeline=True,
    )
    s0 = smod.Solver(cfg)
    assert s0._pipelined
    pub = ecpy.mul(987654321)
    pk = 1000
    q0 = ecpy.sub(pub, ecpy.mul(pk))
    baby = _landing_prefix_table(s0, q0, cfg.jobs_per_epoch, cfg.htsz, 16)
    s = smod.Solver(cfg, baby=baby)
    res = s.solve(pub, pk, pk + cfg.keys_per_epoch - 1, max_epochs=1)
    assert res.key is None
    assert res.hits_checked > cfg.hit_cap
