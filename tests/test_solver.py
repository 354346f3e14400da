"""End-to-end solver tests (BASELINE.json config 1 scaled down for CI):
known keys planted across a range, including every hit-code path."""

import numpy as np
import pytest

from bsgs_tpu.models import checker, solver
from bsgs_tpu.utils import ecpy


def make_solver(w=256, htsz=6, n_offsets=8, jobs_per_epoch=4):
    cfg = solver.SolverConfig(
        w=w, htsz=htsz, n_offsets=n_offsets,
        jobs_per_epoch=jobs_per_epoch, window=16, chunk=16,
        table_tile=64,
    )
    return solver.Solver(cfg)


SOLVER = None


def get_solver():
    global SOLVER
    if SOLVER is None:
        SOLVER = make_solver()
    return SOLVER


def solve_one(s, k, pk, pke):
    pub = ecpy.mul(k)
    res = s.solve(pub, pk, pke)
    assert res.key == k, f"expected {k}, got {res.key}"
    return res


def test_offset_spot_verify_catches_corruption():
    """The runtime giant-buffer spot check (reference checkGiantArr,
    1_9_7File.pb:1524-1560) must reject a tampered offset row."""
    import jax.numpy as jnp

    cfg = solver.SolverConfig(w=64, htsz=6, n_offsets=8, jobs_per_epoch=2,
                              window=16, chunk=8, table_tile=32)
    s = solver.Solver(cfg)
    s.ox = jnp.asarray(np.asarray(s.ox)).at[:, 0].set(12345)
    with pytest.raises(ValueError, match="corrupt"):
        s._verify_offsets(checks=16)


def test_solve_midrange():
    s = get_solver()
    pk, pke = 1 << 20, (1 << 20) + (1 << 16)
    solve_one(s, pk + 37777, pk, pke)


def test_solve_range_edges():
    s = get_solver()
    pk, pke = 5_000_000, 5_000_000 + (1 << 15)
    solve_one(s, pk, pk, pke)          # k == pk (shortcut path)
    solve_one(s, pk + 1, pk, pke)      # first real key
    solve_one(s, pke, pk, pke)         # last key


def test_solve_exact_giant_landing():
    # k0 an exact multiple of the stride S = 2w -> device code-4 path
    s = get_solver()
    S = s.cfg.stride
    pk = 999_999
    k = pk + 7 * S
    solve_one(s, k, pk, pk + (1 << 14))


def test_solve_center_landing():
    # k0 exactly at a job center -> infinity center, forced code-5 hit
    s = get_solver()
    cfg = s.cfg
    c0 = cfg.n_offsets * cfg.stride  # first job center giant offset * S
    pk = 123_456
    solve_one(s, pk + c0, pk, pk + (1 << 14))
    # and a center of a later job
    c3 = (3 * cfg.jobs_span + cfg.n_offsets) * cfg.stride
    solve_one(s, pk + c3, pk, pk + 4 * cfg.jobs_span * cfg.stride)


def test_solve_both_branches():
    # keys on both sides of a center exercise +/- branch decoding
    s = get_solver()
    cfg = s.cfg
    pk = 777_777
    center0 = cfg.n_offsets * cfg.stride
    solve_one(s, pk + center0 - 3 * cfg.stride - 5, pk, pk + (1 << 14))
    solve_one(s, pk + center0 + 3 * cfg.stride + 5, pk, pk + (1 << 14))


def test_solve_minus_r_candidate():
    # k0 = m*S - r (the mirrored candidate form the checker must try)
    s = get_solver()
    pk = 31_337
    k = pk + 5 * s.cfg.stride - 13
    solve_one(s, k, pk, pk + (1 << 14))


def test_exhausted_range():
    s = get_solver()
    pk = 1 << 22
    pub = ecpy.mul(pk + (1 << 18))  # key far outside the searched range
    res = s.solve(pub, pk, pk + (1 << 13))
    assert res.key is None
    assert res.giant_steps > 0


def test_epoch_striping_covers_range():
    # epoch_stride/offset partition: both workers together find the key,
    # and the worker owning the key's epoch finds it alone.
    s = get_solver()
    pk = 2_000_000
    pke = pk + (1 << 15)
    k = pk + 29_000
    pub = ecpy.mul(k)
    results = [
        s.solve(pub, pk, pke, epoch_stride=2, epoch_offset=i) for i in (0, 1)
    ]
    found = [r.key for r in results if r.key is not None]
    assert found == [k]


def test_drain_batches_rescan_lookups():
    """A drain with several simultaneous hits on a rescan-mode table must
    resolve ALL position lookups in ONE generation pass (round-4 item 5:
    at w=2^30 each pass costs ~30 s, so per-hit passes would multiply).
    Three false-positive probe hits are planted in the dense matrix next
    to one real key; the counted lookup batch must run exactly once."""
    from bsgs_tpu.models import table as tbl

    cfg = solver.SolverConfig(
        w=256, htsz=6, n_offsets=8, jobs_per_epoch=4, window=16,
        chunk=16, table_tile=64, positions="rescan",
    )
    baby = tbl.build_baby_table_streamed(
        256, 6, window=16, tile=32, chunk=64, positions="rescan"
    )
    assert baby.lookup_fn is not None
    s = solver.Solver(cfg, baby=baby)
    pk = 1 << 20
    k = pk + 30_000  # inside epoch 0
    pub = ecpy.mul(k)
    q0 = ecpy.sub(pub, ecpy.mul(pk))

    # plant false-positive probe entries for three epoch-0 landings: the
    # probes hit, the rescan lookup finds no matching baby index, the
    # checker rejects — but all three lookups must share one pass
    dense = np.asarray(baby.dense).copy()
    mask64 = (1 << 64) - 1
    for m in (5, 23, 40):
        landing = ecpy.sub(q0, ecpy.mul(m * cfg.stride))
        pre = landing[0] & mask64
        bucket = pre >> (64 - cfg.htsz)
        disc = (pre >> (32 - cfg.htsz)) & 0xFFFFFFFF
        row = dense[bucket]
        free = np.where(row == tbl.DENSE_FILL)[0]
        assert free.size, "no free slot to plant a false positive"
        dense[bucket, free[0]] = np.uint32(disc)
    import jax.numpy as jnp

    baby.dense = jnp.asarray(dense)

    calls = {"batch": 0, "single": 0}
    orig = baby.lookup_fn

    def counting(pre):
        calls["single"] += 1
        return orig(pre)

    def counting_batch(pres):
        calls["batch"] += 1
        return orig.batch(pres)

    counting.batch = counting_batch
    baby.lookup_fn = counting

    res = s.solve(pub, pk, pk + cfg.keys_per_epoch - 1, max_epochs=1)
    assert res.key == k
    assert res.hits_checked >= 4  # 3 planted false positives + the key
    assert calls["batch"] == 1, "drain must batch lookups into one pass"
    assert calls["single"] == 0


def _plant_fp(baby, cfg, q0, m):
    """Insert a false-positive probe entry for giant index m's landing."""
    import jax.numpy as jnp
    from bsgs_tpu.models import table as tbl

    dense = np.asarray(baby.dense).copy()
    landing = ecpy.sub(q0, ecpy.mul(m * cfg.stride))
    pre = landing[0] & ((1 << 64) - 1)
    bucket = pre >> (64 - cfg.htsz)
    disc = (pre >> (32 - cfg.htsz)) & 0xFFFFFFFF
    free = np.where(dense[bucket] == tbl.DENSE_FILL)[0]
    dense[bucket, free[0]] = np.uint32(disc)
    baby.dense = jnp.asarray(dense)


def test_deferred_verification_pools_epochs():
    """On rescan tables, hits from SEVERAL epochs pool into ONE
    verification pass (PROFILE_r05 §6: per-drain verification at big w
    pays a ~w/43.6M-second regeneration per false positive — measured
    50x throughput collapse), and checkpoint callbacks trail
    verification so resume never skips an unverified epoch."""
    from bsgs_tpu.models import table as tbl

    cfg = solver.SolverConfig(
        w=256, htsz=6, n_offsets=8, jobs_per_epoch=2, window=16,
        chunk=16, table_tile=64, positions="rescan",
    )
    baby = tbl.build_baby_table_streamed(
        256, 6, window=16, tile=32, chunk=64, positions="rescan"
    )
    s = solver.Solver(cfg, baby=baby)
    pk = 1 << 21
    k = pk + 3 * cfg.keys_per_epoch + 1000  # real key in epoch 3
    pub = ecpy.mul(k)
    q0 = ecpy.sub(pub, ecpy.mul(pk))
    _plant_fp(baby, cfg, q0, 5)   # epoch 0 false positive
    _plant_fp(baby, cfg, q0, 70)  # epoch 2 false positive

    calls = {"batch": 0}
    orig = baby.lookup_fn

    def counting(pre):
        return orig(pre)

    def counting_batch(pres):
        calls["batch"] += 1
        return orig.batch(pres)

    counting.batch = counting_batch
    baby.lookup_fn = counting

    fired = []
    res = s.solve(pub, pk, pk + 4 * cfg.keys_per_epoch - 1,
                  on_epoch=lambda e, st: fired.append(e))
    assert res.key == k
    assert res.hits_checked >= 3  # 2 planted fps + the real key
    assert calls["batch"] == 1, "all epochs' hits must share one pass"
    # checkpoint callbacks trail verification: none may fire while hits
    # are pending, and the key returned before any could fire
    assert fired == []

    # defer=0 keeps the immediate-verification semantics
    import dataclasses

    cfg0 = dataclasses.replace(cfg, verify_defer_epochs=0)
    s0 = solver.Solver(cfg0, baby=baby)
    calls["batch"] = 0
    fired0 = []
    res0 = s0.solve(pub, pk, pk + 4 * cfg.keys_per_epoch - 1,
                    on_epoch=lambda e, st: fired0.append(e))
    assert res0.key == k
    assert calls["batch"] >= 2  # per-drain verification
    assert fired0 == [0, 1, 2]  # epochs before the key's fired in order


def test_random_keys(rng):
    s = get_solver()
    pk = 10_000_000
    pke = pk + (1 << 16)
    for _ in range(3):
        k = pk + int(rng.integers(0, pke - pk + 1))
        solve_one(s, k, pk, pke)
