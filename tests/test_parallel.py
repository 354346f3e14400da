"""Multi-chip tests on the 8-device CPU mesh: range striping, sharded-table
probe routing, and mode equivalence (SURVEY.md §4 strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsgs_tpu.models import solver as smod, table as tbl
from bsgs_tpu.parallel import mesh as pmesh, sharded_table as st, striped
from bsgs_tpu.ops import field as F
from bsgs_tpu.utils import ecpy


@pytest.fixture(scope="module")
def base_solver():
    cfg = smod.SolverConfig(
        w=256, htsz=6, n_offsets=8, jobs_per_epoch=2, window=16, chunk=16,
        hit_cap=128, table_tile=64,
    )
    return smod.Solver(cfg)


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


def test_shard_table_roundtrip():
    table = tbl.build_baby_table(256, 6, window=16, tile=64)
    spec = st.shard_table(table, 4)
    # every entry present exactly once across shards
    assert int(spec.shard_entries.sum()) == 256
    assert int((spec.dense != tbl.DENSE_FILL).sum()) == 256


def test_sharded_probe_matches_replicated(base_solver):
    mesh = pmesh.make_mesh(8)
    table = base_solver.baby
    # probes: members and non-members
    ks = list(range(1, 129)) + [int(x) for x in
                                np.random.default_rng(7).integers(
                                    300, 1 << 48, size=128)]
    xs = [ecpy.mul(k)[0] for k in ks]
    xl = jnp.asarray(F.to_limbs_batch(xs))
    expect = np.asarray(tbl.probe_x(xl, table))

    spec = st.shard_table(table, 8)
    probe_sh = st.make_sharded_probe(spec)
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    hi, lo = F.x_prefix64(xl)

    def body(hi, lo, dense):
        return probe_sh(hi, lo, dense)

    f = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P("chips"), P("chips"), P("chips")),
        out_specs=P("chips"),
        check_vma=False,
    ))
    got = np.asarray(f(hi, lo, jnp.asarray(spec.dense)))
    np.testing.assert_array_equal(got, expect)


def test_mesh_solve_replicated(base_solver):
    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(base_solver, mesh)
    pk = 1 << 21
    k = pk + 100_000
    res = ms.solve(ecpy.mul(k), pk, pk + (1 << 18))
    assert res.key == k


def test_mesh_solve_sharded_table(base_solver):
    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(base_solver, mesh, shard_baby_table=True)
    pk = 1 << 21
    k = pk + 250_001
    res = ms.solve(ecpy.mul(k), pk, pk + (1 << 18))
    assert res.key == k


def test_mesh_exhausts(base_solver):
    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(base_solver, mesh)
    pk = 1 << 21
    pub = ecpy.mul(pk + (1 << 30))
    res = ms.solve(pub, pk, pk + (1 << 16))
    assert res.key is None


def test_mesh_checkpoint_resume(base_solver, tmp_path):
    """Kill a mesh solve mid-range, resume from the checkpoint, find the
    planted key (round-3 item: reference min-counter semantics,
    1_9_7File.pb:3897-3931, on the mesh path)."""
    from bsgs_tpu.utils import checkpoint as ckpt

    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(base_solver, mesh)
    pk = 1 << 21
    span = ms.cfg.jobs_span * ms._jobs_per_super * ms.cfg.stride
    k = pk + 3 * span + 123  # planted in the 4th super-epoch
    pub = ecpy.mul(k)

    path = str(tmp_path / "currentwork.json")
    writer = ckpt.CheckpointWriter(path, "fp", interval_s=0.0)

    def on_epoch(e, steps):
        writer.maybe_write(0, "pub", e + 1, steps)

    # simulate a crash: scan only 2 super-epochs, checkpointing each
    res = ms.solve(pub, pk, pk + 8 * span, max_epochs=2, on_epoch=on_epoch)
    assert res.key is None
    ck = ckpt.Checkpoint.load(path, "fp")
    assert ck.next_epoch >= 1

    res = ms.solve(pub, pk, pk + 8 * span, start_epoch=ck.next_epoch)
    assert res.key == k


def test_alltoall_probe_matches_replicated(base_solver):
    """all_to_all routing answers identically to the local probe (round-3
    item: O(m) per-chip traffic vs the all_gather route's O(n*m))."""
    mesh = pmesh.make_mesh(8)
    table = base_solver.baby
    ks = list(range(1, 129)) + [int(x) for x in
                                np.random.default_rng(11).integers(
                                    300, 1 << 48, size=128)]
    xs = [ecpy.mul(k)[0] for k in ks]
    xl = jnp.asarray(F.to_limbs_batch(xs))
    expect = np.asarray(tbl.probe_x(xl, table))

    spec = st.shard_table(table, 8)
    probe_a2a = st.make_alltoall_probe(spec)
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    hi, lo = F.x_prefix64(xl)
    f = jax.jit(shard_map(
        probe_a2a, mesh=mesh,
        in_specs=(P("chips"), P("chips"), P("chips")),
        out_specs=P("chips"),
        check_vma=False,
    ))
    got = np.asarray(f(hi, lo, jnp.asarray(spec.dense)))
    np.testing.assert_array_equal(got, expect)


def test_alltoall_overflow_conservative(base_solver):
    """Probes that exceed the routing capacity are marked FOUND, never
    silently dropped (correctness is preserved; the host checker weeds
    them out). All probes are aimed at ONE shard's bucket range so each
    chip's 256-probe stream overflows its cap=128 destination slots:
    exactly the first cap (in sorted order) are answered exactly (False —
    they are non-members) and the remaining m - cap are forced True."""
    mesh = pmesh.make_mesh(8)
    table = base_solver.baby
    spec = st.shard_table(table, 8)
    probe = st.make_alltoall_probe(spec, slack=0.0)  # cap floors at 128
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(3)
    htsz, bps = spec.htsz, spec.buckets_per_shard
    # 64-bit prefixes whose bucket (top htsz bits) lies in shard 0's range
    pre = (
        rng.integers(0, bps, size=2048).astype(np.uint64) << np.uint64(64 - htsz)
    ) | rng.integers(1, 1 << 50, size=2048).astype(np.uint64)
    hi = jnp.asarray((pre >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray(pre.astype(np.uint32))
    f = jax.jit(shard_map(
        probe, mesh=mesh,
        in_specs=(P("chips"), P("chips"), P("chips")),
        out_specs=P("chips"),
        check_vma=False,
    ))
    got = np.asarray(f(hi, lo, jnp.asarray(spec.dense)))
    per_chip = got.reshape(8, 256).sum(axis=1)
    # per chip: 256 probes -> one destination with cap 128 -> 128 routed
    # (all miss: random discs) + 128 overflowed (forced found)
    np.testing.assert_array_equal(per_chip, np.full(8, 128))


def test_streamed_table_shard_composition():
    """--shard-table must compose with the streamed big-w builder: its
    offsets come from device counts (no host CSR), and the sharded probe
    must answer exactly like a direct probe of the same table (round-3
    review item 6)."""
    st_tab = tbl.build_baby_table_streamed(256, 6, window=16, tile=32,
                                           chunk=64)
    spec = st.shard_table(st_tab, 8)
    assert int(spec.shard_entries.sum()) == 256
    mesh = pmesh.make_mesh(8)
    ks = list(range(1, 129)) + [int(x) for x in
                                np.random.default_rng(5).integers(
                                    300, 1 << 48, size=128)]
    xl = jnp.asarray(F.to_limbs_batch([ecpy.mul(k)[0] for k in ks]))
    expect = np.asarray(tbl.probe_x(xl, st_tab))
    hi, lo = F.x_prefix64(xl)
    probe = st.make_alltoall_probe(spec)
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    f = jax.jit(shard_map(
        probe, mesh=mesh,
        in_specs=(P("chips"), P("chips"), P("chips")),
        out_specs=P("chips"),
        check_vma=False,
    ))
    got = np.asarray(f(hi, lo, jnp.asarray(spec.dense)))
    np.testing.assert_array_equal(got, expect)


# ---------------------------------------------------------------------------
# Fused (Pallas) mesh path: the shard_map body must run the same epoch
# kernels as the single-chip hot path (round-3 review item 1).


@pytest.fixture(scope="module")
def fused_base_solver():
    cfg = smod.SolverConfig(
        w=64, htsz=6, n_offsets=256, jobs_per_epoch=2, fused=True,
        chunk_c=2, lanes_w=128, table_tile=32, hit_cap=128,
    )
    return smod.Solver(cfg)


def test_mesh_fused_solve_replicated(fused_base_solver):
    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(fused_base_solver, mesh)
    assert ms.fused, "mesh path must adopt the base solver's fused mode"
    # the phase stagger must carry to the mesh epoch (round-4 item 4:
    # forfeiting it cost the measured 6% DMA/EC overlap per chip)
    assert ms._phases == 2
    key = 99991
    res = ms.solve(ecpy.mul(key), key - 50000, key + 50000)
    assert res.key == key


def test_mesh_fused_sharded_alltoall(fused_base_solver):
    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(fused_base_solver, mesh, shard_baby_table=True,
                            probe_routing="all_to_all")
    assert ms.fused
    key = 99991
    res = ms.solve(ecpy.mul(key), key - 50000, key + 50000)
    assert res.key == key


def test_mesh_fused_matches_xla_mesh_epoch(fused_base_solver):
    """One super-epoch through the fused mesh body and the row-major XLA
    mesh body must produce identical hit sets (independent-paths check,
    SURVEY.md §4). The fused body's hit layout is phase-major now, so
    indices are DECODED (each with its own phase count) before compare."""
    import dataclasses

    from bsgs_tpu.models import giant

    mesh = pmesh.make_mesh(8)
    ms_f = striped.MeshSolver(fused_base_solver, mesh)
    cfg_x = dataclasses.replace(fused_base_solver.cfg, fused=False)
    base_x = smod.Solver(cfg_x, baby=fused_base_solver.baby)
    ms_x = striped.MeshSolver(base_x, mesh)
    assert ms_f.fused and not ms_x.fused
    assert ms_f._phases == 2 and ms_x._phases == 1
    q0 = ecpy.mul(99991 - 70000)
    _, _, buf_f, cnt_f, _ = ms_f._dispatch(q0, 0)
    _, _, buf_x, cnt_x, _ = ms_x._dispatch(q0, 0)
    np.testing.assert_array_equal(
        np.asarray(cnt_f)[:8], np.asarray(cnt_x)[:8]
    )
    bf = np.asarray(buf_f).reshape(-1, ms_f.cfg.hit_cap)[:8]
    bx = np.asarray(buf_x).reshape(-1, ms_x.cfg.hit_cap)[:8]
    cfg = ms_f.cfg
    for chip in range(8):
        dec_f = {
            giant.decode_flat_phased(
                int(v), cfg.jobs_per_epoch, cfg.n_offsets, ms_f._phases
            )
            for v in bf[chip] if v != giant.FILL
        }
        dec_x = {
            giant.decode_flat(int(v), cfg.jobs_per_epoch, cfg.n_offsets)
            for v in bx[chip] if v != giant.FILL
        }
        assert dec_f == dec_x


# ---------------------------------------------------------------------------
# HitOverflow re-dispatch (round-3 review item 5b): epochs with more hits
# than the buffer capacity must transparently re-run with a larger cap.


def _landing_prefix_table(solver, q0, n_jobs, htsz, window):
    """Host-compute every ± landing X prefix of the first (super)epoch and
    pack them into a table: every device probe then hits, flooding the
    hit buffer."""
    cfg = solver.cfg
    cx, cy, cinf = solver.epoch_centers(q0, 0, n_jobs)
    mx = F.from_limbs_batch(np.asarray(cx))
    my = F.from_limbs_batch(np.asarray(cy))
    s_g = ecpy.mul(cfg.stride)
    pres = set()
    for t in range(n_jobs):
        if bool(np.asarray(cinf)[t]):
            continue
        m_pt = (int(mx[t]), int(my[t]))
        for j in range(1, cfg.n_offsets + 1):
            o_pt = ecpy.mul(j, s_g)
            for pt in (ecpy.add(m_pt, o_pt), ecpy.sub(m_pt, o_pt)):
                if pt is not None:
                    pres.add(pt[0] & ((1 << 64) - 1))
    return tbl.pack_table(
        np.array(sorted(pres), dtype=np.uint64), htsz, window
    )


def test_solver_hit_overflow_redispatch():
    cfg = smod.SolverConfig(
        w=64, htsz=6, n_offsets=8, jobs_per_epoch=2, window=16, chunk=8,
        hit_cap=4, table_tile=32,
    )
    s0 = smod.Solver(cfg)
    pub = ecpy.mul(987654321)
    pk = 1000
    q0 = ecpy.sub(pub, ecpy.mul(pk))
    baby = _landing_prefix_table(s0, q0, cfg.jobs_per_epoch, cfg.htsz, 16)
    s = smod.Solver(cfg, baby=baby)
    res = s.solve(pub, pk, pk + cfg.keys_per_epoch - 1, max_epochs=1)
    assert res.key is None  # no real key: every hit verified and rejected
    assert res.hits_checked > cfg.hit_cap  # the overflow epoch was re-run


def test_mesh_hit_overflow_redispatch():
    cfg = smod.SolverConfig(
        w=64, htsz=6, n_offsets=8, jobs_per_epoch=2, window=16, chunk=8,
        hit_cap=4, table_tile=32,
    )
    s0 = smod.Solver(cfg)
    mesh = pmesh.make_mesh(8)
    ms0 = striped.MeshSolver(s0, mesh)
    pub = ecpy.mul(987654321)
    pk = 1000
    q0 = ecpy.sub(pub, ecpy.mul(pk))
    baby = _landing_prefix_table(
        ms0, q0, ms0._jobs_per_super, cfg.htsz, 16
    )
    s = smod.Solver(cfg, baby=baby)
    ms = striped.MeshSolver(s, mesh)
    res = ms.solve(pub, pk, pk + ms._jobs_per_super * cfg.jobs_span
                   * cfg.stride - 1, max_epochs=1)
    assert res.key is None
    assert res.hits_checked > 8 * cfg.hit_cap


def test_sharded_streamed_build_matches_host():
    """build_baby_table_streamed_sharded scatters each chunk into
    per-device bucket-range slices; the assembled global dense must hold
    exactly the host build's entries per row (order within a row may
    differ — chunk order vs disc order)."""
    mesh = pmesh.make_mesh(8)
    sh = tbl.build_baby_table_streamed_sharded(256, 6, mesh, window=16,
                                               tile=32, chunk=64)
    assert sh.n_table_shards == 8
    host = tbl.build_baby_table(256, 6, window=16, tile=64)
    ds, dh = np.asarray(sh.dense), np.asarray(host.dense)
    for r in range(64):
        assert (sorted(ds[r][ds[r] != tbl.DENSE_FILL].tolist())
                == sorted(dh[r][dh[r] != tbl.DENSE_FILL].tolist())), r
    np.testing.assert_array_equal(sh.offsets, host.offsets)


def test_mesh_solve_sharded_streamed_build():
    """--shard-table end-to-end on a table BUILT sharded over the mesh
    (the beyond-single-chip-HBM path; round-4 ADVICE: the escape hatch
    must be reachable)."""
    mesh = pmesh.make_mesh(8)
    cfg = smod.SolverConfig(
        w=256, htsz=6, n_offsets=8, jobs_per_epoch=2, window=16, chunk=16,
        hit_cap=128, table_tile=64,
    )
    baby = smod.build_table(cfg, mesh=mesh)
    assert baby.n_table_shards == 8
    s = smod.Solver(cfg, baby=baby)
    ms = striped.MeshSolver(s, mesh, shard_baby_table=True)
    assert ms._spec.n_shards == 8
    pk = 1 << 21
    k = pk + 250_001
    res = ms.solve(ecpy.mul(k), pk, pk + (1 << 18))
    assert res.key == k


def test_presharded_mesh_size_mismatch():
    mesh = pmesh.make_mesh(8)
    cfg = smod.SolverConfig(
        w=256, htsz=6, n_offsets=8, jobs_per_epoch=2, window=16, chunk=16,
        hit_cap=128, table_tile=64,
    )
    baby = smod.build_table(cfg, mesh=mesh)
    s = smod.Solver(cfg, baby=baby)
    with pytest.raises(ValueError, match="sharded over"):
        striped.MeshSolver(s, pmesh.make_mesh(4), shard_baby_table=True)


def test_check_table_fits():
    """The HBM guard derives from device memory and accounts for table
    sharding (round-4 ADVICE items: hardcoded 13 GiB; unreachable
    --shard-table hatch)."""
    smod.check_table_fits(10 << 30, mem_bytes=16 << 30)
    with pytest.raises(ValueError, match="shard-table"):
        smod.check_table_fits(14 << 30, mem_bytes=16 << 30)
    # sharded over 4 chips the same table fits per chip
    smod.check_table_fits(40 << 30, mem_bytes=16 << 30, n_shards=4)
    with pytest.raises(ValueError, match="more chips"):
        smod.check_table_fits(120 << 30, mem_bytes=16 << 30, n_shards=4)
    # bigger-HBM chips take bigger single-chip tables
    smod.check_table_fits(20 << 30, mem_bytes=32 << 30)


def test_mesh_solve_alltoall(base_solver):
    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(base_solver, mesh, shard_baby_table=True,
                            probe_routing="all_to_all")
    pk = 1 << 21
    k = pk + 250_001
    res = ms.solve(ecpy.mul(k), pk, pk + (1 << 18))
    assert res.key == k
