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
    them out)."""
    mesh = pmesh.make_mesh(8)
    table = base_solver.baby
    spec = st.shard_table(table, 8)
    # capacity slack tiny -> everything overflows except the first slot
    probe = st.make_alltoall_probe(spec, slack=0.0)
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    ks = [int(x) for x in np.random.default_rng(3).integers(
        1 << 50, 1 << 60, size=2048)]  # none in the table
    xs = [ecpy.mul(k)[0] for k in ks]
    xl = jnp.asarray(F.to_limbs_batch(xs))
    hi, lo = F.x_prefix64(xl)
    f = jax.jit(shard_map(
        probe, mesh=mesh,
        in_specs=(P("chips"), P("chips"), P("chips")),
        out_specs=P("chips"),
        check_vma=False,
    ))
    got = np.asarray(f(hi, lo, jnp.asarray(spec.dense)))
    # slack=0 still routes cap=128 per destination; with 256 probes/chip
    # over 8 owners nothing should overflow -- but if any did, they must
    # read True. Either way no probe may be silently false-negative:
    exact = np.asarray(tbl.probe_x(xl, table))
    assert (got | ~exact).all() or (got >= exact).all()


def test_mesh_solve_alltoall(base_solver):
    mesh = pmesh.make_mesh(8)
    ms = striped.MeshSolver(base_solver, mesh, shard_baby_table=True,
                            probe_routing="all_to_all")
    pk = 1 << 21
    k = pk + 250_001
    res = ms.solve(ecpy.mul(k), pk, pk + (1 << 18))
    assert res.key == k
