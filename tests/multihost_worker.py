"""Worker process for the 2-process multi-host mesh test.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>

Each process exposes 4 virtual CPU devices; jax.distributed joins them
into one 8-device global mesh and a MeshSolver solve must find a planted
key exactly as on the single-process mesh (BASELINE.json config 5's
multi-host axis, scaled down to CPU).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: without it each process compiles the fused
# shard_map epoch independently, and >30 s of compile skew makes the
# OTHER process's Gloo context init time out (GetKeyValue DEADLINE_
# EXCEEDED) — the source of this test's flakiness under load.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
from bsgs_tpu.utils import compile_cache

compile_cache.enable()


def main():
    import time as _t
    _t0 = _t.time()

    def _log(msg):
        print(f"[t+{_t.time()-_t0:6.1f}s] {msg}", flush=True)

    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    _log("start")
    from bsgs_tpu.parallel import mesh as pmesh, striped
    from bsgs_tpu.models import solver as smod
    from bsgs_tpu.utils import ecpy

    _log("imports done")
    pmesh.init_distributed(coord, nproc, pid)
    _log("distributed initialized")
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    # Establish the 8-device Gloo clique NOW, while both processes are
    # within milliseconds of each other: the clique handshake has a
    # hardcoded 30 s timeout, and the fused epoch's first all_gather
    # otherwise sits behind per-process COMPILE skew of the big shard_map
    # program (measured: one process executes ~30+ s before the other
    # finishes compiling -> "Gloo context initialization failed:
    # GetKeyValue timed out"). A tiny all_gather over the SAME mesh axis
    # compiles in ~1 s on both sides and creates the exact context the
    # epoch reuses.
    import numpy as _np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as _P

    try:
        from jax import shard_map as _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map as _shard_map

    mesh = pmesh.make_mesh()
    tiny = jax.jit(_shard_map(
        lambda x: jax.lax.all_gather(x, pmesh.CHIPS_AXIS),
        mesh=mesh, in_specs=_P(pmesh.CHIPS_AXIS), out_specs=_P(),
        check_vma=False,
    ))
    _np.asarray(tiny(jnp.arange(float(mesh.devices.size))))
    _log("gloo clique established")

    # FUSED config (round-4 item 7): the shard_map Pallas epoch body
    # (interpret mode on CPU) must cross process boundaries, phases and
    # all — not fall back to the row-major XLA body.
    cfg = smod.SolverConfig(
        w=64, htsz=6, n_offsets=128, jobs_per_epoch=2, fused=True,
        chunk_c=1, lanes_w=128, hit_cap=128, table_tile=32, pipeline=2,
    )
    _log("building solver")
    s = smod.Solver(cfg)
    _log("solver built")
    ms = striped.MeshSolver(s, mesh)
    assert ms.n_chips == 4 * nproc
    assert ms.fused and ms._phases == 2, (ms.fused, ms._phases)

    pk = 1 << 21
    k = pk + 50_000
    _log("solving")
    res = ms.solve(ecpy.mul(k), pk, pk + (1 << 18))
    _log("solved")
    assert res.key == k, res
    print(f"proc {pid}: found {res.key:#x} in {res.epochs} super-epochs")
    # explicit sync before exit: the coordination service's shutdown
    # barrier times out if one process tears down long before the other
    # (per-process compile/GC skew made this flaky under machine load)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("exit")


if __name__ == "__main__":
    main()
