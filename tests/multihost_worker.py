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


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from bsgs_tpu.parallel import mesh as pmesh, striped
    from bsgs_tpu.models import solver as smod
    from bsgs_tpu.utils import ecpy

    pmesh.init_distributed(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    # FUSED config (round-4 item 7): the shard_map Pallas epoch body
    # (interpret mode on CPU) must cross process boundaries, phases and
    # all — not fall back to the row-major XLA body.
    cfg = smod.SolverConfig(
        w=64, htsz=6, n_offsets=128, jobs_per_epoch=2, fused=True,
        chunk_c=1, lanes_w=128, hit_cap=128, table_tile=32, pipeline=2,
    )
    s = smod.Solver(cfg)
    ms = striped.MeshSolver(s, pmesh.make_mesh())
    assert ms.n_chips == 4 * nproc
    assert ms.fused and ms._phases == 2, (ms.fused, ms._phases)

    pk = 1 << 21
    k = pk + 50_000
    res = ms.solve(ecpy.mul(k), pk, pk + (1 << 18))
    assert res.key == k, res
    print(f"proc {pid}: found {res.key:#x} in {res.epochs} super-epochs")


if __name__ == "__main__":
    main()
