"""Multi-chip range-striped solving via shard_map.

Replaces the reference's per-GPU worker threads + mutex job counter
(GetJob, 1_9_7File.pb:2077-2092) with deterministic partitioning: a global
epoch of n_chips * T jobs is laid out as a sharded centers array, each chip
scans its own T jobs, and the fixed-capacity hit buffers come back stacked.
Works with a replicated baby table (reference parity) or a bucket-sharded
one (new capability; see sharded_table.py).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models import checker, giant, solver as ssolver
from ..utils import ecpy
from ..ops import ec
from .mesh import CHIPS_AXIS
from . import sharded_table as st


def _epoch_fn_replicated(mesh: Mesh, *, chunk, hit_cap, htsz):
    def body(cx, cy, cinf, ox, oy, dense):
        probe_fn = giant.make_probe(dense, htsz=htsz)
        return giant.epoch_probes(
            cx, cy, cinf, ox, oy, probe_fn, chunk=chunk, hit_cap=hit_cap,
        )

    c = P(CHIPS_AXIS)
    r = P()
    return jax.jit(
        _shard_map(
            body, mesh=mesh,
            in_specs=(c, c, c, r, r, r),
            out_specs=(c, c),
            check_vma=False,
        )
    )


def _epoch_fn_sharded_table(mesh: Mesh, spec: st.ShardedTableSpec, *,
                            chunk, hit_cap):
    probe_sharded = st.make_sharded_probe(spec)

    def body(cx, cy, cinf, ox, oy, dense_sh):
        probe_fn = lambda hi, lo: probe_sharded(hi, lo, dense_sh)
        return giant.epoch_probes(
            cx, cy, cinf, ox, oy, probe_fn, chunk=chunk, hit_cap=hit_cap,
        )

    c = P(CHIPS_AXIS)
    r = P()
    return jax.jit(
        _shard_map(
            body, mesh=mesh,
            in_specs=(c, c, c, r, r, c),
            out_specs=(c, c),
            check_vma=False,
        )
    )


@dataclasses.dataclass
class MeshSolver:
    """Drives a models.solver.Solver over a device mesh.

    shard_baby_table=True splits the CSR table by bucket range across chips
    (each holds 1/n of the entries) with collective probe routing.
    """

    base: ssolver.Solver
    mesh: Mesh
    shard_baby_table: bool = False

    def __post_init__(self):
        cfg = self.base.cfg
        self.n_chips = self.mesh.devices.size
        kw = dict(chunk=cfg.chunk, hit_cap=cfg.hit_cap)
        if self.shard_baby_table:
            spec = st.shard_table(self.base.baby, self.n_chips)
            self._spec = spec
            sh = NamedSharding(self.mesh, P(CHIPS_AXIS))
            self._dense_sh = jax.device_put(spec.dense, sh)
            self._epoch = _epoch_fn_sharded_table(self.mesh, spec, **kw)
        else:
            self._epoch = _epoch_fn_replicated(self.mesh, htsz=cfg.htsz, **kw)

    def _run_epoch(self, q0, first_job: int):
        cfg = self.base.cfg
        t_local = cfg.jobs_per_epoch
        t_global = t_local * self.n_chips
        cx, cy, cinf = self.base.epoch_centers(q0, first_job, t_global)
        sh = NamedSharding(self.mesh, P(CHIPS_AXIS))
        cx, cy, cinf = (jax.device_put(a, sh) for a in (cx, cy, cinf))
        if self.shard_baby_table:
            buf, cnt = self._epoch(
                cx, cy, cinf, self.base.ox, self.base.oy, self._dense_sh,
            )
        else:
            buf, cnt = self._epoch(
                cx, cy, cinf, self.base.ox, self.base.oy,
                self.base.baby.dense,
            )
        return np.asarray(buf), np.asarray(cnt)

    def solve(self, pub, pk: int, pke: int,
              max_epochs: Optional[int] = None) -> ssolver.SolveResult:
        cfg = self.base.cfg
        if ecpy.mul(pk) == pub:
            return ssolver.SolveResult(pk, 0, 0.0, 0, 0)
        q0 = ecpy.sub(pub, ecpy.mul(pk))
        r = pke - pk
        m_max = r // cfg.stride + 1
        total_jobs = (m_max + cfg.jobs_span) // cfg.jobs_span + 1
        jobs_per_super = cfg.jobs_per_epoch * self.n_chips
        total_super = -(-total_jobs // jobs_per_super)

        steps = 0
        hits_checked = 0
        t0 = time.time()
        for e in range(total_super):
            if max_epochs is not None and e >= max_epochs:
                break
            first_job = e * jobs_per_super
            buf, cnt = self._run_epoch(q0, first_job)
            n = cfg.n_offsets
            steps += (2 * n + 1) * jobs_per_super
            buf = buf.reshape(self.n_chips, cfg.hit_cap)
            for chip in range(self.n_chips):
                c = int(cnt[chip])
                if c == 0:
                    continue
                if c > cfg.hit_cap:
                    raise RuntimeError("hit buffer overflow")
                ctx = checker.HitContext(
                    q=pub, pk=pk, s=cfg.stride, n=n,
                    job_base=first_job + chip * cfg.jobs_per_epoch,
                )
                recs = buf[chip]
                recs = recs[recs != giant.FILL]
                for flat in recs:
                    hits_checked += 1
                    code, t, j = giant.decode_flat(
                        int(flat), cfg.jobs_per_epoch, n
                    )
                    k = checker.verify_hit(ctx, self.base.baby, code, t, j)
                    if k is not None and pk <= k <= pke:
                        return ssolver.SolveResult(
                            k, steps, time.time() - t0, e + 1, hits_checked
                        )
        return ssolver.SolveResult(None, steps, time.time() - t0,
                                   total_super, hits_checked)
