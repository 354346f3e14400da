"""Multi-chip range-striped solving via shard_map.

Replaces the reference's per-GPU worker threads + mutex job counter
(GetJob, 1_9_7File.pb:2077-2092) with deterministic partitioning: a global
epoch of n_chips * T jobs is laid out as a sharded centers array, each chip
scans its own T jobs, and the fixed-capacity hit buffers come back stacked.
Works with a replicated baby table (reference parity) or a bucket-sharded
one (new capability; see sharded_table.py).

MeshSolver subclasses models.solver.Solver and overrides only the epoch
dispatch/drain, so the pipelined scan loop, checkpoint hooks, progress
reporting, and resume semantics are IDENTICAL to the single-chip path
(round-2 review item: the mesh path must not be a feature-stripped fork).
"""

from __future__ import annotations

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
from .mesh import CHIPS_AXIS
from . import sharded_table as st


def _gathered(idxs, cnt):
    """Replicate the per-chip hit buffers to every chip (and hence every
    process): hit buffers are tiny, and replicated outputs keep the drain
    free of non-addressable shards on multi-host meshes."""
    buf_all = jax.lax.all_gather(idxs, CHIPS_AXIS)
    cnt_all = jax.lax.all_gather(cnt, CHIPS_AXIS)
    return buf_all.reshape(-1), cnt_all.reshape(-1)


def _epoch_fn_replicated(mesh: Mesh, *, chunk, hit_cap, htsz):
    def body(cx, cy, cinf, ox, oy, dense):
        probe_fn = giant.make_probe(dense, htsz=htsz)
        idxs, cnt = giant.epoch_probes(
            cx, cy, cinf, ox, oy, probe_fn, chunk=chunk, hit_cap=hit_cap,
        )
        return _gathered(idxs, cnt)

    c = P(CHIPS_AXIS)
    r = P()
    return jax.jit(
        _shard_map(
            body, mesh=mesh,
            in_specs=(c, c, c, r, r, r),
            out_specs=(r, r),
            check_vma=False,
        )
    )


def _epoch_fn_sharded_table(mesh: Mesh, spec: st.ShardedTableSpec, *,
                            chunk, hit_cap, routing: str = "all_gather"):
    if routing == "all_to_all":
        probe_sharded = st.make_alltoall_probe(spec)
    else:
        probe_sharded = st.make_sharded_probe(spec)

    def body(cx, cy, cinf, ox, oy, dense_sh):
        probe_fn = lambda hi, lo: probe_sharded(hi, lo, dense_sh)
        idxs, cnt = giant.epoch_probes(
            cx, cy, cinf, ox, oy, probe_fn, chunk=chunk, hit_cap=hit_cap,
        )
        return _gathered(idxs, cnt)

    c = P(CHIPS_AXIS)
    r = P()
    return jax.jit(
        _shard_map(
            body, mesh=mesh,
            in_specs=(c, c, c, r, r, c),
            out_specs=(r, r),
            check_vma=False,
        )
    )


def _epoch_fn_replicated_fused(mesh: Mesh, *, hit_cap, htsz, chunk_c,
                               lanes_w, n_split, interpret, phases=1):
    """Fused Pallas epoch INSIDE shard_map with a replicated table: per
    chip, the EC math runs in the epoch kernels and the probes are local
    dense-row gathers — the same program as the single-chip hot path
    (round-3 fix: the mesh path must not fall back to the row-major XLA
    body, whose EC math is ~100x slower; see ops/epoch_kernel.py).
    ``phases`` staggers each chip's job batch exactly like the
    single-chip path (+6% measured gather/EC overlap, PROFILE_r04 §2d);
    hit indices then decode with decode_flat_phased."""
    from ..models import table as T

    def body(cx, cy, cinf, ox_pl, oy_pl, dense):
        def probe_bd(b, d):
            return T.probe_keys_split(b, d, dense, n_split=n_split)

        idxs, cnt = giant.fused_epoch_probes(
            cx, cy, cinf, ox_pl, oy_pl,
            probe_bd, probe_bd, lambda b, d: T.probe_keys(b, d, dense),
            htsz=htsz, chunk_c=chunk_c, lanes_w=lanes_w, hit_cap=hit_cap,
            interpret=interpret, phases=phases,
        )
        return _gathered(idxs, cnt)

    c = P(CHIPS_AXIS)
    r = P()
    return jax.jit(
        _shard_map(
            body, mesh=mesh,
            in_specs=(c, c, c, r, r, r),
            out_specs=(r, r),
            check_vma=False,
        )
    )


def _epoch_fn_sharded_fused(mesh: Mesh, spec: st.ShardedTableSpec, *,
                            hit_cap, htsz, chunk_c, lanes_w,
                            interpret, routing: str = "all_gather",
                            phases=1):
    """Fused Pallas epoch INSIDE shard_map with a bucket-sharded table:
    the kernels emit (bucket, disc) probe keys per chip; the three streams
    are routed through the collective probe (all_gather or all_to_all).
    ``phases`` staggers the jobs as on the single-chip path; each phase
    runs its own probe collectives (the streams stay bulk-sized:
    per-phase traffic is 1/phases of the epoch's)."""
    if routing == "all_to_all":
        probe_bd = st.make_alltoall_probe_bd(spec)
    else:
        probe_bd = st.make_sharded_probe_bd(spec)

    def body(cx, cy, cinf, ox_pl, oy_pl, dense_sh):
        fn = lambda b, d: probe_bd(b, d, dense_sh)
        idxs, cnt = giant.fused_epoch_probes(
            cx, cy, cinf, ox_pl, oy_pl, fn, fn, fn,
            htsz=htsz, chunk_c=chunk_c, lanes_w=lanes_w, hit_cap=hit_cap,
            interpret=interpret, phases=phases,
        )
        return _gathered(idxs, cnt)

    c = P(CHIPS_AXIS)
    r = P()
    return jax.jit(
        _shard_map(
            body, mesh=mesh,
            in_specs=(c, c, c, r, r, c),
            out_specs=(r, r),
            check_vma=False,
        )
    )


class MeshSolver(ssolver.Solver):
    """Drives the scan over a device mesh; one "epoch" of the shared solve
    loop is a SUPER-epoch of n_chips * jobs_per_epoch jobs.

    shard_baby_table=True splits the dense table by bucket range across
    chips (each holds 1/n of the rows) with collective probe routing
    (sharded_table.py) — capability beyond the reference, which replicates
    the whole table per GPU (1_9_7File.pb:2350-2353).
    """

    def __init__(self, base: ssolver.Solver, mesh: Mesh,
                 shard_baby_table: bool = False,
                 probe_routing: str = "all_gather"):
        # adopt the base solver's state instead of rebuilding tables
        self.cfg = base.cfg
        self.baby = base.baby
        self.ox, self.oy = base.ox, base.oy
        self.center_step = base.center_step
        # Mesh epochs run the SAME fused Pallas kernels as the single-chip
        # hot path whenever the base solver does (round-3 fix: forcing the
        # row-major XLA body here collapsed per-chip rates ~100x).
        self.fused = base.fused
        # cross-epoch pipelining stays single-chip for now: the mesh body
        # is one shard_map program per super-epoch
        self._pipelined = False
        self._prev = None
        # within-epoch phase stagger carries over from the base solver
        # (each chip staggers its local job batch; +6% on v5e,
        # PROFILE_r04 §2d)
        self._phases = base._phases if self.fused else 1
        self._interpret = base._interpret
        self.base = base
        self.mesh = mesh
        self.shard_baby_table = shard_baby_table
        self.probe_routing = probe_routing
        self.n_chips = mesh.devices.size
        self._multiprocess = jax.process_count() > 1
        cfg = self.cfg
        self._sharding = NamedSharding(mesh, P(CHIPS_AXIS))
        self._replicated = NamedSharding(mesh, P())
        # pre-place the static operands once (replicated offsets, planar
        # when fused; table replicated or bucket-range sharded)
        if self.fused:
            self._ox_g = self._place(base.ox_pl, self._replicated)
            self._oy_g = self._place(base.oy_pl, self._replicated)
        else:
            self._ox_g = self._place(self.ox, self._replicated)
            self._oy_g = self._place(self.oy, self._replicated)
        self._epoch_fns = {}  # hit_cap -> compiled epoch fn
        if shard_baby_table:
            if self.baby.n_table_shards > 1:
                # table was BUILT sharded over this mesh (the beyond-HBM
                # path): adopt its global array, never touch the host
                if self.baby.n_table_shards != self.n_chips:
                    raise ValueError(
                        f"table is sharded over "
                        f"{self.baby.n_table_shards} chips but the mesh "
                        f"has {self.n_chips}"
                    )
                spec = st.spec_from_presharded(self.baby)
            else:
                spec = st.shard_table(self.baby, self.n_chips)
            self._spec = spec
            self._dense_g = self._place(spec.dense, self._sharding)
        else:
            self._spec = None
            self._dense_g = self._place(self.baby.dense, self._replicated)
        self._epoch = self._epoch_fn(cfg.hit_cap)

    def _epoch_fn(self, hit_cap: int):
        """Compiled super-epoch fn for a hit capacity (cached; larger caps
        compile on demand when an overflow re-run needs them)."""
        if hit_cap not in self._epoch_fns:
            cfg = self.cfg
            if self.fused:
                kw = dict(
                    hit_cap=hit_cap, htsz=cfg.htsz, chunk_c=cfg.chunk_c,
                    lanes_w=cfg.lanes_w, interpret=self._interpret,
                    phases=self._phases,
                )
                if self.shard_baby_table:
                    fn = _epoch_fn_sharded_fused(
                        self.mesh, self._spec,
                        routing=self.probe_routing, **kw
                    )
                else:
                    fn = _epoch_fn_replicated_fused(
                        self.mesh, n_split=cfg.n_split, **kw
                    )
            elif self.shard_baby_table:
                fn = _epoch_fn_sharded_table(
                    self.mesh, self._spec, routing=self.probe_routing,
                    chunk=cfg.chunk, hit_cap=hit_cap,
                )
            else:
                fn = _epoch_fn_replicated(
                    self.mesh, htsz=cfg.htsz, chunk=cfg.chunk,
                    hit_cap=hit_cap,
                )
            self._epoch_fns[hit_cap] = fn
        return self._epoch_fns[hit_cap]

    def _place(self, a, sharding):
        """Put an array on the mesh with the given sharding. Single-process
        meshes use device_put (no host round-trip — the table may already
        be device-resident); multi-host meshes build the global array from
        the host copy every process holds identically."""
        if not self._multiprocess:
            return jax.device_put(a, sharding)
        a = np.asarray(a)
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        )

    # -- epoch overrides -----------------------------------------------------
    @property
    def _jobs_per_super(self) -> int:
        return self.cfg.jobs_per_epoch * self.n_chips

    def _dispatch(self, q0, epoch: int, hit_cap: Optional[int] = None):
        cfg = self.cfg
        first_job = epoch * self._jobs_per_super
        cx, cy, cinf = self.epoch_centers(q0, first_job, self._jobs_per_super)
        sh = self._sharding
        cx, cy, cinf = (self._place(a, sh) for a in (cx, cy, cinf))
        epoch_fn = self._epoch_fn(hit_cap) if hit_cap else self._epoch
        buf, cnt = epoch_fn(cx, cy, cinf, self._ox_g, self._oy_g,
                            self._dense_g)
        gs = (2 * cfg.n_offsets + 1) * self._jobs_per_super
        return epoch, first_job, buf, cnt, gs

    def _redispatch(self, q0, epoch: int, cap: int):
        return self._dispatch(q0, epoch, hit_cap=cap)

    def _collect(self, pub, pk: int, rec):
        """Decode one super-epoch's hit buffers (all chips) into records;
        verification happens in the shared solve loop, pooled across
        chips AND deferred epochs (one rescan regeneration per batch)."""
        cfg = self.cfg
        _, first_job, buf, cnt, gs = rec
        cnt = np.asarray(cnt)
        buf = np.asarray(buf).reshape(self.n_chips, -1)
        cap = buf.shape[1]
        batch = []
        for chip in range(self.n_chips):
            c = int(cnt[chip])
            if c == 0:
                continue
            if c > cap:
                raise ssolver.HitOverflow(c)
            ctx = checker.HitContext(
                q=pub, pk=pk, s=cfg.stride, n=cfg.n_offsets,
                job_base=first_job + chip * cfg.jobs_per_epoch,
            )
            recs = buf[chip]
            recs = recs[recs != giant.FILL]
            batch.extend(
                (ctx,) + giant.decode_flat_phased(
                    int(flat), cfg.jobs_per_epoch, cfg.n_offsets,
                    self._phases,
                )
                for flat in recs
            )
        return batch, gs

    def _total_epochs(self, pk: int, pke: int) -> int:
        cfg = self.cfg
        m_max = (pke - pk) // cfg.stride + 1
        total_jobs = (m_max + cfg.jobs_span) // cfg.jobs_span + 1
        return -(-total_jobs // self._jobs_per_super)
