"""End-to-end BSGS solver orchestration (single chip).

The TPU-native counterpart of the reference's main program sequence
(1_9_7File.pb:4387-5177): build/load the baby table and giant offsets, scan
the key range in epochs of jitted jobs, verify every hit on the host, and
report the private key. Multi-chip range striping lives in
bsgs_tpu/parallel (the reference's per-GPU thread + mutex job counter,
1_9_7File.pb:2077-2092, becomes deterministic epoch striding over a mesh).

The scan loop is PIPELINED: up to ``cfg.pipeline`` epochs are dispatched
to the device before the oldest one's hit count is read back, so the
host-side work (center generation, hit draining, transfer latency) hides
behind device compute — the TPU-native form of the reference's decoupled
checker/checkpoint threads (1_9_7File.pb:2490-2509, 3933).
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..ops import field as F, ec
from ..utils import ecpy
from . import checker, giant, table as tbl


@dataclasses.dataclass
class SolverConfig:
    """Geometry of the scan.

    w: baby-table size (keys covered per giant landing = 2w = stride s).
    htsz: bucket bits of the hash table (top bits of the 64-bit X prefix);
          None = auto (table.pick_htsz for the device window).
    n_offsets: offsets per job (reference t*b*p, README.md:2-16 flags).
    jobs_per_epoch: scan length per jit call / host sync.
    pipeline: epochs in flight before forcing a host sync (1 = synchronous).
    """

    w: int
    htsz: Optional[int] = None
    n_offsets: int = 1 << 18
    jobs_per_epoch: int = 8
    window: int = tbl.DEVICE_WINDOW
    chunk: int = 256
    hit_cap: int = 512
    table_tile: int = 1 << 14
    # Pallas-fused epoch kernel (models/giant.run_epoch_fused). None = auto:
    # on when running on TPU and n_offsets divides the kernel block.
    fused: Optional[bool] = None
    chunk_c: int = 64
    lanes_w: int = 256
    n_split: int = 8
    pipeline: int = 3
    # job groups staggered inside one epoch program so probe-gather DMAs
    # of one group overlap the next group's EC kernels (fused path only;
    # measured ~6% on v5e at 2, PROFILE_r04)
    epoch_phases: int = 2
    # hit-position source for streamed big-w builds: "mirror" keeps a host
    # (2^htsz, window) position matrix, "rescan" regenerates the prefix
    # stream on device per hit (host RAM decoupled from w — the analog of
    # the reference's -sf file-probe mode, 1_9_7File.pb:907-918,3232-3444),
    # "auto" picks rescan at w >= 2^28
    positions: str = "auto"
    # drains to pool before verifying accumulated hits (rescan-mode
    # tables only — their per-batch verification costs a full baby
    # regeneration pass; see Solver.solve). 0 = verify every drain.
    verify_defer_epochs: int = 64
    # cross-epoch software pipelining (fused path): each program probes the
    # PREVIOUS epoch's keys while computing this epoch's EC
    # (giant.pipelined_step). Measured on v5e: ~13% SLOWER than the direct
    # epoch — the TPU executes one program's ops in schedule order and did
    # not overlap the independent probe subgraph with the Pallas kernels —
    # so this stays off by default; kept as a tested option because the
    # structure is the right one for runtimes with multiple compute queues
    # (PROFILE_r04 §3).
    cross_pipeline: bool = False

    def __post_init__(self):
        if self.htsz is None:
            self.htsz = tbl.pick_htsz(self.w, self.window)

    @property
    def stride(self) -> int:
        return 2 * self.w

    @property
    def jobs_span(self) -> int:
        """Giant indices covered per job."""
        return 2 * self.n_offsets + 1

    @property
    def keys_per_epoch(self) -> int:
        return self.jobs_span * self.jobs_per_epoch * self.stride


class HitOverflow(RuntimeError):
    """An epoch produced more hits than its fixed-capacity buffer; the
    solve loop re-runs that epoch with a larger cap (the reference cannot
    recover from this — its winset buffer is fixed at launch)."""

    def __init__(self, count: int):
        super().__init__(f"hit buffer overflow ({count})")
        self.count = count


@dataclasses.dataclass
class SolveResult:
    key: Optional[int]
    giant_steps: int
    elapsed_s: float
    epochs: int
    hits_checked: int


def check_table_fits(dense_bytes: int, mem_bytes: Optional[int] = None,
                     n_shards: int = 1) -> None:
    """Refuse dense tables beyond the PER-CHIP HBM budget (total HBM from
    the tuner's device query, minus a reserve for scan transients and XLA
    scratch). With n_shards > 1 the budget applies to each chip's bucket
    range, so a sharded build legitimately exceeds one chip."""
    from ..utils import tuner

    if mem_bytes is None:
        mem_bytes = tuner.device_memory_bytes()
    budget = mem_bytes - 3 * (1 << 30)
    per_chip = -(-dense_bytes // max(1, n_shards))
    if per_chip > budget:
        hint = (
            "use --shard-table over a mesh to split the table across "
            "chips (parallel/sharded_table.py)"
            if n_shards == 1
            else f"this mesh's {n_shards} chips still hold "
            f"{per_chip / 2**30:.1f} GiB each — use more chips"
        )
        raise ValueError(
            f"dense table ({dense_bytes / 2**30:.1f} GiB) exceeds the "
            f"{budget / 2**30:.1f} GiB per-chip budget "
            f"({mem_bytes / 2**30:.0f} GiB HBM - 3 GiB scan reserve); "
            + hint
        )


def build_table(cfg: SolverConfig, mesh=None) -> tbl.BabyTable:
    """Default table build for a config: on-device pack on TPU (no host
    round-trips), host pack elsewhere (CPU tests need sorted_pre).

    ``mesh`` requests a bucket-range SHARDED build over its chips (the
    --shard-table path): each chip's row slice is scattered directly on
    that chip, so the full dense matrix never exists on any single
    device and w can exceed the single-chip HBM ceiling.
    """
    import jax

    # streamed rescan builds add the 2 B/slot uint16 verification hint
    bytes_per_slot = 6 if cfg.w >= 1 << 28 else 4
    dense_bytes = (1 << cfg.htsz) * cfg.window * bytes_per_slot
    if mesh is not None and mesh.devices.size > 1:
        check_table_fits(dense_bytes, n_shards=mesh.devices.size)
        return tbl.build_baby_table_streamed_sharded(
            cfg.w, cfg.htsz, mesh, window=cfg.window,
            positions=cfg.positions,
        )
    if jax.default_backend() == "tpu":
        check_table_fits(dense_bytes)
        if cfg.w >= 1 << 28:
            # big-w: incremental scatter keeps peak HBM at dense + 1 chunk
            return tbl.build_baby_table_streamed(
                cfg.w, cfg.htsz, window=cfg.window, positions=cfg.positions
            )
        return tbl.build_baby_table_device(
            cfg.w, cfg.htsz, window=cfg.window, tile=cfg.table_tile
        )
    return tbl.build_baby_table(
        cfg.w, cfg.htsz, window=cfg.window, tile=cfg.table_tile
    )


class Solver:
    def __init__(self, cfg: SolverConfig, baby: Optional[tbl.BabyTable] = None):
        self.cfg = cfg
        self.baby = baby if baby is not None else build_table(cfg)
        if self.baby.htsz != cfg.htsz:
            cfg.htsz = self.baby.htsz
        # Giant offsets O_j = j*S*G, j = 1..N (device-resident; analog of the
        # reference g2 buffer, 1_9_7File.pb:1905-2058).
        import jax

        s_g = ecpy.mul(cfg.stride)
        n = cfg.n_offsets
        if (jax.default_backend() == "tpu" and n >= 2048
                and n & (n - 1) == 0):
            # planar fused fill: ~20x the row-major XLA path
            from ..ops import epoch_kernel as EK, planar as PL

            ox_pl, oy_pl = EK.fill_multiples_planar(s_g, s_g, n)
            self.ox, self.oy = PL.to_rows(ox_pl), PL.to_rows(oy_pl)
        else:
            self.ox, self.oy = ec.fill_multiples(s_g, s_g, n)
        # Epoch center stepping: centers advance by -(2N+1)*S*G.
        self.center_step = ecpy.neg(ecpy.mul(cfg.jobs_span * cfg.stride))
        self._verify_offsets()

        self.fused = cfg.fused
        if self.fused is None:
            self.fused = (
                jax.default_backend() == "tpu"
                and cfg.n_offsets % (cfg.chunk_c * cfg.lanes_w) == 0
            )
        # Off-TPU the kernels run in Pallas interpreter mode (tests/debug).
        self._interpret = jax.default_backend() != "tpu"
        self._pipelined = bool(self.fused and cfg.cross_pipeline)
        phases = max(1, cfg.epoch_phases)
        self._phases = (
            phases
            if self.fused and not self._pipelined
            and cfg.jobs_per_epoch % phases == 0
            else 1
        )
        self._prev = None  # pipelined mode: last dispatched key bundle
        if self.fused:
            # Planar offset planes for the Pallas kernels (16, N).
            self.ox_pl = jnp.swapaxes(self.ox, 0, 1)
            self.oy_pl = jnp.swapaxes(self.oy, 0, 1)
        if self._pipelined:
            t, n = cfg.jobs_per_epoch, cfg.n_offsets
            self._dummy_prev = (
                jnp.zeros((8, t * n), jnp.uint32),
                jnp.zeros((t,), jnp.uint32),
                jnp.zeros((t,), jnp.uint32),
                jnp.zeros((t,), bool),
            )

    def _verify_offsets(self, checks: int = 4):
        """Runtime random spot-verify of the device giant-offset buffer
        against exact host EC — the reference's checkGiantArr
        (1_9_7File.pb:1524-1560): random j, recompute (j+1)*S*G by scalar
        mult, require X and Y to match bit-exactly."""
        cfg = self.cfg
        rng = np.random.default_rng(0x61A27)
        for j in {int(rng.integers(0, cfg.n_offsets)) for _ in range(checks)}:
            expect = ecpy.mul((j + 1) * cfg.stride)
            got = (
                F.from_limbs(np.asarray(self.ox[j])),
                F.from_limbs(np.asarray(self.oy[j])),
            )
            if got != expect:
                raise ValueError(
                    f"giant offset buffer corrupt at j={j}: {got[0]:#x} "
                    f"!= {expect[0]:#x}"
                )

    # -- center generation -------------------------------------------------
    def epoch_centers(self, q0, first_job: int, n_jobs: int):
        """Device arrays (x, y, inf) of job-center points M_g = Q0 - c_g*S*G
        for g = first_job .. first_job + n_jobs - 1.

        If the FIRST center itself is the point at infinity the fill cannot
        start from it; seed from the next center and mark lane 0 infinite
        (later infinite lanes are flagged by the fill itself).
        """
        cfg = self.cfg
        c0 = (first_job * cfg.jobs_span + cfg.n_offsets) * cfg.stride
        m0 = ecpy.sub(q0, ecpy.mul(c0))
        if m0 is None:
            m1 = self.center_step  # M_0 + step, exact since M_0 = inf
            cx, cy, cinf = ec.fill_multiples(
                m1, self.center_step, max(1, n_jobs - 1), with_inf=True
            )
            pad = jnp.asarray(F.to_limbs(0))[None]
            cx = jnp.concatenate([pad, cx])[:n_jobs]
            cy = jnp.concatenate([pad, cy])[:n_jobs]
            cinf = jnp.concatenate([jnp.ones(1, bool), cinf])[:n_jobs]
            return cx, cy, cinf
        return ec.fill_multiples(m0, self.center_step, n_jobs, with_inf=True)

    def _total_epochs(self, pk: int, pke: int) -> int:
        cfg = self.cfg
        m_max = (pke - pk) // cfg.stride + 1
        total_jobs = (m_max + cfg.jobs_span) // cfg.jobs_span + 1
        return -(-total_jobs // cfg.jobs_per_epoch)

    # -- epoch dispatch ------------------------------------------------------
    def _dispatch(self, q0, epoch: int, hit_cap: Optional[int] = None):
        """Launch one epoch on the device; returns a record
        (epoch_covered, first_job, idxs, cnt, giant_steps) with idxs/cnt
        still device-resident (async). In cross-pipelined mode the record
        carries the hits of the PREVIOUSLY dispatched epoch (None covered
        epoch for the priming step); _flush() drains the last one."""
        cfg = self.cfg
        cap = hit_cap or cfg.hit_cap
        first_job = epoch * cfg.jobs_per_epoch
        cx, cy, cinf = self.epoch_centers(q0, first_job, cfg.jobs_per_epoch)
        gs = (2 * cfg.n_offsets + 1) * cfg.jobs_per_epoch
        if self._pipelined:
            if self._prev is None:
                pk_, pbc, pdc, pcinf = self._dummy_prev
                prev_job, valid = None, False
            else:
                prev_job, pk_, pbc, pdc, pcinf = self._prev
                valid = True
            keys, bc, dc, idxs, cnt = giant.pipelined_step(
                pk_, pbc, pdc, pcinf, jnp.asarray(valid),
                cx, cy, self.ox_pl, self.oy_pl, self.baby.dense,
                htsz=cfg.htsz, chunk_c=cfg.chunk_c, lanes_w=cfg.lanes_w,
                hit_cap=cap, interpret=self._interpret,
                n_split=cfg.n_split,
            )
            self._prev = (first_job, keys, bc, dc, cinf)
            if prev_job is None:
                return None, None, idxs, cnt, 0
            return prev_job // cfg.jobs_per_epoch, prev_job, idxs, cnt, gs
        if self.fused:
            idxs, cnt, _ = giant.run_epoch_fused(
                cx, cy, cinf, self.ox_pl, self.oy_pl, self.baby.dense,
                htsz=cfg.htsz, chunk_c=cfg.chunk_c,
                lanes_w=cfg.lanes_w, hit_cap=cap,
                interpret=self._interpret, n_split=cfg.n_split,
                phases=self._phases,
            )
        else:
            idxs, cnt, _ = giant.run_epoch(
                cx, cy, cinf, self.ox, self.oy, self.baby.dense,
                htsz=cfg.htsz, chunk=cfg.chunk, hit_cap=cap,
            )
        # giant_steps is a static formula: do NOT touch the device value
        # here — an int() on a jit output would force a host sync per
        # dispatch and serialize the whole pipeline.
        return epoch, first_job, idxs, cnt, gs

    def _flush(self):
        """Drain the final in-flight key bundle of a pipelined scan."""
        cfg = self.cfg
        prev_job, keys, bc, dc, cinf = self._prev
        self._prev = None
        idxs, cnt = giant.probe_keys_flush(
            keys, bc, dc, cinf, self.baby.dense,
            htsz=cfg.htsz, hit_cap=cfg.hit_cap, n_split=cfg.n_split,
        )
        gs = (2 * cfg.n_offsets + 1) * cfg.jobs_per_epoch
        return prev_job // cfg.jobs_per_epoch, prev_job, idxs, cnt, gs

    def _redispatch(self, q0, epoch: int, cap: int):
        """Overflow recovery: re-run ONE epoch synchronously with a larger
        hit buffer (outside the cross-epoch pipeline; phases=1 so the
        flat-index layout matches _drain's decode in pipelined mode)."""
        cfg = self.cfg
        first_job = epoch * cfg.jobs_per_epoch
        cx, cy, cinf = self.epoch_centers(q0, first_job, cfg.jobs_per_epoch)
        if self.fused:
            idxs, cnt, _ = giant.run_epoch_fused(
                cx, cy, cinf, self.ox_pl, self.oy_pl, self.baby.dense,
                htsz=cfg.htsz, chunk_c=cfg.chunk_c, lanes_w=cfg.lanes_w,
                hit_cap=cap, interpret=self._interpret,
                n_split=cfg.n_split, phases=self._phases,
            )
        else:
            idxs, cnt, _ = giant.run_epoch(
                cx, cy, cinf, self.ox, self.oy, self.baby.dense,
                htsz=cfg.htsz, chunk=cfg.chunk, hit_cap=cap,
            )
        gs = (2 * cfg.n_offsets + 1) * cfg.jobs_per_epoch
        return epoch, first_job, idxs, cnt, gs

    def _collect(self, pub, pk: int, rec):
        """Force one in-flight epoch's results to the host and DECODE any
        hits (no verification). Returns (hit records, giant_steps);
        raises HitOverflow when the device buffer was too small."""
        cfg = self.cfg
        _, first_job, idxs, cnt, gs = rec
        cnt = int(cnt)
        if cnt > np.asarray(idxs).shape[-1]:
            raise HitOverflow(cnt)
        batch = []
        if cnt:
            ctx = checker.HitContext(
                q=pub, pk=pk, s=cfg.stride, n=cfg.n_offsets,
                job_base=first_job,
            )
            recs = np.asarray(idxs)
            recs = recs[recs != giant.FILL]
            batch = [
                (ctx,) + giant.decode_flat_phased(
                    int(flat), cfg.jobs_per_epoch, cfg.n_offsets,
                    self._phases,
                )
                for flat in recs
            ]
        return batch, gs

    def _verify(self, pending, pk: int, pke: int):
        """One batched verification of accumulated hit records: ALL
        rescan position lookups share a single baby-stream regeneration
        pass (checker.verify_hits_batched). Returns (key or None,
        hits_checked)."""
        keys, hits_checked = checker.verify_hits_batched(
            pending, self.baby
        )
        for k in keys:
            if pk <= k <= pke:
                return k, hits_checked
        return None, hits_checked

    def _drain(self, pub, pk: int, pke: int, rec):
        """_collect + immediate _verify (kept for tests/tools; the solve
        loop defers verification on rescan tables — see solve)."""
        batch, gs = self._collect(pub, pk, rec)
        if not batch:
            return None, gs, 0
        key, hc = self._verify(batch, pk, pke)
        return key, gs, hc

    # -- main loop ----------------------------------------------------------
    def solve(
        self,
        pub: tuple,
        pk: int,
        pke: int,
        progress: Optional[Callable] = None,
        epoch_stride: int = 1,
        epoch_offset: int = 0,
        max_epochs: Optional[int] = None,
        start_epoch: int = 0,
        on_epoch: Optional[Callable] = None,
    ) -> SolveResult:
        """Find k in [pk, pke] with k*G == pub (None key if exhausted).

        epoch_stride/epoch_offset stripe epochs across workers (multi-chip
        data parallelism replaces the reference's GetJob mutex counter,
        1_9_7File.pb:2077-2092, with deterministic striding).

        on_epoch/progress fire when an epoch is DRAINED (its results are
        on the host) — with pipelining this trails the dispatch frontier
        by up to cfg.pipeline epochs, which keeps checkpoint counters
        conservative exactly like the reference's min-counter rule
        (1_9_7File.pb:3897-3931).
        """
        cfg = self.cfg
        if pub is None or not ecpy.is_on_curve(pub):
            raise ValueError("pubkey is not a point on secp256k1")
        # Shortcut checks, like the reference's Q==G / Q==2G fast paths
        # (1_9_7File.pb:5069-5107): k0 == 0 means Q == pk*G.
        if ecpy.mul(pk) == pub:
            return SolveResult(pk, 0, 0.0, 0, 0)
        q0 = ecpy.sub(pub, ecpy.mul(pk))
        total_epochs = self._total_epochs(pk, pke)

        steps = 0
        hits_checked = 0
        t0 = time.time()
        epoch = start_epoch * epoch_stride + epoch_offset
        dispatched = 0
        drained = 0
        depth = max(1, cfg.pipeline)
        inflight = collections.deque()
        self._prev = None  # pipelined state is per-solve

        def may_dispatch():
            return epoch < total_epochs and (
                max_epochs is None or dispatched < max_epochs
            )

        def pending_flush():
            return self._pipelined and self._prev is not None

        # Deferred hit verification (the TPU form of the reference's
        # ASYNC checkerThread, 1_9_7File.pb:3933): on rescan-mode tables
        # a single position lookup costs a full baby-stream regeneration
        # (~w/43.6M seconds), and at big w the 54-bit probe certainty
        # false-positives every few epochs — verifying per drain would
        # collapse throughput ~50x (measured 0.3 M steps/s at
        # w=1.5*2^30, PROFILE_r05 §6). Hits are therefore POOLED for up
        # to verify_defer_epochs drains and resolved in ONE batched
        # regeneration pass; checkpoint/progress callbacks trail
        # verification so resume never skips an unverified epoch.
        defer = (
            max(0, cfg.verify_defer_epochs)
            if self.baby.lookup_fn is not None else 0
        )
        pending = []
        first_pending = 0
        cb_queue = []  # (epoch, steps) awaiting verification

        def fire_callbacks():
            while cb_queue:
                e0, st0 = cb_queue.pop(0)
                if on_epoch is not None:
                    on_epoch(e0, st0)
                if progress is not None:
                    progress(e0 + 1, total_epochs, st0, time.time() - t0)

        while may_dispatch() or inflight or pending_flush():
            while may_dispatch() and len(inflight) < depth:
                inflight.append(self._dispatch(q0, epoch))
                dispatched += 1
                epoch += epoch_stride
            if not inflight:
                inflight.append(self._flush())
            rec = inflight.popleft()
            e = rec[0]
            while True:
                try:
                    batch, gs = self._collect(pub, pk, rec)
                    break
                except HitOverflow as ov:
                    # re-run this epoch with a buffer that fits (rare:
                    # collision-heavy tables / tiny test geometries)
                    cap = 1 << max(ov.count.bit_length() + 1, 8)
                    rec = self._redispatch(q0, e, cap)
            steps += gs
            if e is not None:
                drained += 1
                cb_queue.append((e, steps))
            if batch:
                if not pending:
                    first_pending = drained
                pending.extend(batch)
            scan_done = not (may_dispatch() or inflight or pending_flush())
            if pending and (scan_done or drained - first_pending >= defer):
                key, hc = self._verify(pending, pk, pke)
                hits_checked += hc
                pending = []
                if key is not None:
                    return SolveResult(
                        key, steps, time.time() - t0, drained, hits_checked
                    )
            if not pending:
                fire_callbacks()
        return SolveResult(None, steps, time.time() - t0, drained,
                           hits_checked)
