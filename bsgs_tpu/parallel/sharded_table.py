"""Baby-table sharding across chips with collective probe routing.

New capability beyond the reference (which replicates the entire packed
table to every GPU, 1_9_7File.pb:2350-2353): the dense bucket matrix is
split by bucket range so each chip holds 1/n of the rows, enabling tables
larger than one chip's HBM (BASELINE.json configs 3/5).

Probe routing v1 is gather-based: probe keys are all_gather'd over the
mesh axis, each chip answers for its own bucket range with one local row
gather, and the found masks are OR-reduced with psum. Probes are uniform
over buckets, so an all_to_all route (shuffling each probe only to its
owner) is the planned bandwidth refinement; all_gather is simple,
deadlock-free, and correct, and probe traffic (8 B/landing) is small next
to the EC compute per landing.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..models.table import BabyTable, bucket_disc
from .mesh import CHIPS_AXIS

_U32 = jnp.uint32


@dataclasses.dataclass
class ShardedTableSpec:
    """Host-side description of a bucket-range table sharding."""

    htsz: int
    window: int
    n_shards: int
    # (n_shards * buckets_per_shard, window): shard s owns the row range
    # [s * bps, (s+1) * bps); device_put with a row sharding splits it.
    dense: np.ndarray
    # per-shard entry counts (for tests / memory accounting)
    shard_entries: np.ndarray  # (n_shards,) int64

    @property
    def buckets_per_shard(self) -> int:
        return (1 << self.htsz) // self.n_shards


def _shard_entries(table: BabyTable, n_shards: int) -> np.ndarray:
    nb = 1 << table.htsz
    assert nb % n_shards == 0, "htsz must cover n_shards evenly"
    bps = nb // n_shards
    off = np.asarray(table.offsets).astype(np.int64)
    return np.array(
        [off[(s + 1) * bps] - off[s * bps] for s in range(n_shards)],
        dtype=np.int64,
    )


def shard_table(table: BabyTable, n_shards: int) -> ShardedTableSpec:
    """Split a packed table into bucket-range shards (host-side)."""
    return ShardedTableSpec(
        htsz=table.htsz,
        window=table.window,
        n_shards=n_shards,
        dense=np.asarray(table.dense),
        shard_entries=_shard_entries(table, n_shards),
    )


def spec_from_presharded(table: BabyTable) -> ShardedTableSpec:
    """Spec for a table built ALREADY bucket-range-sharded over a mesh
    (models/table.build_baby_table_streamed_sharded): table.dense is the
    global sharded jax.Array — never materialized on the host, which is
    the point (it may exceed any single chip's HBM)."""
    assert table.n_table_shards > 1
    return ShardedTableSpec(
        htsz=table.htsz,
        window=table.window,
        n_shards=table.n_table_shards,
        dense=table.dense,  # global sharded jax.Array, NOT host numpy
        shard_entries=_shard_entries(table, table.n_table_shards),
    )


def make_alltoall_probe_bd(spec: ShardedTableSpec, axis: str = CHIPS_AXIS,
                           slack: float = 2.0):
    """Bandwidth-lean probe routing from precomputed (bucket, disc) keys
    (as the fused Pallas epoch kernels emit them): each probe is shuffled
    to the ONE chip owning its bucket range (all_to_all), answered
    locally, and shuffled back — per-chip traffic is O(m) probes
    independent of mesh size, vs the all_gather route's O(n_chips * m)
    (make_sharded_probe_bd). No reference analog (it replicates the table
    per GPU, 1_9_7File.pb:2350-2353).

    Routing capacity per destination is slack * m / n_chips (probes are
    uniform over buckets, so Poisson tails above 2x the mean are
    astronomically rare). If a destination overflows anyway, the
    un-routable probes are conservatively marked FOUND: the host checker
    verifies every hit exactly, so correctness never depends on the route
    (they just cost verification work) — the same untrusted-hit discipline
    as the reference's checkerThread (1_9_7File.pb:3933-4296).
    """
    bps = spec.buckets_per_shard
    n = spec.n_shards

    def probe_fn(bucket, d, dense_local):
        m = bucket.shape[0]
        cap = max(128, -(-int(slack * m / n) // 128) * 128)
        idx = jnp.arange(m, dtype=_U32)
        sb, sd, sidx = jax.lax.sort((bucket, d, idx), num_keys=1)
        owner = sb // _U32(bps)  # owner-sorted because bucket-sorted
        # rank within owner segment (cummax of segment starts)
        is_start = jnp.concatenate(
            [jnp.ones(1, bool), owner[1:] != owner[:-1]]
        )
        seg_start = jax.lax.cummax(jnp.where(is_start, idx, _U32(0)))
        rank = idx - seg_start
        ok = rank < _U32(cap)
        slot = jnp.where(ok, owner * _U32(cap) + rank, _U32(n * cap))
        send_b = jnp.full((n * cap,), _U32(0xFFFFFFFF)).at[slot].set(
            sb, mode="drop"
        )
        send_d = jnp.zeros((n * cap,), _U32).at[slot].set(sd, mode="drop")
        # exchange: row i of (n, cap) goes to chip i; receive row j from j
        rb = jax.lax.all_to_all(send_b.reshape(n, cap), axis, 0, 0)
        rd = jax.lax.all_to_all(send_d.reshape(n, cap), axis, 0, 0)
        rb_f = rb.reshape(-1)
        rd_f = rd.reshape(-1)
        my = jax.lax.axis_index(axis).astype(_U32)
        local_b = rb_f - my * _U32(bps)
        mine = local_b < _U32(bps)  # u32 wrap excludes sentinels/others
        win = dense_local[jnp.where(mine, local_b, _U32(0))]
        found = jnp.any(win == rd_f[:, None], axis=-1) & mine
        # route answers back (row j = answers for probes I sent to chip j)
        fb = jax.lax.all_to_all(found.reshape(n, cap), axis, 0, 0)
        ffl = fb.reshape(-1)
        ans_sorted = jnp.where(
            ok, ffl[jnp.where(ok, slot, _U32(0))], True  # overflow -> found
        )
        return jnp.zeros((m,), bool).at[sidx].set(ans_sorted)

    return probe_fn


def make_alltoall_probe(spec: ShardedTableSpec, axis: str = CHIPS_AXIS,
                        slack: float = 2.0):
    """(hi, lo) 64-bit-prefix wrapper over make_alltoall_probe_bd (the
    row-major XLA epoch path probes by prefix)."""
    core = make_alltoall_probe_bd(spec, axis, slack)
    htsz = spec.htsz

    def probe_fn(hi, lo, dense_local):
        bucket, d = bucket_disc(hi, lo, htsz)
        return core(bucket, d, dense_local)

    return probe_fn


def make_sharded_probe_bd(spec: ShardedTableSpec, axis: str = CHIPS_AXIS):
    """Probe closure (bucket, disc keys) to run INSIDE shard_map: local
    shards answer their bucket range for the all-gathered probe stream;
    psum ORs the answers.

    dense_local arrives as this chip's (buckets_per_shard, window) row
    slice (shard_map slicing of the stacked spec.dense).
    """
    bps = spec.buckets_per_shard

    def probe_fn(bucket_local, d_local, dense_local):
        n_local = bucket_local.shape[0]
        bucket = jax.lax.all_gather(bucket_local, axis, tiled=True)
        d = jax.lax.all_gather(d_local, axis, tiled=True)
        my = jax.lax.axis_index(axis).astype(_U32)
        local_bucket = bucket - my * _U32(bps)
        mine = local_bucket < _U32(bps)  # u32 wraps below the range
        win = dense_local[jnp.where(mine, local_bucket, _U32(0))]
        found = jnp.any(win == d[:, None], axis=-1) & mine
        found = jax.lax.psum(found.astype(jnp.int32), axis) > 0
        # return this chip's own segment of the probe stream
        start = jax.lax.axis_index(axis) * n_local
        return jax.lax.dynamic_slice(found, (start,), (n_local,))

    return probe_fn


def make_sharded_probe(spec: ShardedTableSpec, axis: str = CHIPS_AXIS):
    """(hi, lo) 64-bit-prefix wrapper over make_sharded_probe_bd."""
    core = make_sharded_probe_bd(spec, axis)
    htsz = spec.htsz

    def probe_fn(hi, lo, dense_local):
        bucket, d = bucket_disc(hi, lo, htsz)
        return core(bucket, d, dense_local)

    return probe_fn
