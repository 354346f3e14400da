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


def shard_table(table: BabyTable, n_shards: int) -> ShardedTableSpec:
    """Split a packed table into bucket-range shards (host-side)."""
    nb = 1 << table.htsz
    assert nb % n_shards == 0, "htsz must cover n_shards evenly"
    bps = nb // n_shards
    off = np.asarray(table.offsets).astype(np.int64)
    entries = np.array(
        [off[(s + 1) * bps] - off[s * bps] for s in range(n_shards)],
        dtype=np.int64,
    )
    return ShardedTableSpec(
        htsz=table.htsz,
        window=table.window,
        n_shards=n_shards,
        dense=np.asarray(table.dense),
        shard_entries=entries,
    )


def make_sharded_probe(spec: ShardedTableSpec, axis: str = CHIPS_AXIS):
    """Probe closure to run INSIDE shard_map: local shards answer their
    bucket range for the all-gathered probe stream; psum ORs the answers.

    dense_local arrives as this chip's (buckets_per_shard, window) row
    slice (shard_map slicing of the stacked spec.dense).
    """
    htsz = spec.htsz
    bps = spec.buckets_per_shard

    def probe_fn(hi, lo, dense_local):
        n_local = hi.shape[0]
        hi_all = jax.lax.all_gather(hi, axis, tiled=True)
        lo_all = jax.lax.all_gather(lo, axis, tiled=True)
        bucket, d = bucket_disc(hi_all, lo_all, htsz)
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
