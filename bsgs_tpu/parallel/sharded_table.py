"""Baby-table sharding across chips with collective probe routing.

New capability beyond the reference (which replicates the entire packed
table to every GPU, 1_9_7File.pb:2350-2353): the CSR table is split by
bucket range so each chip holds w/n_shards entries, enabling tables larger
than one chip's HBM (BASELINE.json configs 3/5).

Probe routing v1 is gather-based: probe keys are all_gather'd over the
mesh axis, each chip answers for its own bucket range, and the found masks
are OR-reduced with psum. Probes are uniform over buckets, so an
all_to_all route (shuffling each probe only to its owner) is the planned
bandwidth refinement; all_gather is simple, deadlock-free, and correct,
and probe traffic (8 B/landing) is small next to the EC compute per
landing.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..models.table import BabyTable, bucket_disc
from ..models import table as tbl
from .mesh import CHIPS_AXIS

_U32 = jnp.uint32


@dataclasses.dataclass
class ShardedTableSpec:
    """Host-side description of a bucket-range table sharding."""

    htsz: int
    window: int
    n_shards: int
    # stacked per-shard arrays (n_shards, ...), to be device_put sharded
    offsets: np.ndarray  # (n_shards, buckets_per_shard + 1) uint32, local
    disc: np.ndarray  # (n_shards, max_local + window) uint32

    @property
    def buckets_per_shard(self) -> int:
        return (1 << self.htsz) // self.n_shards


def shard_table(table: BabyTable, n_shards: int) -> ShardedTableSpec:
    """Split a packed table into bucket-range shards (host-side)."""
    nb = 1 << table.htsz
    assert nb % n_shards == 0, "htsz must cover n_shards evenly"
    bps = nb // n_shards
    offsets = np.asarray(table.offsets)
    disc = np.asarray(table.disc)  # includes window padding
    locs, discs = [], []
    max_local = 0
    for s in range(n_shards):
        o = offsets[s * bps : (s + 1) * bps + 1].astype(np.int64)
        lo, hi = int(o[0]), int(o[-1])
        locs.append((o - lo).astype(np.uint32))
        d = disc[lo : hi + table.window]
        discs.append(d)
        max_local = max(max_local, d.shape[0])
    disc_arr = np.zeros((n_shards, max_local), np.uint32)
    for s, d in enumerate(discs):
        disc_arr[s, : d.shape[0]] = d
    return ShardedTableSpec(
        htsz=table.htsz,
        window=table.window,
        n_shards=n_shards,
        offsets=np.stack(locs),
        disc=disc_arr,
    )


def make_sharded_probe(spec: ShardedTableSpec, axis: str = CHIPS_AXIS):
    """Probe closure to run INSIDE shard_map: local shards answer their
    bucket range for the all-gathered probe stream; psum ORs the answers.

    The per-shard arrays arrive with a leading length-1 shard axis
    (shard_map slicing of the stacked spec arrays).
    """
    htsz, window = spec.htsz, spec.window
    shard_bits = int(np.log2(spec.n_shards)) if spec.n_shards > 1 else 0
    bps = spec.buckets_per_shard

    def probe_fn(hi, lo, offsets_local, disc_local):
        offsets_local = offsets_local[0]
        disc_local = disc_local[0]
        n_local = hi.shape[0]
        hi_all = jax.lax.all_gather(hi, axis, tiled=True)
        lo_all = jax.lax.all_gather(lo, axis, tiled=True)
        bucket, d = bucket_disc(hi_all, lo_all, htsz)
        my = jax.lax.axis_index(axis).astype(_U32)
        owner = (bucket >> _U32(htsz - shard_bits)) if shard_bits else (
            jnp.zeros_like(bucket)
        )
        mine = owner == my
        local_bucket = jnp.where(mine, bucket - my * _U32(bps), _U32(0))
        o0 = offsets_local[local_bucket]
        o1 = offsets_local[local_bucket + _U32(1)]
        win = jax.vmap(
            lambda o: jax.lax.dynamic_slice(disc_local, (o,), (window,))
        )(o0)
        lane = jax.lax.broadcasted_iota(_U32, win.shape, 1)
        valid = lane < (o1 - o0)[:, None]
        found = jnp.any((win == d[:, None]) & valid, axis=-1) & mine
        found = jax.lax.psum(found.astype(jnp.int32), axis) > 0
        # return this chip's own segment of the probe stream
        start = jax.lax.axis_index(axis) * n_local
        return jax.lax.dynamic_slice(found, (start,), (n_local,))

    return probe_fn
