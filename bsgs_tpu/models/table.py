"""Baby-step table: device generation, CSR pack, fused device probe.

Re-design of the reference's baby-table pipeline (GenBabys
1_9_7File.pb:1237-1328, chained hash table :2555-2656, insertion sorts
:2771-2820, CSR pack :3015-3444) for TPU:

- Baby points 1G..wG are generated ON DEVICE in power-of-two tiles with the
  doubling-fill batch-add (ops/ec.fill_multiples), then advanced tile by
  tile with one batched add per tile; only the 64-bit X prefixes leave the
  compute (8 bytes/point instead of 96), and on the device build path they
  never leave the chip at all.
- Instead of mutex-guarded chained buckets + per-bucket insertion sort, the
  pack is a single radix/bitonic sort of the prefixes: the bucket is the
  TOP htsz bits, so sorting by (bucket, disc) groups buckets contiguously
  and orders entries within a bucket — a CSR table falls out of a
  sort + cumsum. Host (numpy/C++) and device (lax.sort + segment_sum +
  scatter) builders produce the identical structure.
- The device probe is ONE row gather of a dense (2^htsz, window) bucket
  matrix + a vectorized compare. Measured on v5e: the XLA gather is
  ISSUE-bound at ~36 ns/row for one gather but pipelines across
  INDEPENDENT gathers down to ~12 ns/row at 8-16 concurrent streams, and
  the cost is flat in row width up to 512 B. Hence the hot layout is
  window=128 (minor dim exactly one lane tile, so XLA adds no padding —
  a (R, 16) u32 array in HBM is padded 8x to (R, 128)!) and the epoch
  probe splits its stream into n_split independent gathers
  (``probe_keys_split``).

Table entries store the 32 bits of prefix below the bucket bits
(``disc``); a probe match therefore certifies htsz+32 prefix bits, and the
host checker re-verifies every hit exactly (like the reference's CPU-side
compareHTpack re-probe, 1_9_7File.pb:4096-4100).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F, ec
from ..utils import ecpy

_U32 = jnp.uint32


# Empty dense slots hold this sentinel. A probe whose own disc equals it
# false-positives (P = 2^-32 per probe) — harmless, the host checker
# verifies every hit exactly.
DENSE_FILL = np.uint32(0xFFFFFFFF)

# Device hot-path row width: exactly one lane tile (see module docstring).
DEVICE_WINDOW = 128


@dataclasses.dataclass
class BabyTable:
    """Packed baby table.

    The sorted CSR view (offsets + per-entry disc + baby position) is the
    "CPU table" role of the reference's htCPU artifact (used by the checker
    to enumerate candidate baby indices); the dense (2^htsz, window) uint32
    bucket matrix is the "GPU table" (htGPU) probed by the scan — same
    CPU/GPU split as the reference (1_9_7File.pb:3169-3444), with the GPU
    CSR + in-kernel binary search replaced by a row-gatherable dense
    layout. On the device build path every array below is device-resident
    (jnp); host builds keep them as numpy plus the full 64-bit
    ``sorted_pre`` for exact host lookups.
    """

    w: int
    htsz: int
    window: int
    offsets: np.ndarray  # (2^htsz + 1,) uint32 CSR bucket offsets
    disc_sorted: np.ndarray  # (w,) uint32, disc per sorted entry
    pos_sorted: np.ndarray  # (w,) uint32, baby index 1..w per sorted entry
    # device ("GPU table"): (2^htsz, window) uint32, DENSE_FILL-padded
    dense: jnp.ndarray
    # host-only full prefixes (None on the device build path)
    sorted_pre: Optional[np.ndarray] = None
    # streamed big-w build: host (2^htsz, window) mirror of baby POSITIONS
    # (slot-aligned with dense; 0 = empty). Replaces the CSR arrays, which
    # at w=2^30 would not be worth materializing host-side.
    pos_dense: Optional[np.ndarray] = None
    # rescan-mode position lookup (build_baby_table_streamed
    # positions="rescan"): regenerates the baby stream on device and
    # returns the indices matching a 64-bit prefix. Decouples big-w tables
    # from host RAM entirely (no 8 B/key mirror); costs one w-point
    # regeneration pass per *hit*, and hits are rare.
    lookup_fn: Optional[object] = None
    # streamed rescan builds: slot-aligned low 8 bits of each entry's
    # baby position (uint8, (2^htsz, window)); make_strided_lookup uses
    # it to narrow a hit's position to one mod-256 residue class
    pos_lo: Optional[jnp.ndarray] = None
    # build_baby_table_streamed_sharded: dense is a GLOBAL jax.Array
    # bucket-range-sharded over this many mesh chips (each holds
    # 2^htsz / n rows); the full matrix never exists on one device.
    # Single-chip probes of such a table are invalid — parallel.striped
    # routes probes collectively instead.
    n_table_shards: int = 1

    def lookup_positions(self, x_int: int) -> list[int]:
        """All baby indices whose X-coordinate prefix matches that of x_int
        (full 64 bits when sorted_pre is available, else the htsz+32 bits
        the packed table stores; duplicates are all returned, like the
        reference's startpos duplicate walk, 1_9_7File.pb:4266-4277).
        The checker verifies candidates exactly, so the 52-bit device match
        only ever adds astronomically rare extra candidates."""
        pre = x_int & ((1 << 64) - 1)
        if self.lookup_fn is not None:
            return self.lookup_fn(pre)
        if self.sorted_pre is not None:
            p = np.uint64(pre)
            l = int(np.searchsorted(self.sorted_pre, p, side="left"))
            r = int(np.searchsorted(self.sorted_pre, p, side="right"))
            return [int(v) for v in self.pos_sorted[l:r]]
        bucket = pre >> (64 - self.htsz)
        disc = (pre >> (32 - self.htsz)) & 0xFFFFFFFF
        if self.pos_dense is not None:
            # streamed build: one device row pull + the host position mirror
            row = np.asarray(self.dense[bucket])
            prow = self.pos_dense[bucket]
            return [
                int(p) for p, d in zip(prow, row)
                if d == np.uint32(disc) and p != 0
            ]
        l = int(self.offsets[bucket])
        r = int(self.offsets[bucket + 1])
        d = np.asarray(self.disc_sorted[l:r])
        p = np.asarray(self.pos_sorted[l:r])
        return [int(v) for v, m in zip(p, d == np.uint32(disc)) if m]

    def lookup_positions_batch(self, x_ints) -> dict:
        """lookup_positions for MANY X prefixes at once, keyed by the
        64-bit prefix. On rescan-mode tables (lookup_fn) the whole batch
        shares ONE baby-stream regeneration pass — the per-call cost
        (~30 s at w=2^30 on v5e) does not multiply with the hit count.
        Other table kinds answer from host arrays per prefix (cheap)."""
        pres = sorted({int(x) & ((1 << 64) - 1) for x in x_ints})
        if not pres:
            return {}
        batch = getattr(self.lookup_fn, "batch", None)
        if batch is not None:
            return batch(pres)
        return {p: self.lookup_positions(p) for p in pres}


@dataclasses.dataclass
class TableStats:
    """Build-quality summary, the analog of the reference's
    HashTableSammary printout (total/unique/collisions/max bucket,
    1_9_7File.pb:2641-2656)."""

    entries: int
    buckets: int
    max_bucket: int
    mean_load: float
    empty_buckets: int
    window: int
    # duplicate (bucket, disc) pairs — probe-indistinguishable entries the
    # checker disambiguates by walking all positions; None when the build
    # path doesn't keep a sorted disc stream (streamed big-w builds)
    dup_pairs: Optional[int]

    def __str__(self):
        dup = "n/a" if self.dup_pairs is None else str(self.dup_pairs)
        return (
            f"table: {self.entries} entries in 2^"
            f"{(self.buckets - 1).bit_length()} buckets, load "
            f"{self.mean_load:.1f} avg / {self.max_bucket} max "
            f"(window {self.window}), {self.empty_buckets} empty, "
            f"{dup} duplicate keys"
        )


def table_stats(t: BabyTable) -> TableStats:
    counts = np.diff(np.asarray(t.offsets).astype(np.int64))
    dup = None
    if t.disc_sorted is not None:
        sd = np.asarray(t.disc_sorted)
        same = sd[1:] == sd[:-1]
        b = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
        same &= b[1:] == b[:-1]
        dup = int(same.sum())
    return TableStats(
        entries=int(counts.sum()),
        buckets=counts.size,
        max_bucket=int(counts.max()) if counts.size else 0,
        mean_load=float(counts.mean()) if counts.size else 0.0,
        empty_buckets=int((counts == 0).sum()),
        window=t.window,
        dup_pairs=dup,
    )


def bucket_disc(hi, lo, htsz: int):
    """(hi32, lo32) prefix -> (bucket, disc32).

    bucket = top htsz bits of the 64-bit prefix; disc = next 32 bits.
    """
    assert 1 <= htsz <= 31
    bucket = hi >> _U32(32 - htsz)
    disc = (hi << _U32(htsz)) | (lo >> _U32(32 - htsz))
    return bucket, disc


def pick_htsz(w: int, window: int = DEVICE_WINDOW) -> int:
    """Bucket bits so the expected bucket load is window/2 (Poisson tails
    then stay far below the fixed window; e.g. w=2^26, window=128 ->
    htsz=20, mean 64, P(any of 2^20 buckets > 128) ~ 1e-7)."""
    target = max(1, window // 2)
    htsz = max(4, (w // target - 1).bit_length())
    return min(htsz, 31)


# ---------------------------------------------------------------------------
# Prefix generation (device tiles)


def _prefix_tiles(w: int, tile: int, first: int = 1, stride: int = 1):
    """Yield (hi, lo) uint32 device arrays of X prefixes of the points
    (first + i*stride)G, i = 0..w-1, tile by tile (each at most ``tile``
    long). Defaults cover 1G..wG (the baby stream)."""
    tile = min(tile, 1 << max(1, (w - 1).bit_length()))
    bx, by = ec.fill_multiples(ecpy.mul(first), ecpy.mul(stride), tile)
    step = ecpy.mul(tile * stride)
    cx, cy = jnp.asarray(F.to_limbs(step[0])), jnp.asarray(F.to_limbs(step[1]))
    d2 = ecpy.dbl(step)
    dx, dy = jnp.asarray(F.to_limbs(d2[0])), jnp.asarray(F.to_limbs(d2[1]))
    prefix_fn = jax.jit(lambda x: F.x_prefix64(x))
    done = 0
    while done < w:
        take = min(tile, w - done)
        hi, lo = prefix_fn(bx)
        yield hi[:take], lo[:take]
        done += take
        if done < w:
            bx, by, _ = ec.extend_tile(bx, by, cx, cy, dx, dy)


def _prefix_tiles_planar(w: int, tile: int, interpret: bool = False,
                         first: int = 1, stride: int = 1):
    """Planar-Pallas twin of _prefix_tiles: yields (hi, lo) (1, take) uint32
    prefix planes of (first + i*stride)G tile by tile, with the tile
    advance running in the fused add-const kernel
    (ops/epoch_kernel.add_const_planar) instead of row-major XLA EC ops —
    the generation hot loop at ~20x the throughput. Requires tile (power
    of two) >= 2048 lanes."""
    from ..ops import epoch_kernel as EK, planar as PL

    tile = min(tile, 1 << max(11, (w - 1).bit_length()))
    assert tile >= 2048 and tile & (tile - 1) == 0, tile
    xs, ys = EK.fill_multiples_planar(ecpy.mul(first), ecpy.mul(stride),
                                      tile, interpret=interpret)
    step = ecpy.mul(tile * stride)
    cxc = jnp.asarray(PL.const_col(step[0]))
    cyc = jnp.asarray(PL.const_col(step[1]))
    prefix_fn = jax.jit(PL.x_prefix64)
    hi, lo = prefix_fn(xs)
    done = 0
    while done < w:
        take = min(tile, w - done)
        yield hi[:, :take], lo[:, :take]
        done += take
        if done < w:
            xs, ys, hi, lo = EK.add_const_planar(
                xs, ys, cxc, cyc, interpret=interpret
            )
            hi, lo = hi[None], lo[None]


def compute_prefixes(w: int, tile: int = 1 << 14) -> np.ndarray:
    """64-bit X prefixes of 1G..wG as a HOST uint64 array (host build /
    test path; the device build keeps prefixes on-chip instead)."""
    out = np.empty(w, dtype=np.uint64)
    done = 0
    for hi, lo in _prefix_tiles(w, tile):
        take = hi.shape[0]
        h = np.asarray(hi, dtype=np.uint64)
        l = np.asarray(lo, dtype=np.uint64)
        out[done : done + take] = (h << np.uint64(32)) | l
        done += take
    return out


# ---------------------------------------------------------------------------
# Device pack: sort + segment ranks + scatter, all on-chip


@partial(jax.jit, static_argnames=("htsz", "window"))
def _device_pack(hi, lo, *, htsz: int, window: int):
    w = hi.shape[0]
    nb = 1 << htsz
    bucket, disc = bucket_disc(hi, lo, htsz)
    pos = jnp.arange(1, w + 1, dtype=_U32)
    sb, sd, sp = jax.lax.sort((bucket, disc, pos), num_keys=2)
    ones = jnp.ones((w,), jnp.int32)
    counts = jax.ops.segment_sum(
        ones, sb.astype(jnp.int32), num_segments=nb, indices_are_sorted=True
    )
    offsets = jnp.concatenate(
        [jnp.zeros(1, _U32), jnp.cumsum(counts).astype(_U32)]
    )
    rank = jnp.arange(w, dtype=_U32) - offsets[sb]
    # overflowing entries (rank >= window) land in a dump slot; the host
    # asserts maxb <= window so this only triggers on misconfiguration
    flat = jnp.where(
        rank < _U32(window),
        sb * _U32(window) + rank,
        _U32(nb * window),
    )
    fp = jnp.full((nb * window + 1,), jnp.asarray(DENSE_FILL)).at[flat].set(sd)
    dense = fp[:-1].reshape(nb, window)
    return offsets, sd, sp, dense, counts.max()


def build_baby_table_device(
    w: int,
    htsz: Optional[int] = None,
    window: int = DEVICE_WINDOW,
    tile: int = 1 << 18,
) -> BabyTable:
    """Build the packed table entirely ON DEVICE: prefixes, sort, CSR and
    dense matrix never cross the host link (which is the whole cost of the
    host build path at scale). The reference's equivalent of this step is
    a multi-threaded CPU pipeline plus file artifacts
    (1_9_7File.pb:1237-1328, 3645-3895); on TPU, regeneration is faster
    than any transfer, so artifacts are only kept for host-build flows.
    """
    if htsz is None:
        htsz = pick_htsz(w, window)
    if jax.default_backend() == "tpu" and w >= 2048:
        tiles = [
            (h.reshape(-1), l.reshape(-1))
            for h, l in _prefix_tiles_planar(w, max(tile, 1 << 18))
        ]
    else:
        tiles = list(_prefix_tiles(w, tile))
    hi = jnp.concatenate([t[0] for t in tiles])
    lo = jnp.concatenate([t[1] for t in tiles])
    offsets, sd, sp, dense, maxb = _device_pack(hi, lo, htsz=htsz,
                                                window=window)
    maxb = int(maxb)
    if maxb > window:
        raise ValueError(
            f"bucket overflow: max bucket {maxb} > window {window}; "
            f"raise htsz (now {htsz}) or window"
        )
    return BabyTable(
        w=w, htsz=htsz, window=window,
        offsets=offsets, disc_sorted=sd, pos_sorted=sp, dense=dense,
        sorted_pre=None,
    )


# ---------------------------------------------------------------------------
# Streamed big-w build: incremental scatter, O(chunk) extra device memory


def _disc_lo_shift(htsz: int) -> tuple[int, int]:
    """(shift, mask) extracting up to 8 prefix bits just below the 54
    (htsz+32) the dense entry certifies: the 64-bit prefix's low
    32 - htsz bits are otherwise DISCARDED, and storing 8 of them in the
    hint word lets verification reject probe false positives without any
    regeneration (PROFILE_r05 §6)."""
    spare = 32 - htsz
    take = min(8, max(0, spare))
    return spare - take, (1 << take) - 1


@partial(jax.jit, static_argnames=("htsz", "window"),
         donate_argnums=(2, 3, 4))
def _chunk_scatter(hi, lo, dense, counts, hint, base, *, htsz: int,
                   window: int):
    """Insert one chunk of prefixes into the incremental dense matrix.

    rank-in-bucket = running bucket fill (counts) + rank within the chunk
    (sort by bucket, then index minus segment start). Overflowing entries
    (rank >= window) get an out-of-bounds row and are DROPPED by the
    scatter; the builder checks counts.max() afterwards. ``hint`` is the
    slot-aligned uint16 verification hint: low byte = position & 0xFF
    (the mod-256 residue make_strided_lookup regenerates), high byte =
    8 extra prefix bits below the stored disc (false-positive filter).
    Returns the donated (dense, counts, hint) plus (slot, pos) for the
    host position mirror.
    """
    m = hi.shape[0]
    bucket, disc = bucket_disc(hi, lo, htsz)
    sh, mk = _disc_lo_shift(htsz)
    dlo = (lo >> _U32(sh)) & _U32(mk)
    pos = base + jnp.arange(1, m + 1, dtype=_U32)
    sb, sd, sp, sdlo = jax.lax.sort((bucket, disc, pos, dlo), num_keys=1)
    idx = jnp.arange(m, dtype=_U32)
    is_start = jnp.concatenate([jnp.ones(1, bool), sb[1:] != sb[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, _U32(0)))
    rank = idx - seg_start + counts[sb]
    valid = rank < _U32(window)
    row = jnp.where(valid, sb, _U32(1 << htsz))  # OOB row -> drop
    col = jnp.where(valid, rank, _U32(0))
    # NOTE on chunk sizing: XLA materializes this 2-D scatter's (m, 2)
    # index tensor padded 64x to lane tiles (~512 B per element of HLO
    # temp — an 8 GiB temp at chunk=2^24, measured OOM next to a big
    # dense). A flat 1-D scatter avoids the pad but forces an equally
    # large relayout copy at the 1-D<->2-D reshape. Hence big builds use
    # small chunks — see build_baby_table_streamed.
    dense = dense.at[row, col].set(sd, mode="drop")
    hint = hint.at[row, col].set(
        ((sp & _U32(0xFF)) | (sdlo << _U32(8))).astype(jnp.uint16),
        mode="drop",
    )
    counts = counts.at[sb].add(_U32(1))
    slot = jnp.where(valid, sb * _U32(window) + rank, _U32(0))
    return dense, counts, hint, valid, slot, sp


# Up to 16 matching indices are returned per generated tile. The
# CSR/mirror lookup paths walk ALL duplicates; here the stream is
# matched on the full 64-bit prefix, so >16 duplicates inside one
# 2^20-point tile would need ~2^-64 collisions 17 times over —
# beyond astronomically unlikely (the birthday bound for even TWO
# 64-bit duplicates in a tile is ~2^-25).
@jax.jit
def _match(hi, lo, th, tl):
    m = (hi.reshape(-1) == th) & (lo.reshape(-1) == tl)
    idx, = jnp.nonzero(m, size=16, fill_value=-1)
    return idx


def make_strided_lookup(w: int, dense, pos_lo, htsz: int,
                        tile: int = 1 << 20):
    """Position lookup via the slot-aligned uint16 verification hint
    (``pos_lo``; low byte = position & 0xFF, high byte = 8 extra prefix
    bits below the stored disc):

    1. a probe false positive is rejected by comparing the hint's extra
       prefix bits against the landing — two host row pulls, no
       regeneration at all (the 54-bit probe certainty false-positives
       every ~2.7 epochs at load 384; full-stream verification throttled
       big-w scans 50x, PROFILE_r05 §6);
    2. a surviving (62-bit-certain) hit narrows its baby index to
       r ≡ r_lo (mod 256) and regenerates only that SUBSEQUENCE —
       w/256 points (~0.2-0.5 s at w=1.5*2^30) instead of the full
       stream (~90 s through the bench transport).

    Costs 2 B/slot of HBM next to the 4 B/slot dense matrix. Candidates
    are still confirmed by exact host EC in the checker — the hint only
    prunes, never admits.
    """
    sh, mk = _disc_lo_shift(htsz)
    has_filter = (
        getattr(pos_lo, "dtype", None) == jnp.uint16 and mk > 0
    )

    def _residue_scan(pre64: int, r_lo: int):
        first = r_lo if r_lo else 256
        if first > w:
            return []
        count = (w - first) // 256 + 1
        th = np.uint32(pre64 >> 32)
        tl = np.uint32(pre64 & 0xFFFFFFFF)
        gen = (
            _prefix_tiles_planar(count, tile, first=first, stride=256)
            if jax.default_backend() == "tpu" and count >= 2048
            else _prefix_tiles(count, min(tile, 1 << 14), first=first,
                               stride=256)
        )
        out = []
        done = 0
        for hi, lo in gen:
            take = hi.shape[-1]
            idx = np.asarray(_match(hi, lo, th, tl))
            out.extend(
                first + (done + int(i)) * 256
                for i in idx if 0 <= i < take
            )
            done += take
        return [r for r in out if 1 <= r <= w]

    def lookup(pre64: int) -> list:
        pre64 = int(pre64) & ((1 << 64) - 1)
        bucket = pre64 >> (64 - htsz)
        disc = np.uint32((pre64 >> (32 - htsz)) & 0xFFFFFFFF)
        row = np.asarray(dense[bucket])
        plo = np.asarray(pos_lo[bucket])
        want_dlo = (pre64 >> sh) & mk
        r_los = set()
        for p, dd in zip(plo, row):
            if dd != disc:
                continue
            if has_filter and (int(p) >> 8) != want_dlo:
                continue  # 8 extra prefix bits mismatch: rejected free
            r_los.add(int(p) & 0xFF)
        res = []
        for r_lo in sorted(r_los):
            res.extend(_residue_scan(pre64, r_lo))
        return sorted(set(res))

    def lookup_many(pres) -> dict:
        return {p: lookup(p) for p in pres}

    lookup.batch = lookup_many
    return lookup


def make_rescan_lookup(w: int, tile: int = 1 << 20):
    """Position lookup for mirror-less big-w tables: regenerate the baby
    prefix stream on device tile by tile and return every index whose full
    64-bit prefix matches. One call costs a w-point generation pass
    (~43.6 M pts/s on v5e), paid only when a HIT needs verification.
    Superseded by make_strided_lookup (pos_lo hint) for new builds; kept
    for artifacts that predate the hint array.
    """

    def lookup_many(pres) -> dict:
        """Positions for MANY prefixes in ONE generation pass (the pass is
        the cost; matching per tile is a cheap vector compare). Used by
        the artifact spot-checker, which would otherwise pay a full
        regeneration per checked prefix."""
        targets = [
            (p, np.uint32(p >> 32), np.uint32(p & 0xFFFFFFFF)) for p in pres
        ]
        gen = (
            _prefix_tiles_planar(w, tile)
            if jax.default_backend() == "tpu"
            else _prefix_tiles(w, min(tile, 1 << 14))
        )
        out = {p: [] for p in pres}
        done = 0
        for hi, lo in gen:
            take = hi.shape[-1]
            for p, th, tl in targets:
                idx = np.asarray(_match(hi, lo, th, tl))
                out[p].extend(
                    done + int(i) + 1 for i in idx if 0 <= i < take
                )
            done += take
        return out

    def lookup(pre64: int) -> list:
        return lookup_many([pre64])[pre64]

    lookup.batch = lookup_many
    return lookup


def build_baby_table_streamed(
    w: int,
    htsz: Optional[int] = None,
    window: int = DEVICE_WINDOW,
    tile: int = 1 << 20,
    chunk: int = 1 << 21,
    positions: str = "auto",
) -> BabyTable:
    """Big-w device build: the dense matrix is filled chunk by chunk so
    peak device memory is dense (8 B/entry at the default load factor 1/2)
    plus ONE chunk of transients — w = 2^30 fits a 16 GB chip alongside
    the scan. The reference reaches its w_max = 3.07e9 (README.md:23,
    1_9_7File.pb:4412) by streaming the build through a 512 MiB host
    buffer (packHTFile, 1_9_7File.pb:3232-3444); here the stream stays on
    the chip.

    ``positions`` controls how the checker later maps a matched prefix to
    baby indices:
      "mirror": ship (slot, position) per entry to a host (2^htsz, window)
        mirror during the build — O(12 B/key) over the host link (at
        w=2^30 that transfer dominated the round-4 measured build).
      "rescan": no mirror; lookups use the on-device low-8-bits position
        hint (make_strided_lookup): a hit regenerates only the w/256
        subsequence r ≡ r_lo (mod 256) — build stays on-chip, host RAM
        freed, verification ~0.2 s instead of a full-stream pass.
      "auto": rescan at w >= 2^28, mirror below.
    """
    if htsz is None:
        htsz = pick_htsz(w, window)
    if positions == "auto":
        positions = "rescan" if w >= (1 << 28) else "mirror"
    mirror = positions == "mirror"
    nb = 1 << htsz
    dense = jnp.full((nb, window), jnp.asarray(DENSE_FILL))
    counts = jnp.zeros((nb,), _U32)
    pos8 = jnp.zeros((nb, window), jnp.uint16)
    pos_dense = np.zeros((nb, window), np.uint32) if mirror else None
    flat_pos = pos_dense.reshape(-1) if mirror else None

    buf_h, buf_l, have, base = [], [], 0, 0

    def flush():
        nonlocal dense, counts, pos8, base, buf_h, buf_l, have
        hi = jnp.concatenate(buf_h) if len(buf_h) > 1 else buf_h[0]
        lo = jnp.concatenate(buf_l) if len(buf_l) > 1 else buf_l[0]
        dense, counts, pos8, valid, slot, sp = _chunk_scatter(
            hi, lo, dense, counts, pos8, np.uint32(base), htsz=htsz,
            window=window
        )
        if mirror:
            s = np.asarray(slot)
            p = np.asarray(sp)
            v = np.asarray(valid)
            flat_pos[s[v]] = p[v]
        base += have
        buf_h, buf_l, have = [], [], 0

    gen = (
        _prefix_tiles_planar(w, tile)
        if jax.default_backend() == "tpu"
        else _prefix_tiles(w, min(tile, 1 << 14))
    )
    for hi, lo in gen:
        buf_h.append(hi.reshape(-1))
        buf_l.append(lo.reshape(-1))
        have += hi.shape[-1]
        if have >= chunk:
            flush()
    if have:
        flush()

    counts_h = np.asarray(counts)
    maxb = int(counts_h.max())
    if maxb > window:
        raise ValueError(
            f"bucket overflow: max bucket {maxb} > window {window}; "
            f"raise htsz (now {htsz}) or window"
        )
    offsets = np.concatenate(
        [np.zeros(1, np.uint32),
         np.cumsum(counts_h, dtype=np.uint64).astype(np.uint32)]
    )
    return BabyTable(
        w=w, htsz=htsz, window=window,
        offsets=offsets, disc_sorted=None, pos_sorted=None,
        dense=dense, sorted_pre=None, pos_dense=pos_dense,
        pos_lo=None if mirror else pos8,
        lookup_fn=(
            None if mirror
            else make_strided_lookup(w, dense, pos8, htsz, tile)
        ),
    )


@partial(jax.jit, static_argnames=("htsz", "window", "bps"),
         donate_argnums=(2, 3, 4))
def _chunk_scatter_shard(hi, lo, dense, counts, hint, base, row0,
                         *, htsz: int, window: int, bps: int):
    """_chunk_scatter for ONE bucket-range shard: identical rank logic,
    but only entries whose bucket lies in [row0, row0 + bps) land; the
    rest scatter to the OOB drop row. Runs on the shard's own device
    (jit follows the donated dense/counts placement). ``hint`` is the
    shard's slice of the uint16 verification hint (same as
    _chunk_scatter's)."""
    m = hi.shape[0]
    bucket, disc = bucket_disc(hi, lo, htsz)
    sh, mk = _disc_lo_shift(htsz)
    dlo = (lo >> _U32(sh)) & _U32(mk)
    pos = base + jnp.arange(1, m + 1, dtype=_U32)
    sb, sd, sp, sdlo = jax.lax.sort((bucket, disc, pos, dlo), num_keys=1)
    idx = jnp.arange(m, dtype=_U32)
    is_start = jnp.concatenate([jnp.ones(1, bool), sb[1:] != sb[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, _U32(0)))
    local = sb - row0  # u32 wrap puts foreign buckets far above bps
    mine = local < _U32(bps)
    cnt_prev = counts[jnp.where(mine, local, _U32(0))]
    rank = idx - seg_start + cnt_prev
    valid = mine & (rank < _U32(window))
    row = jnp.where(valid, local, _U32(bps))  # OOB row -> drop
    col = jnp.where(valid, rank, _U32(0))
    # 2-D scatter; see _chunk_scatter's chunk-sizing note
    dense = dense.at[row, col].set(sd, mode="drop")
    hint = hint.at[row, col].set(
        ((sp & _U32(0xFF)) | (sdlo << _U32(8))).astype(jnp.uint16),
        mode="drop",
    )
    counts = counts.at[jnp.where(mine, local, _U32(bps))].add(
        _U32(1), mode="drop"
    )
    return dense, counts, hint


def build_baby_table_streamed_sharded(
    w: int,
    htsz: Optional[int] = None,
    mesh=None,
    window: int = DEVICE_WINDOW,
    tile: int = 1 << 20,
    chunk: int = 1 << 21,
    positions: str = "rescan",
) -> BabyTable:
    """Streamed big-w build DIRECTLY into bucket-range shards across a
    mesh: chip s owns rows [s*bps, (s+1)*bps) of the dense matrix, each
    generated chunk is broadcast to every chip and scattered into its own
    slice, and the full (2^htsz, window) matrix never exists on any one
    device — this is how --shard-table exceeds the single-chip HBM
    ceiling (the round-4 guard pointed here but no builder existed).
    The reference has no analog: it replicates the whole packed table
    per GPU (1_9_7File.pb:2350-2353), capping w at one card's VRAM.

    Positions are rescan-only (a host mirror at beyond-HBM w defeats the
    point). Single-process meshes only for now (every chunk is broadcast
    from the generating device).
    """
    from ..parallel.mesh import CHIPS_AXIS  # lazy: avoid import cycle
    from jax.sharding import NamedSharding, PartitionSpec

    assert mesh is not None, "sharded build needs a mesh"
    if htsz is None:
        htsz = pick_htsz(w, window)
    devices = list(mesh.devices.flatten())
    n = len(devices)
    nb = 1 << htsz
    assert nb % n == 0, "htsz must cover the mesh evenly"
    bps = nb // n
    dense_s = [
        jax.device_put(jnp.full((bps + 1, window), jnp.asarray(DENSE_FILL)),
                       d)
        for d in devices
    ]
    counts_s = [
        jax.device_put(jnp.zeros((bps + 1,), _U32), d) for d in devices
    ]
    hint_s = [
        jax.device_put(jnp.zeros((bps + 1, window), jnp.uint16), d)
        for d in devices
    ]

    buf_h, buf_l, have, base = [], [], 0, 0

    def flush():
        nonlocal base, buf_h, buf_l, have
        hi = jnp.concatenate(buf_h) if len(buf_h) > 1 else buf_h[0]
        lo = jnp.concatenate(buf_l) if len(buf_l) > 1 else buf_l[0]
        for s, d in enumerate(devices):
            hs = jax.device_put(hi, d)
            ls = jax.device_put(lo, d)
            dense_s[s], counts_s[s], hint_s[s] = _chunk_scatter_shard(
                hs, ls, dense_s[s], counts_s[s], hint_s[s],
                np.uint32(base), np.uint32(s * bps),
                htsz=htsz, window=window, bps=bps,
            )
        base += have
        buf_h, buf_l, have = [], [], 0

    gen = (
        _prefix_tiles_planar(w, tile)
        if jax.default_backend() == "tpu"
        else _prefix_tiles(w, min(tile, 1 << 14))
    )
    for hi, lo in gen:
        buf_h.append(hi.reshape(-1))
        buf_l.append(lo.reshape(-1))
        have += hi.shape[-1]
        if have >= chunk:
            flush()
    if have:
        flush()

    counts_h = np.concatenate([np.asarray(c)[:bps] for c in counts_s])
    maxb = int(counts_h.max())
    if maxb > window:
        raise ValueError(
            f"bucket overflow: max bucket {maxb} > window {window}; "
            f"raise htsz (now {htsz}) or window"
        )
    offsets = np.concatenate(
        [np.zeros(1, np.uint32),
         np.cumsum(counts_h, dtype=np.uint64).astype(np.uint32)]
    )
    sharding = NamedSharding(mesh, PartitionSpec(CHIPS_AXIS))
    dense = jax.make_array_from_single_device_arrays(
        (nb, window), sharding, [d[:bps] for d in dense_s]
    )
    pos_lo = jax.make_array_from_single_device_arrays(
        (nb, window), sharding, [h[:bps] for h in hint_s]
    )
    return BabyTable(
        w=w, htsz=htsz, window=window,
        offsets=offsets, disc_sorted=None, pos_sorted=None,
        dense=dense, sorted_pre=None, pos_lo=pos_lo,
        lookup_fn=make_strided_lookup(w, dense, pos_lo, htsz, tile),
        n_table_shards=n,
    )


# ---------------------------------------------------------------------------
# Host pack (numpy/C++ path: tests, artifacts, small w)


def dense_from_csr(offsets: np.ndarray, disc: np.ndarray,
                   window: int) -> np.ndarray:
    """(2^htsz+1,) CSR offsets + (w,) sorted discs -> (2^htsz, window)
    dense bucket matrix, DENSE_FILL in empty slots (host-side numpy)."""
    counts = np.diff(offsets.astype(np.int64))
    nb = counts.shape[0]
    w = disc.shape[0]
    dense = np.full((nb, window), DENSE_FILL, np.uint32)
    bucket_ids = np.repeat(np.arange(nb, dtype=np.int64), counts)
    within = np.arange(w, dtype=np.int64) - np.repeat(
        offsets[:-1].astype(np.int64), counts
    )
    dense[bucket_ids, within] = disc
    return dense


def fit_window(maxb: int, window: int) -> int:
    """Actual probe window: the requested minimum, grown (in steps of 4
    lanes) to fit the largest bucket. The TPU hot path requests
    window=DEVICE_WINDOW (=128, one full lane tile) and picks htsz so
    growth never triggers (pick_htsz)."""
    return max(window, -(-maxb // 4) * 4)


def pack_table(prefixes: np.ndarray, htsz: int, window: int = 16) -> BabyTable:
    """Sort + cumsum CSR pack of 64-bit prefixes, densified per bucket
    (host-side numpy/native).

    ``window`` is a MINIMUM; the dense row width auto-grows to the largest
    bucket (the reference instead enforces -w/-htsz safety bounds
    interactively and refuses, 1_9_7File.pb:4412-4472 — auto-growing keeps
    every (w, htsz) combination valid at a small probe-bandwidth cost).
    """
    from ..utils import native

    w = prefixes.shape[0]
    sorted_pre, sorted_pos = native.sort_prefixes(prefixes)
    offsets, disc, maxb = native.csr_pack(sorted_pre, htsz)
    window = fit_window(maxb, window)
    return BabyTable(
        w=w,
        htsz=htsz,
        window=window,
        offsets=offsets,
        disc_sorted=disc,
        pos_sorted=sorted_pos,
        dense=jnp.asarray(dense_from_csr(offsets, disc, window)),
        sorted_pre=sorted_pre,
    )


def build_baby_table(w: int, htsz: int, window: int = 16,
                     tile: int = 1 << 14) -> BabyTable:
    return pack_table(compute_prefixes(w, tile=tile), htsz, window)


# ---------------------------------------------------------------------------
# Probing


def probe_keys_split(bucket, disc, dense, n_split: int = 8):
    """Membership probe from precomputed (bucket, disc) key streams, split
    into n_split INDEPENDENT row gathers so the TPU gather pipeline
    overlaps them (~12 ns/probe at 8-16 streams vs ~36 for one; see module
    docstring). Trace-time helper for use inside a jit. Length must divide
    n_split (epoch streams are power-of-two sized)."""
    m = bucket.shape[0]
    if n_split <= 1 or m % n_split or m < 2 * n_split:
        win = dense[bucket]
        return jnp.any(win == disc[..., None], axis=-1)
    s = m // n_split
    parts = []
    for i in range(n_split):
        b = jax.lax.slice_in_dim(bucket, i * s, (i + 1) * s)
        d = jax.lax.slice_in_dim(disc, i * s, (i + 1) * s)
        win = dense[b]
        parts.append(jnp.any(win == d[:, None], axis=-1))
    return jnp.concatenate(parts)


@jax.jit
def probe_keys(bucket, disc, dense):
    """Membership probe from precomputed (bucket, disc) keys (as produced
    in-kernel by ops/epoch_kernel): one dense row gather + compare."""
    win = dense[bucket]
    return jnp.any(win == disc[..., None], axis=-1)


@partial(jax.jit, static_argnames=("htsz",))
def probe(hi, lo, dense, *, htsz: int):
    """Vectorized membership probe of 64-bit prefixes against the table.

    Per element: ONE row gather of the dense bucket matrix + a vectorized
    compare. Returns a bool mask.
    """
    bucket, d = bucket_disc(hi, lo, htsz)
    win = dense[bucket]
    return jnp.any(win == d[..., None], axis=-1)


def probe_x(x_limbs, table: BabyTable):
    """Probe full X coordinates (limb form) against a BabyTable."""
    hi, lo = F.x_prefix64(x_limbs)
    return probe(hi, lo, table.dense, htsz=table.htsz)
