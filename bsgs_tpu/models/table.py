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

    def lookup_positions(self, x_int: int) -> list[int]:
        """All baby indices whose X-coordinate prefix matches that of x_int
        (full 64 bits when sorted_pre is available, else the htsz+32 bits
        the packed table stores; duplicates are all returned, like the
        reference's startpos duplicate walk, 1_9_7File.pb:4266-4277).
        The checker verifies candidates exactly, so the 52-bit device match
        only ever adds astronomically rare extra candidates."""
        pre = x_int & ((1 << 64) - 1)
        if self.sorted_pre is not None:
            p = np.uint64(pre)
            l = int(np.searchsorted(self.sorted_pre, p, side="left"))
            r = int(np.searchsorted(self.sorted_pre, p, side="right"))
            return [int(v) for v in self.pos_sorted[l:r]]
        bucket = pre >> (64 - self.htsz)
        disc = (pre >> (32 - self.htsz)) & 0xFFFFFFFF
        l = int(self.offsets[bucket])
        r = int(self.offsets[bucket + 1])
        d = np.asarray(self.disc_sorted[l:r])
        p = np.asarray(self.pos_sorted[l:r])
        return [int(v) for v, m in zip(p, d == np.uint32(disc)) if m]


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


def _prefix_tiles(w: int, tile: int):
    """Yield (hi, lo) uint32 device arrays of X prefixes of 1G..wG, tile by
    tile (each at most ``tile`` long)."""
    tile = min(tile, 1 << max(1, (w - 1).bit_length()))
    bx, by = ec.fill_multiples(ecpy.G, ecpy.G, tile)
    step = ecpy.mul(tile)
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
