"""Baby-step table: device generation, CSR pack, fused device probe.

Re-design of the reference's baby-table pipeline (GenBabys
1_9_7File.pb:1237-1328, chained hash table :2555-2656, insertion sorts
:2771-2820, CSR pack :3015-3444) for TPU:

- Baby points 1G..wG are generated ON DEVICE in power-of-two tiles with the
  doubling-fill batch-add (ops/ec.fill_multiples), then advanced tile by
  tile with one batched add per tile; only the 64-bit X prefixes leave the
  device (8 bytes/point instead of 96).
- Instead of mutex-guarded chained buckets + per-bucket insertion sort, the
  pack is a single radix sort of the 64-bit prefixes: the bucket is the TOP
  htsz bits, so sorting by prefix both groups buckets contiguously and
  orders entries within a bucket — a CSR table falls out of a sort + cumsum.
- The device probe is ONE row gather of a dense (2^htsz, window) bucket
  matrix + vectorized compare, instead of a data-dependent binary search:
  a single embedding-style row gather is the fastest random access TPU
  HBM offers (measured ~60x over offset-gather + windowed dynamic_slice,
  and flat in row width up to 64 B), and build-time enforces max bucket
  size <= window so rows never overflow.

Table entries store the 32 bits of prefix below the bucket bits
(``disc``); a probe match therefore certifies htsz+32 prefix bits, and the
host checker re-verifies every hit exactly (like the reference's CPU-side
compareHTpack re-probe, 1_9_7File.pb:4096-4100).
"""

from __future__ import annotations

import dataclasses
from functools import partial

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


@dataclasses.dataclass
class BabyTable:
    """Packed baby table.

    Host side keeps the full sorted 64-bit prefixes + positions (the "CPU
    table", used by the checker to enumerate candidate baby indices) plus
    the CSR bucket offsets (used for sharding/persistence); the device
    side gets ONE dense (2^htsz, window) uint32 bucket matrix of 32-bit
    discriminants — same CPU/GPU split as the reference's htCPU/htGPU
    artifacts (1_9_7File.pb:3169-3444), with the GPU CSR replaced by a
    row-gatherable dense layout.
    """

    w: int
    htsz: int
    window: int
    # host ("CPU table")
    sorted_pre: np.ndarray  # (w,) uint64, ascending
    sorted_pos: np.ndarray  # (w,) uint32, baby index 1..w per entry
    offsets_host: np.ndarray  # (2^htsz + 1,) uint32 CSR bucket offsets
    # device ("GPU table")
    dense: jnp.ndarray  # (2^htsz, window) uint32 discs, DENSE_FILL-padded

    def lookup_positions(self, x_int: int) -> list[int]:
        """All baby indices whose X-coordinate low-64 prefix equals that of
        x_int (host path; exact 64-bit match, duplicates walked like the
        reference's startpos duplicate loop, 1_9_7File.pb:4266-4277)."""
        pre = np.uint64(x_int & ((1 << 64) - 1))
        l = int(np.searchsorted(self.sorted_pre, pre, side="left"))
        r = int(np.searchsorted(self.sorted_pre, pre, side="right"))
        return [int(p) for p in self.sorted_pos[l:r]]


def bucket_disc(hi, lo, htsz: int):
    """(hi32, lo32) prefix -> (bucket, disc32).

    bucket = top htsz bits of the 64-bit prefix; disc = next 32 bits.
    """
    assert 1 <= htsz <= 31
    bucket = hi >> _U32(32 - htsz)
    disc = (hi << _U32(htsz)) | (lo >> _U32(32 - htsz))
    return bucket, disc


def compute_prefixes(w: int, tile: int = 1 << 14) -> np.ndarray:
    """64-bit X prefixes of 1G..wG, generated on device in tiles."""
    tile = min(tile, 1 << max(1, (w - 1).bit_length()))
    bx, by = ec.fill_multiples(ecpy.G, ecpy.G, tile)
    step = ecpy.mul(tile)
    cx, cy = jnp.asarray(F.to_limbs(step[0])), jnp.asarray(F.to_limbs(step[1]))
    d2 = ecpy.dbl(step)
    dx, dy = jnp.asarray(F.to_limbs(d2[0])), jnp.asarray(F.to_limbs(d2[1]))

    out = np.empty(w, dtype=np.uint64)
    done = 0
    prefix_fn = jax.jit(lambda x: F.x_prefix64(x))
    while done < w:
        take = min(tile, w - done)
        hi, lo = prefix_fn(bx)
        hi = np.asarray(hi[:take], dtype=np.uint64)
        lo = np.asarray(lo[:take], dtype=np.uint64)
        out[done : done + take] = (hi << np.uint64(32)) | lo
        done += take
        if done < w:
            bx, by, inf = ec.extend_tile(bx, by, cx, cy, dx, dy)
    return out


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
    lanes = 16 B of gather row) to fit the largest bucket."""
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
        sorted_pre=sorted_pre,
        sorted_pos=sorted_pos,
        offsets_host=offsets,
        dense=jnp.asarray(dense_from_csr(offsets, disc, window)),
    )


def build_baby_table(w: int, htsz: int, window: int = 16,
                     tile: int = 1 << 14) -> BabyTable:
    return pack_table(compute_prefixes(w, tile=tile), htsz, window)


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
