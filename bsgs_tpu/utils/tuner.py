"""Auto-tuner: suggest solver geometry from device memory.

Equivalent of the reference's Tune (1_9_7File.pb:324-431), which sizes
-t/-b/-p/-w/-htsz against free VRAM. Here the knobs are (w, htsz,
n_offsets, jobs_per_epoch) against HBM, with the same resource model:

  HBM cost ~= offsets (2 * N * 64 B) + table (w*4 + 2^htsz*4 B)
              + transient batch intermediates (~N * 64 B * ~8).
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass
class TuneResult:
    w: int
    htsz: int
    n_offsets: int
    jobs_per_epoch: int
    est_table_bytes: int
    est_offsets_bytes: int
    est_transient_bytes: int

    @property
    def keys_per_job(self) -> int:
        return (2 * self.n_offsets + 1) * 2 * self.w


def device_memory_bytes(device=None) -> int:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return 16 * (1 << 30)  # v5e default


def tune(mem_bytes: int | None = None, range_bits: int | None = None
         ) -> TuneResult:
    """Pick a balanced geometry for the available HBM.

    Strategy (mirrors the reference's heuristic of growing the table until
    it fills memory, then sizing the batch): spend ~35% of HBM on the baby
    table, ~25% on offsets, leave the rest for transients; equalize baby
    (w) and giant (N per job * jobs) scale; cap w by range when given.
    """
    if mem_bytes is None:
        mem_bytes = device_memory_bytes()
    table_budget = int(mem_bytes * 0.35)
    offsets_budget = int(mem_bytes * 0.25)

    # table: w * 4 (disc) + 2^htsz * 4 (offsets); htsz = log2(w) - 2
    w = 1 << 20
    while 2 * (w * 4 + ((w >> 2) * 4)) <= table_budget and w < (1 << 31):
        w <<= 1
    if range_bits is not None:
        # no point making the baby table bigger than sqrt(range)
        w = min(w, 1 << max(10, (range_bits + 1) // 2))
    htsz = max(4, min(28, w.bit_length() - 3))

    n = 1 << 16
    while 2 * n * 64 * 2 <= offsets_budget and n < (1 << 22):
        n <<= 1
    n >>= 1
    n = max(1 << 12, n)
    return TuneResult(
        w=w,
        htsz=htsz,
        n_offsets=n,
        jobs_per_epoch=16,
        est_table_bytes=w * 4 + (1 << htsz) * 4,
        est_offsets_bytes=2 * n * 64,
        est_transient_bytes=n * 64 * 8,
    )
