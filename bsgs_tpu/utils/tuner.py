"""Auto-tuner: suggest a complete solver flag set from device memory.

Equivalent of the reference's Tune (1_9_7File.pb:324-431), which grows
-t/-b/-p until per-thread rounds balance, sizes -w/-htsz against free
VRAM, and prints three host-RAM estimates (R1-R3). Here the knobs are the
full CLI surface (w, htsz, window, n_offsets, jobs_per_epoch, n_split,
pipeline) sized against HBM with the ACTUAL device layout of this
implementation (measured on TPU v5e, PROFILE_r03/r04):

  dense table      2^htsz * window * 4 B   (window=128 rows; htsz from
                                             pick_htsz => ~8 B per entry)
  giant offsets    2 * N * 64 B             (planar x|y, 16 u32 limbs)
  epoch transients ~T * N * 168 B           (fwd prefix planes 64 B,
                                             bwd key rows 32 B, probe
                                             masks/gathers ~72 B; only
                                             `pipeline` epochs in flight
                                             share one compiled buffer)
  build transients device pack sorts (hi, lo, pos): ~24 B/key x2 sort
                   buffers; the streamed builder replaces this with one
                   chunk (2^24 keys) of transients, which is why it is
                   selected automatically at w >= STREAMED_MIN_W.

Host-RAM estimates (the reference's R1-R3, 1_9_7File.pb:394-425):
  streamed builds keep a (2^htsz, window) uint32 position mirror on the
  host for the checker; host (CPU-backend) builds additionally hold the
  full 8 B/key sorted prefix array during packing.

The device query degrades gracefully: TPU memory_stats() is unavailable
through some transports (it returns None on the axon tunnel used for
remote bench runs), so v5e's 16 GiB is assumed unless told otherwise.
"""

from __future__ import annotations

import dataclasses

import jax


# models/solver.build_table switches to the incremental-scatter streamed
# builder at this size (keeps peak HBM at dense + one chunk).
STREAMED_MIN_W = 1 << 28

# HBM held back from the steady-state scan working set for XLA scratch,
# hit buffers, and build transients beyond the table itself. Absolute
# (not a fraction): the w=2^31 configuration measured on v5e runs with
# ~2.7 GiB of true headroom (PROFILE_r05).
_RESERVE_BYTES = int(2.5 * (1 << 30))


def dense_layout(w: int, window: int = 128):
    """(htsz, window) of the dense device table for a given w.

    The 128-lane row at load ~window/2 is the keys/s optimum at every
    scale, MEASURED against the denser alternatives (PROFILE_r05 §5):
    HBM tiles the lane dim to multiples of 128 (a 192-wide row silently
    COSTS 256 lanes — a 16 GiB OOM at htsz=24), and while 512-lane rows
    at load 384 carry 1.3x more keys per slot (bigger buckets
    concentrate relatively tighter — w = 1.5*2^30 built and scanned on
    the chip), their 2 KB compare costs ~+7 ns/probe, which eats the w
    gain: 33 M steps/s * 2^31.6 < 60 M * 2^31 effective keys/s. Callers
    chasing max-w can still pass window=512 explicitly; the builders
    verify max load exactly and refuse on overflow either way.
    """
    from ..models import table as tbl

    return tbl.pick_htsz(w, window), window


@dataclasses.dataclass
class TuneResult:
    w: int
    htsz: int
    window: int
    n_offsets: int
    jobs_per_epoch: int
    n_split: int
    pipeline: int
    streamed_build: bool
    est_table_bytes: int
    est_offsets_bytes: int
    est_transient_bytes: int
    est_build_peak_bytes: int
    est_host_bytes: int

    @property
    def keys_per_epoch(self) -> int:
        return (2 * self.n_offsets + 1) * self.jobs_per_epoch * 2 * self.w

    def flags(self) -> str:
        return (
            f"--w {self.w} --htsz {self.htsz} --window {self.window} "
            f"--n-offsets {self.n_offsets} "
            f"--jobs-per-epoch {self.jobs_per_epoch} "
            f"--n-split {self.n_split} --pipeline {self.pipeline}"
        )

    def report(self) -> str:
        mib = 1 << 20
        build = ("streamed (incremental scatter)"
                 if self.streamed_build else "direct device pack")
        return (
            f"suggested: {self.flags()}\n"
            f"  device: table {self.est_table_bytes / mib:.0f} MiB, "
            f"offsets {self.est_offsets_bytes / mib:.0f} MiB, "
            f"epoch transients {self.est_transient_bytes / mib:.0f} MiB, "
            f"build peak {self.est_build_peak_bytes / mib:.0f} MiB "
            f"[{build}]\n"
            f"  host: ~{self.est_host_bytes / mib:.0f} MiB "
            + ("(rescan positions; --positions mirror would need "
               f"~{(1 << self.htsz) * self.window * 4 / mib:.0f} MiB)\n"
               if self.streamed_build else "(checker CSR)\n")
            + f"  keys per epoch: 2^{self.keys_per_epoch.bit_length() - 1}"
        )


def device_memory_bytes(device=None) -> int:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return 16 * (1 << 30)  # v5e default (memory_stats is None on axon)


def tune(mem_bytes: int | None = None, range_bits: int | None = None,
         window: int = 128) -> TuneResult:
    """Pick the largest safe geometry for the available HBM.

    Strategy mirrors the reference's (grow the table until memory binds,
    then size the batch): w doubles while the steady-state working set —
    dense table + planar offsets + one epoch's transients — fits the scan
    budget; the build path flips to the streamed builder at
    STREAMED_MIN_W so the build-time peak never binds before the scan
    working set does. n_offsets / jobs_per_epoch / n_split / pipeline are
    the measured-optimal epoch shape from the v5e profiles (PROFILE_r03):
    gather-issue-bound probes want n_split independent streams and a
    pipeline >= 3 to hide host drains; larger N only adds HBM pressure.
    """
    if mem_bytes is None:
        mem_bytes = device_memory_bytes()
    budget = mem_bytes - _RESERVE_BYTES

    n_offsets = 1 << 18
    jobs = 8
    offsets_b = 2 * n_offsets * 64
    transient_b = jobs * n_offsets * 168

    w = 1 << 20
    while True:
        w2 = w << 1
        htsz2, window2 = dense_layout(w2, window)
        # streamed rescan tables carry the 2 B/slot uint16 verification
        # hint next to the 4 B/slot dense matrix (make_strided_lookup)
        bps2 = 6 if w2 >= STREAMED_MIN_W else 4
        table_b2 = (1 << htsz2) * window2 * bps2
        build_peak2 = table_b2 + (
            (1 << 24) * 24 * 2 if w2 >= STREAMED_MIN_W else w2 * 24 * 2
        )
        if table_b2 + offsets_b + transient_b > budget:
            break
        if build_peak2 + offsets_b > mem_bytes:
            break
        if w2 > (1 << 32):
            break
        w = w2
    # power-of-two doubling leaves up to 2x of HBM unused at the top:
    # try the 1.5x midpoint before settling (1.5 * 2^30 is the v5e max)
    w15 = w + w // 2
    htsz15, window15 = dense_layout(w15, window)
    t15 = (1 << htsz15) * window15 * (6 if w15 >= STREAMED_MIN_W else 4)
    if (w >= STREAMED_MIN_W and t15 + offsets_b + transient_b <= budget
            and w15 <= (1 << 32)):
        w = w15
    if range_bits is not None:
        # no point making the baby table bigger than sqrt(range)
        w = min(w, 1 << max(10, (range_bits + 1) // 2))

    htsz, window = dense_layout(w, window)
    streamed = w >= STREAMED_MIN_W
    table_b = (1 << htsz) * window * (6 if streamed else 4)
    build_peak = table_b + (
        (1 << 24) * 24 * 2 if streamed else w * 24 * 2
    )
    # streamed builds default to positions="rescan" at the same threshold:
    # no host mirror, host RAM ~0 (the mirror figure is reported for the
    # explicit --positions mirror choice)
    host_b = 0 if streamed else w * 12
    return TuneResult(
        w=w,
        htsz=htsz,
        window=window,
        n_offsets=n_offsets,
        jobs_per_epoch=jobs,
        n_split=8,
        pipeline=3,
        streamed_build=streamed,
        est_table_bytes=table_b,
        est_offsets_bytes=offsets_b,
        est_transient_bytes=transient_b,
        est_build_peak_bytes=build_peak,
        est_host_bytes=host_b,
    )
