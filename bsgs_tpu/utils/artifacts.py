"""Precomputed-table persistence: build-if-missing artifacts.

Mirrors the reference's artifact scheme (Save_HTpacked / LOAD_HT*packed /
Save_Load_Giants, 1_9_7File.pb:3645-3895, 1905-2058; file name schemas at
:3652 and :1916; README.md:36-42 workflow of generating on one machine and
reusing): tables are cached on disk keyed by their generation parameters
and spot-verified with random oracles on load.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..models import table as tbl
from . import ecpy


def baby_table_path(cache_dir: str, w: int, htsz: int, window: int = 0) -> str:
    # window is not part of the key: the artifact stores the sorted
    # prefixes, from which any window re-derives on load.
    return os.path.join(cache_dir, f"baby_w{w}_h{htsz}_v3.npz")


def _atomic_savez(path: str, **arrays) -> None:
    """Atomic write (temp + rename), like the reference's checkpoint
    discipline (1_9_7File.pb:3897-3931)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_baby_table(table: tbl.BabyTable, path: str) -> None:
    """Persist any table flavor (the reference's Save_HTpacked role,
    1_9_7File.pb:3645-3760):

    - host builds (full 64-bit sorted prefixes): prefix stream + positions;
      any window/CSR re-derives on load.
    - device builds (on-chip CSR, htsz+32-bit keys): offsets + sorted
      (disc, position) streams — the lower 32-htsz prefix bits never
      existed on the host, and the checker verifies hits exactly anyway.
    - streamed big-w builds: the dense bucket matrix + host position
      mirror verbatim (no CSR was ever materialized).
    """
    if table.sorted_pre is not None:
        _atomic_savez(
            path,
            kind="host",
            w=table.w, htsz=table.htsz, window=table.window,
            sorted_pre=table.sorted_pre,
            sorted_pos=table.pos_sorted,
        )
    elif table.pos_dense is not None:
        _atomic_savez(
            path,
            kind="streamed",
            w=table.w, htsz=table.htsz, window=table.window,
            dense=np.asarray(table.dense),
            pos_dense=table.pos_dense,
            offsets=np.asarray(table.offsets),
        )
    elif table.lookup_fn is not None:
        # mirror-less streamed build: positions re-derive by device
        # rescan, narrowed by the pos_lo residue hint when present
        arrays = dict(
            kind="streamed-rescan",
            w=table.w, htsz=table.htsz, window=table.window,
            dense=np.asarray(table.dense),
            offsets=np.asarray(table.offsets),
        )
        if table.pos_lo is not None:
            arrays["pos_lo"] = np.asarray(table.pos_lo)
        _atomic_savez(path, **arrays)
    else:
        _atomic_savez(
            path,
            kind="device",
            w=table.w, htsz=table.htsz, window=table.window,
            offsets=np.asarray(table.offsets),
            disc_sorted=np.asarray(table.disc_sorted),
            pos_sorted=np.asarray(table.pos_sorted),
        )


def load_baby_table(path: str, spot_checks: int = 8,
                    window: int = 0) -> tbl.BabyTable:
    """Load + random-oracle verify (reference checkHTpackFile,
    1_9_7File.pb:3101-3134): random r in [1, w], recompute r*G exactly,
    require the stored prefix to match. ``window`` is the caller's
    requested minimum row width (host/device artifacts re-derive the dense
    matrix on load, so a cache hit must still honor a larger request)."""
    import jax.numpy as jnp
    from . import native

    z = np.load(path)
    htsz = int(z["htsz"])
    kind = str(z["kind"]) if "kind" in z else "host"
    if kind == "host":
        sorted_pre = z["sorted_pre"]
        offsets, disc, maxb = native.csr_pack(sorted_pre, htsz)
        window = tbl.fit_window(maxb, max(window, int(z["window"])))
        table = tbl.BabyTable(
            w=int(z["w"]),
            htsz=htsz,
            window=window,
            offsets=offsets,
            disc_sorted=disc,
            pos_sorted=z["sorted_pos"],
            dense=jnp.asarray(tbl.dense_from_csr(offsets, disc, window)),
            sorted_pre=sorted_pre,
        )
    elif kind in ("streamed", "streamed-rescan"):
        # streamed artifacts store the dense matrix verbatim (the full
        # prefix stream was never materialized), so a wider window cannot
        # be re-derived on load — refuse loudly instead of silently
        # returning a narrower table than the caller's scan expects
        if window > int(z["window"]):
            raise ValueError(
                f"streamed artifact {path} has window={int(z['window'])} "
                f"< requested {window}; rebuild it (--gen-only) at the "
                f"wider window — streamed tables cannot re-derive rows"
            )
        dense = jnp.asarray(z["dense"])
        pos_lo = jnp.asarray(z["pos_lo"]) if "pos_lo" in z else None
        if kind == "streamed-rescan":
            lookup_fn = (
                tbl.make_strided_lookup(int(z["w"]), dense, pos_lo, htsz)
                if pos_lo is not None
                else tbl.make_rescan_lookup(int(z["w"]))
            )
        else:
            lookup_fn = None
        table = tbl.BabyTable(
            w=int(z["w"]),
            htsz=htsz,
            window=int(z["window"]),
            offsets=z["offsets"],
            disc_sorted=None,
            pos_sorted=None,
            dense=dense,
            sorted_pre=None,
            pos_dense=z["pos_dense"] if kind == "streamed" else None,
            pos_lo=pos_lo,
            lookup_fn=lookup_fn,
        )
    else:  # device CSR
        offsets = z["offsets"]
        disc = z["disc_sorted"]
        counts = np.diff(offsets.astype(np.int64))
        window = tbl.fit_window(
            int(counts.max()) if counts.size else 0,
            max(window, int(z["window"])),
        )
        table = tbl.BabyTable(
            w=int(z["w"]),
            htsz=htsz,
            window=window,
            offsets=offsets,
            disc_sorted=disc,
            pos_sorted=z["pos_sorted"],
            dense=jnp.asarray(tbl.dense_from_csr(offsets, disc, window)),
            sorted_pre=None,
        )
    rng = np.random.default_rng(0xB5B5)
    rs = [int(rng.integers(1, table.w + 1))
          for _ in range(min(spot_checks, table.w))]
    batch = getattr(table.lookup_fn, "batch", None)
    if batch is not None:
        # rescan lookups regenerate the whole stream per call: verify all
        # spot prefixes in ONE pass
        pres = {r: ecpy.mul(r)[0] & ((1 << 64) - 1) for r in rs}
        found = batch(list(pres.values()))
        for r in rs:
            if r not in found[pres[r]]:
                raise ValueError(
                    f"baby table artifact corrupt at r={r}: {path}"
                )
        return table
    for r in rs:
        x = ecpy.mul(r)[0]
        if r not in table.lookup_positions(x):
            raise ValueError(f"baby table artifact corrupt at r={r}: {path}")
    return table


def get_baby_table(
    w: int,
    htsz: int,
    window: int = 16,
    cache_dir: str | None = None,
    tile: int = 1 << 14,
) -> tbl.BabyTable:
    """Build-if-missing with on-disk caching."""
    if cache_dir is None:
        return tbl.build_baby_table(w, htsz, window=window, tile=tile)
    path = baby_table_path(cache_dir, w, htsz, window)
    if os.path.exists(path):
        return load_baby_table(path, window=window)
    table = tbl.build_baby_table(w, htsz, window=window, tile=tile)
    save_baby_table(table, path)
    return table
