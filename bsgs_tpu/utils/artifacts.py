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


def save_baby_table(table: tbl.BabyTable, path: str) -> None:
    """Atomic write (temp + rename), like the reference's checkpoint
    discipline (1_9_7File.pb:3897-3931). Only the sorted host arrays are
    persisted; the device dense matrix is re-derived on load."""
    if table.sorted_pre is None:
        raise ValueError(
            "device-built tables are not persisted: on-device regeneration "
            "is faster than any transfer (models/table."
            "build_baby_table_device)"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                w=table.w,
                htsz=table.htsz,
                window=table.window,
                sorted_pre=table.sorted_pre,
                sorted_pos=table.pos_sorted,
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_baby_table(path: str, spot_checks: int = 8,
                    window: int = 0) -> tbl.BabyTable:
    """Load + random-oracle verify (reference checkHTpackFile,
    1_9_7File.pb:3101-3134): random r in [1, w], recompute r*G exactly,
    require the stored prefix to match. ``window`` is the caller's
    requested minimum row width (the dense matrix re-derives on load, so a
    cache hit must still honor a larger request)."""
    import jax.numpy as jnp
    from . import native

    z = np.load(path)
    htsz = int(z["htsz"])
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
    rng = np.random.default_rng(0xB5B5)
    for _ in range(min(spot_checks, table.w)):
        r = int(rng.integers(1, table.w + 1))
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
