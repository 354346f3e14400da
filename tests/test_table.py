"""Baby-table tests: random-oracle membership checks, mirroring the
reference's checkHT / checkHTpack spot verification (1_9_7File.pb:3599-3627,
:3446) plus exhaustive small-w sweeps."""

import numpy as np
import jax.numpy as jnp
import pytest

from bsgs_tpu.ops import field as F
from bsgs_tpu.models import table as T
from bsgs_tpu.utils import ecpy


def test_compute_prefixes_matches_oracle():
    w = 40
    pre = T.compute_prefixes(w, tile=8)  # force multiple tile extensions
    for i in range(w):
        x = ecpy.mul(i + 1)[0]
        assert int(pre[i]) == x & ((1 << 64) - 1), f"i={i}"


def test_pack_and_probe_members():
    w, htsz = 64, 6
    tab = T.build_baby_table(w, htsz, window=16, tile=16)
    xs = [ecpy.mul(r)[0] for r in range(1, w + 1)]
    xl = jnp.asarray(F.to_limbs_batch(xs))
    found = np.asarray(T.probe_x(xl, tab))
    assert found.all(), "every baby point must probe true"


def test_probe_nonmembers_mostly_absent(rng):
    w, htsz = 64, 6
    tab = T.build_baby_table(w, htsz, window=16, tile=16)
    ks = [int(rng.integers(w + 1, 1 << 60)) for _ in range(64)]
    xs = [ecpy.mul(k)[0] for k in ks]
    xl = jnp.asarray(F.to_limbs_batch(xs))
    found = np.asarray(T.probe_x(xl, tab))
    # matches certify htsz+32 bits; 64 random probes should all miss
    assert not found.any()


def test_lookup_positions():
    w, htsz = 32, 5
    tab = T.build_baby_table(w, htsz, window=16, tile=16)
    for r in [1, 2, 17, 32]:
        x = ecpy.mul(r)[0]
        assert tab.lookup_positions(x) == [r]
    assert tab.lookup_positions(ecpy.mul(w + 5)[0]) == []


def test_bucket_overflow_grows_window():
    # all prefixes land in one bucket, exceeding the requested window;
    # the window auto-grows (in steps of 4) to fit the largest bucket
    pre = np.zeros(40, dtype=np.uint64)
    pre[:] = np.arange(40)  # bucket 0 for htsz bits of zeros
    tab = T.pack_table(pre, htsz=8, window=16)
    assert tab.window == 40
    assert tab.dense.shape[1] == 40


def test_duplicate_prefixes_kept():
    pre = np.array([5, 5, 7], dtype=np.uint64)
    tab = T.pack_table(pre, htsz=4, window=16)
    assert sorted(tab.pos_sorted[:2].tolist()) == [1, 2]


def test_streamed_build_matches_host():
    """The incremental-scatter big-w builder must produce the same CSR
    offsets and per-bucket entry sets as the host pack, across MULTIPLE
    chunk flushes (the cross-chunk rank accumulation is the subtle part)."""
    w, htsz = 256, 6
    ref = T.build_baby_table(w, htsz, window=16, tile=32)
    st = T.build_baby_table_streamed(w, htsz, window=16, tile=32, chunk=64)
    assert st.w == w and st.htsz == htsz
    np.testing.assert_array_equal(st.offsets, ref.offsets)
    dr = np.sort(np.asarray(ref.dense), axis=1)
    ds = np.sort(np.asarray(st.dense)[:, : ref.window], axis=1)
    np.testing.assert_array_equal(ds, dr)
    # beyond-window slots must stay empty
    assert (np.asarray(st.dense)[:, ref.window:] == T.DENSE_FILL).all()


def test_streamed_probe_members_and_nonmembers(rng):
    w, htsz = 256, 6
    st = T.build_baby_table_streamed(w, htsz, window=16, tile=32, chunk=64)
    xs = [ecpy.mul(r)[0] for r in range(1, w + 1)]
    xl = jnp.asarray(F.to_limbs_batch(xs))
    assert np.asarray(T.probe_x(xl, st)).all()
    ks = [int(rng.integers(w + 1, 1 << 60)) for _ in range(64)]
    xl = jnp.asarray(F.to_limbs_batch([ecpy.mul(k)[0] for k in ks]))
    assert not np.asarray(T.probe_x(xl, st)).any()


def test_streamed_pos_dense_lookup():
    """The host position mirror must answer lookup_positions exactly —
    it is what the checker walks in place of a CSR at big w
    (models/table.BabyTable.lookup_positions)."""
    w, htsz = 256, 6
    st = T.build_baby_table_streamed(w, htsz, window=16, tile=32, chunk=64)
    assert st.pos_dense is not None and st.sorted_pre is None
    for r in [1, 2, 63, 64, 65, 200, 256]:
        assert st.lookup_positions(ecpy.mul(r)[0]) == [r]
    assert st.lookup_positions(ecpy.mul(w + 7)[0]) == []


def test_streamed_rescan_lookup():
    """positions='rescan' drops the host mirror; lookup_positions must
    re-derive exact indices by regenerating the prefix stream on device
    (the big-w mode that frees host RAM and the build's host-link
    transfer)."""
    w, htsz = 256, 6
    st = T.build_baby_table_streamed(w, htsz, window=16, tile=32, chunk=64,
                                     positions="rescan")
    assert st.pos_dense is None and st.lookup_fn is not None
    for r in [1, 64, 65, 256]:
        assert st.lookup_positions(ecpy.mul(r)[0]) == [r]
    assert st.lookup_positions(ecpy.mul(w + 7)[0]) == []
    # the probe path (dense matrix) is identical to mirror mode
    mr = T.build_baby_table_streamed(w, htsz, window=16, tile=32, chunk=64,
                                     positions="mirror")
    np.testing.assert_array_equal(np.asarray(st.dense), np.asarray(mr.dense))


def test_streamed_rescan_artifact_roundtrip(tmp_path):
    from bsgs_tpu.utils import artifacts

    st = T.build_baby_table_streamed(64, 5, window=16, tile=16, chunk=32,
                                     positions="rescan")
    path = str(tmp_path / "rescan.npz")
    artifacts.save_baby_table(st, path)
    loaded = artifacts.load_baby_table(path, spot_checks=16)
    assert loaded.lookup_fn is not None
    assert loaded.lookup_positions(ecpy.mul(9)[0]) == [9]


def test_probe_respects_bucket_boundaries(rng):
    # adjacent-bucket entries with equal disc bits must not false-positive
    # via the fixed window overrun: craft prefixes in two adjacent buckets.
    htsz = 4
    # bucket = top 4 bits; disc = next 32 bits
    mk = lambda b, d: np.uint64((b << 60) | (d << 28))
    pre = np.array(sorted([mk(2, 111), mk(3, 222)]), dtype=np.uint64)
    tab = T.pack_table(pre, htsz=htsz, window=8)
    # probe for disc 222 in bucket 2 (only bucket 3 has it)
    hi = jnp.asarray([(2 << 28) | (222 >> 4)], dtype=jnp.uint32)
    lo = jnp.asarray([(222 << 28) & 0xFFFFFFFF], dtype=jnp.uint32)
    found = np.asarray(T.probe(hi, lo, tab.dense, htsz=htsz))
    assert not found[0]


def test_dense512_layout_build_and_probe(rng):
    """The big-w dense layout (lambda~384 on 512-lane rows — 2 KB rows
    measured gather-equal to 512 B on v5e, and lane-dim HBM tiling
    forces window to multiples of 128; PROFILE_r05 §5) at a small-scale
    analog: w/2^htsz = 384 exactly, streamed build, exact probe."""
    w, htsz = 6144, 4  # mean bucket load 384 on a 512-wide row
    st = T.build_baby_table_streamed(w, htsz, window=512, tile=32,
                                     chunk=4096)
    counts = np.diff(np.asarray(st.offsets).astype(np.int64))
    assert counts.mean() == 384.0 and counts.max() <= 512
    xs = [ecpy.mul(r)[0] for r in range(1, 257)]
    xl = jnp.asarray(F.to_limbs_batch(xs))
    assert np.asarray(T.probe_x(xl, st)).all()
    ks = [int(rng.integers(w + 1, 1 << 60)) for _ in range(64)]
    xl = jnp.asarray(F.to_limbs_batch([ecpy.mul(k)[0] for k in ks]))
    assert not np.asarray(T.probe_x(xl, st)).any()


def test_strided_lookup_exact_positions(rng):
    """make_strided_lookup (pos_lo residue hint) must return exactly the
    host build's positions — including r = 256 (residue 0) and r = 1 —
    while regenerating only one mod-256 subsequence per hit
    (PROFILE_r05 §6: the full-stream pass per false positive throttled
    big-w scans 50x)."""
    w, htsz = 512, 5
    st = T.build_baby_table_streamed(w, htsz, window=32, tile=32,
                                     chunk=128, positions="rescan")
    assert st.pos_lo is not None and st.lookup_fn is not None
    host = T.build_baby_table(w, htsz, window=32, tile=64)
    for r in [1, 2, 7, 255, 256, 257, 511, 512]:
        x = ecpy.mul(r)[0]
        assert st.lookup_positions(x) == host.lookup_positions(x) == [r]
    # non-member prefixes return nothing
    for k in [w + 5, w + 999]:
        assert st.lookup_positions(ecpy.mul(k)[0]) == []
    # batch API: one dict, same answers
    pres = {r: ecpy.mul(r)[0] & ((1 << 64) - 1) for r in (3, 256, 500)}
    got = st.lookup_positions_batch(list(pres.values()))
    for r, p in pres.items():
        assert got[p] == [r]


def test_strided_artifact_roundtrip(tmp_path):
    from bsgs_tpu.utils import artifacts

    st = T.build_baby_table_streamed(512, 5, window=32, tile=32,
                                     chunk=128, positions="rescan")
    path = str(tmp_path / "sr.npz")
    artifacts.save_baby_table(st, path)
    loaded = artifacts.load_baby_table(path, spot_checks=16)
    assert loaded.pos_lo is not None
    for r in [1, 256, 512]:
        assert loaded.lookup_positions(ecpy.mul(r)[0]) == [r]


def test_probe_rows_dma_matches_probe_keys(rng):
    """The in-kernel DMA probe (ops/probe_kernel, the round-5 experiment
    that proved the gather floor is hardware — PROFILE_r05 §1) must
    answer exactly like the shipped XLA probe (interpret mode)."""
    from bsgs_tpu.ops.probe_kernel import probe_rows_dma

    htsz, window = 8, 128
    m = 128 * 128
    dense_h = rng.integers(0, 1 << 32, (1 << htsz, window)).astype(
        np.uint32)
    bucket = rng.integers(0, 1 << htsz, m).astype(np.uint32)
    disc = np.where(
        rng.random(m) < 0.5,
        dense_h[bucket, rng.integers(0, window, m)],
        rng.integers(0, 1 << 32, m).astype(np.uint32),
    ).astype(np.uint32)
    dense = jnp.asarray(dense_h)
    want = np.asarray(T.probe_keys(jnp.asarray(bucket), jnp.asarray(disc),
                                   dense))
    got = np.asarray(probe_rows_dma(jnp.asarray(bucket),
                                    jnp.asarray(disc), dense,
                                    group=128, interpret=True))
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0  # planted members actually probed
