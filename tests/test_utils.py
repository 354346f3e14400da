"""Codecs, artifacts, checkpoint, tuner tests."""

import os

import numpy as np
import pytest

from bsgs_tpu.utils import artifacts, checkpoint as ckpt, codecs, ecpy, tuner
from bsgs_tpu.models import table as tbl


def test_pubkey_roundtrip():
    pt = ecpy.mul(123456789)
    for compressed in (True, False):
        s = codecs.format_pubkey(pt, compressed)
        assert codecs.parse_pubkey(s) == pt


def test_pubkey_forms():
    pt = ecpy.mul(42)
    x, y = pt
    raw = f"{x:064x}{y:064x}"
    assert codecs.parse_pubkey(raw) == pt
    assert codecs.parse_pubkey("04" + raw) == pt
    with pytest.raises(codecs.PubkeyError):
        codecs.parse_pubkey("02" + "00" * 32)  # x=0 not on curve
    with pytest.raises(codecs.PubkeyError):
        codecs.parse_pubkey("zz")
    with pytest.raises(codecs.PubkeyError):
        codecs.parse_pubkey("04" + raw[:100])


def test_parse_w():
    assert codecs.parse_w("10") == 1024
    assert codecs.parse_w("10.5") == int(round(2 ** 10.5))
    assert codecs.parse_w("1000000") == 1000000


def test_parse_scalar():
    assert codecs.parse_scalar("ff") == 255
    assert codecs.parse_scalar("0xFF") == 255


def test_artifact_roundtrip(tmp_path):
    table = tbl.build_baby_table(64, 5, window=16, tile=16)
    path = str(tmp_path / "t.npz")
    artifacts.save_baby_table(table, path)
    loaded = artifacts.load_baby_table(path)
    assert loaded.w == table.w
    np.testing.assert_array_equal(loaded.sorted_pre, table.sorted_pre)
    np.testing.assert_array_equal(
        np.asarray(loaded.dense), np.asarray(table.dense)
    )


def test_artifact_roundtrip_device_kind(tmp_path):
    """Device-built tables (no host prefix stream) persist their CSR and
    round-trip with spot verification (round-3 item 7: --gen-only on TPU
    must produce a reusable artifact)."""
    table = tbl.build_baby_table_device(64, 5, window=16, tile=1 << 11)
    assert table.sorted_pre is None
    path = str(tmp_path / "dev.npz")
    artifacts.save_baby_table(table, path)
    loaded = artifacts.load_baby_table(path, spot_checks=32)
    assert loaded.w == 64 and loaded.htsz == 5
    np.testing.assert_array_equal(
        np.asarray(loaded.offsets), np.asarray(table.offsets)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.dense)[:, :16], np.asarray(table.dense)[:, :16]
    )
    for r in [1, 7, 64]:
        assert r in loaded.lookup_positions(ecpy.mul(r)[0])


def test_artifact_roundtrip_streamed_kind(tmp_path):
    table = tbl.build_baby_table_streamed(64, 5, window=16, tile=16,
                                          chunk=32)
    assert table.pos_dense is not None
    path = str(tmp_path / "st.npz")
    artifacts.save_baby_table(table, path)
    loaded = artifacts.load_baby_table(path, spot_checks=32)
    np.testing.assert_array_equal(
        np.asarray(loaded.dense), np.asarray(table.dense)
    )
    np.testing.assert_array_equal(loaded.pos_dense, table.pos_dense)
    for r in [1, 7, 64]:
        assert loaded.lookup_positions(ecpy.mul(r)[0]) == [r]


def test_table_stats():
    table = tbl.build_baby_table(64, 5, window=16, tile=16)
    st = tbl.table_stats(table)
    assert st.entries == 64
    assert st.buckets == 32
    assert st.max_bucket >= 2  # 64 keys over 32 buckets
    assert st.dup_pairs == 0
    assert "64 entries" in str(st)
    # streamed build: no sorted disc stream -> dup count is n/a
    st2 = tbl.table_stats(
        tbl.build_baby_table_streamed(64, 5, window=16, tile=16, chunk=32)
    )
    assert st2.dup_pairs is None and st2.entries == 64


def test_tuner_full_flagset():
    t = tuner.tune(mem_bytes=16 << 30)
    f = t.flags()
    for flag in ["--w", "--htsz", "--window", "--n-offsets",
                 "--jobs-per-epoch", "--n-split", "--pipeline"]:
        assert flag in f
    assert t.streamed_build == (t.w >= tuner.STREAMED_MIN_W)
    assert t.est_build_peak_bytes + t.est_offsets_bytes <= 16 << 30
    assert "host" in t.report()


def test_make_mesh_device_ids():
    from bsgs_tpu.parallel import mesh as pmesh

    m = pmesh.make_mesh(device_ids=[3, 1])
    assert m.devices.size == 2
    assert m.devices.flatten()[0].id == 3
    assert m.devices.flatten()[1].id == 1


def test_artifact_corruption_detected(tmp_path):
    table = tbl.build_baby_table(64, 5, window=16, tile=16)
    table.sorted_pre[3] ^= np.uint64(0xDEAD)  # corrupt an entry
    path = str(tmp_path / "bad.npz")
    artifacts.save_baby_table(table, path)
    with pytest.raises(ValueError, match="corrupt"):
        artifacts.load_baby_table(path, spot_checks=64)


def test_get_baby_table_cache(tmp_path):
    t1 = artifacts.get_baby_table(32, 4, cache_dir=str(tmp_path), tile=16)
    assert os.path.exists(artifacts.baby_table_path(str(tmp_path), 32, 4, 16))
    t2 = artifacts.get_baby_table(32, 4, cache_dir=str(tmp_path), tile=16)
    np.testing.assert_array_equal(t1.sorted_pre, t2.sorted_pre)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "cw.json")
    fp = ckpt.config_fingerprint(w=1024, htsz=8, pk=1, pke=100)
    w = ckpt.CheckpointWriter(path, fp, interval_s=0.0)
    assert w.maybe_write(0, "02abc", 7, 12345)
    ck = ckpt.Checkpoint.load(path, fp)
    assert ck.next_epoch == 7 and ck.giant_steps == 12345

    with pytest.raises(ValueError, match="fingerprint"):
        ckpt.Checkpoint.load(
            path, ckpt.config_fingerprint(w=2048, htsz=8, pk=1, pke=100)
        )


def test_checkpoint_rate_limit(tmp_path):
    path = str(tmp_path / "cw.json")
    w = ckpt.CheckpointWriter(path, "fp", interval_s=9999.0)
    assert w.maybe_write(0, "x", 1, 1)
    assert not w.maybe_write(0, "x", 2, 2)
    assert w.maybe_write(0, "x", 3, 3, force=True)


def test_tuner_fits_memory():
    for mem in [8 << 30, 16 << 30, 32 << 30]:
        t = tuner.tune(mem_bytes=mem)
        total = t.est_table_bytes + t.est_offsets_bytes + t.est_transient_bytes
        assert total < mem
        assert t.w >= 1 << 20
        assert 4 <= t.htsz <= 28


def test_tuner_range_cap():
    t = tuner.tune(mem_bytes=16 << 30, range_bits=30)
    assert t.w <= 1 << 16


def test_artifact_streamed_window_refuses(tmp_path):
    """Streamed artifacts cannot re-derive a wider dense row on load —
    the request must fail loudly, not silently return a narrower table
    (round-4 item 9)."""
    table = tbl.build_baby_table_streamed(64, 5, window=16, tile=16,
                                          chunk=32)
    path = str(tmp_path / "st.npz")
    artifacts.save_baby_table(table, path)
    with pytest.raises(ValueError, match="window"):
        artifacts.load_baby_table(path, window=32)
    # equal or smaller requests still load fine
    assert artifacts.load_baby_table(path, window=16).window == 16


def test_cli_tune_consumes_range(capsys):
    """--tune with --pk/--pke must size w against the actual range
    (round-4 item 8): a 2^34 range caps w near 2^17, far below the HBM
    limit the range-less tune suggests."""
    from bsgs_tpu import cli

    assert cli.main(["--tune", "--pk", "1", "--pke", "3ffffffff"]) == 0
    ranged = capsys.readouterr().out
    assert "--w 131072 " in ranged
    assert cli.main(["--tune"]) == 0
    unranged = capsys.readouterr().out
    w_unranged = int(unranged.split("--w ")[1].split()[0])
    assert w_unranged >= 1 << 26


def test_cli_rate_exponent():
    """A true ~2^57.3 keys/s rate must print ~2^57, not 2^58 (round-4
    item 8: the reference's display is the comparison anchor)."""
    from bsgs_tpu import cli

    w = 1 << 30
    rate = (2 ** 57.3) / (2 * w)  # giant-steps/s giving 2^57.3 keys/s
    assert cli.rate_exponent(rate, w) == 57
    assert cli.rate_exponent(2 ** 56 / (2 * w), w) == 56
    assert cli.rate_exponent(0.0, w) == 0


def test_native_pack_matches_numpy(rng):
    from bsgs_tpu.utils import native

    pre = rng.integers(0, 1 << 63, size=2000, dtype=np.int64).astype(np.uint64)
    pre[10] = pre[20]  # duplicates must survive
    sp, pos = native.sort_prefixes(pre)
    assert (np.diff(sp.astype(np.uint64)) >= 0).all() if len(sp) else True
    # permutation check: sorted values match numpy
    np.testing.assert_array_equal(sp, np.sort(pre))
    # positions are a permutation of 1..n and map back to the values
    assert sorted(pos.tolist()) == list(range(1, 2001))
    np.testing.assert_array_equal(pre[pos - 1], sp)

    off, disc, maxb = native.csr_pack(sp, 8)
    # fallback path for comparison
    buckets = (sp >> np.uint64(64 - 8)).astype(np.int64)
    counts = np.bincount(buckets, minlength=1 << 8)
    assert maxb == counts.max()
    np.testing.assert_array_equal(np.diff(off.astype(np.int64)), counts)
    np.testing.assert_array_equal(
        disc, ((sp << np.uint64(8)) >> np.uint64(32)).astype(np.uint32)
    )


def test_native_lib_builds():
    from bsgs_tpu.utils import native

    # the toolchain is part of the environment; the native path must load
    assert native.available()


def test_tuner_big_w_layout():
    """16 GiB suggests w=2^30 on 128-lane rows — measured keys/s optimum
    (PROFILE_r05 §5: wider rows carry more keys per slot but their
    compare cost eats the gain) — with the 6 B/slot hint accounting
    (4 B dense + 2 B uint16 verification hint)."""
    t = tuner.tune(mem_bytes=16 << 30)
    assert t.w == 1 << 30
    assert (t.htsz, t.window) == (24, 128)
    assert t.streamed_build
    assert t.est_table_bytes == (1 << 24) * 128 * 6
    # twice the HBM doubles w
    t32 = tuner.tune(mem_bytes=32 << 30)
    assert t32.w == 1 << 31
