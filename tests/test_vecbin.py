"""vecbin/raw12 format roundtrips + the reference's strict header
validation as negative tests (SURVEY.md §5.4)."""

from __future__ import annotations

import numpy as np
import pytest

from nano_vectordb_spark.sources import vecbin as vb


def test_f32_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(20, 8)).astype(np.float32)
    p = str(tmp_path / "a.vecbin")
    vb.write_vecbin(p, mat, vb.DTYPE_F32)
    df = vb.read_vecbin(spark, p)
    rows = df.orderBy("vec_id").collect()
    got = np.asarray([r.embedding for r in rows], dtype=np.float32)
    assert np.array_equal(got, mat)


def test_f16_roundtrip_widens(spark, tmp_path):
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(10, 4)).astype(np.float16)
    p = str(tmp_path / "h.vecbin")
    vb.write_vecbin(p, mat, vb.DTYPE_F16)
    rows = vb.read_vecbin(spark, p).orderBy("vec_id").collect()
    got = np.asarray([r.embedding for r in rows], dtype=np.float32)
    assert np.array_equal(got, mat.astype(np.float32))


def test_i8_roundtrip_with_scales(spark, tmp_path):
    codes = np.array([[1, -127, 5], [0, 3, -2]], dtype=np.int8)
    scales = np.array([0.5, 0.25], dtype=np.float32)
    p = str(tmp_path / "q.vecbin")
    vb.write_vecbin(p, codes, vb.DTYPE_I8, scales)
    rows = vb.read_vecbin(spark, p).orderBy("vec_id").collect()
    assert [list(r.embedding_i8) for r in rows] == codes.tolist()
    assert [r.scale for r in rows] == scales.tolist()


def test_raw12_fallback(spark, tmp_path):
    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "legacy.bin")
    vb.write_raw12(p, mat)
    rows = vb.read_vecbin(spark, p).orderBy("vec_id").collect()
    got = np.asarray([r.embedding for r in rows], dtype=np.float32)
    assert np.array_equal(got, mat)


def test_size_validation(spark, tmp_path):
    mat = np.zeros((4, 4), dtype=np.float32)
    p = str(tmp_path / "bad.vecbin")
    vb.write_vecbin(p, mat, vb.DTYPE_F32)
    with open(p, "ab") as f:
        f.write(b"junk")
    with pytest.raises(ValueError, match="file size"):
        vb.read_vecbin(spark, p)


def test_bad_version(spark, tmp_path):
    mat = np.zeros((2, 2), dtype=np.float32)
    p = str(tmp_path / "v9.vecbin")
    vb.write_vecbin(p, mat, vb.DTYPE_F32)
    data = bytearray(open(p, "rb").read())
    data[8] = 9  # version field
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="version"):
        vb.read_vecbin(spark, p)


def test_gtbin_roundtrip_and_validation(spark, tmp_path):
    gt = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint32)
    p = str(tmp_path / "gt.bin")
    vb.write_gtbin(p, gt, metric=0, dim=8, n_base=100)
    df = vb.read_gtbin(spark, p, expect={"k": 3, "Q": 2, "dim": 8, "N": 100})
    rows = df.orderBy("query_id").collect()
    assert [list(r.gt_ids) for r in rows] == gt.tolist()
    with pytest.raises(ValueError, match="header k"):
        vb.read_gtbin(spark, p, expect={"k": 10})


def test_reference_byte_layout_fixture(spark, tmp_path):
    """A vecbin file hand-built byte-for-byte to the reference's on-disk
    layout (vecbin_format.h:7,17-27: kMagic u64 stored little-endian, so
    the file STARTS with b'1CEVBDVN', then version/dtype/dim/reserved0
    u32s and count u64, zero-padded to 64) must load — and our writer
    must emit the identical header for the same content."""
    import struct

    mat = np.array([[1.5, -2.0], [0.25, 4.0], [3.0, 0.125]], dtype=np.float32)
    header = struct.pack(
        "<QIIIIQ", 0x4E56444256454331, 1, 1, 2, 0, 3
    ).ljust(64, b"\0")
    p = str(tmp_path / "ref_layout.vecbin")
    with open(p, "wb") as f:
        f.write(header + mat.tobytes())
    with open(p, "rb") as f:
        assert f.read(8) == b"1CEVBDVN"  # the true on-disk byte order
    rows = vb.read_vecbin(spark, p).orderBy("vec_id").collect()
    got = np.asarray([r.embedding for r in rows], dtype=np.float32)
    assert np.array_equal(got, mat)
    # writer emits the same bytes the reference would accept
    p2 = str(tmp_path / "ours.vecbin")
    vb.write_vecbin(p2, mat, vb.DTYPE_F32)
    assert open(p2, "rb").read() == open(p, "rb").read()


def test_gtbin_reference_byte_layout(spark, tmp_path):
    """Same for gtbin (gtbin_format.h:8,18-28): kGtMagic little-endian
    on-disk prefix is b'10TGBDVN'."""
    import struct

    ids = np.array([[7, 8], [9, 10]], dtype=np.uint32)
    header = struct.pack(
        "<QIIIIQQ", 0x4E56444247543031, 1, 1, 2, 4, 2, 50
    ).ljust(64, b"\0")
    p = str(tmp_path / "ref.gtbin")
    with open(p, "wb") as f:
        f.write(header + ids.tobytes())
    with open(p, "rb") as f:
        assert f.read(8) == b"10TGBDVN"
    rows = vb.read_gtbin(spark, p, expect={"k": 2, "Q": 2, "dim": 4, "N": 50})
    assert [list(r.gt_ids) for r in rows.orderBy("query_id").collect()] == ids.tolist()
    p2 = str(tmp_path / "ours.gtbin")
    vb.write_gtbin(p2, ids, metric=1, dim=4, n_base=50)
    assert open(p2, "rb").read() == open(p, "rb").read()


def test_export_then_read_matches_parquet(spark, tmp_path):
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    p = str(tmp_path / "exp.vecbin")
    vb.export_vecbin(emb, p, vb.DTYPE_F32)
    back = vb.read_vecbin(spark, p)
    a = [list(r.embedding) for r in emb.orderBy("vec_id").collect()]
    b = [list(r.embedding) for r in back.orderBy("vec_id").collect()]
    assert a == b


def test_export_f16_rne_roundtrip(spark, tmp_path):
    """F16 export (tools/nvdb_convert_f16.cpp:183-196 layout): every
    payload value is the RNE half rounding of the source — identical to
    functions/quantize.f16_round_local — and the artifact reloads."""
    from tests.conftest import SF_SMOKE

    from nano_vectordb_spark.functions.quantize import f16_round_local

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    p = str(tmp_path / "exp16.vecbin")
    vb.export_vecbin(emb, p, vb.DTYPE_F16)
    with open(p, "rb") as f:
        head = f.read(64)
    assert head[:8] == vb.MAGIC
    dtype = int.from_bytes(head[12:16], "little")
    assert dtype == vb.DTYPE_F16
    back = vb.read_vecbin(spark, p)
    src = [list(r.embedding) for r in emb.orderBy("vec_id").collect()]
    got = [list(r.embedding) for r in back.orderBy("vec_id").collect()]
    want = [f16_round_local(v) for v in src]
    assert got == want


def test_export_over_cap_raises(spark, tmp_path, monkeypatch):
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    monkeypatch.setattr(vb, "MAX_EXPORT_ROWS", 10)
    with pytest.raises(ValueError, match="at most 10 rows"):
        vb.export_vecbin(emb, str(tmp_path / "big.vecbin"), vb.DTYPE_F32)
