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


def test_export_then_read_matches_parquet(spark, tmp_path):
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    p = str(tmp_path / "exp.vecbin")
    vb.export_vecbin(emb, p, vb.DTYPE_F32)
    back = vb.read_vecbin(spark, p)
    a = [list(r.embedding) for r in emb.orderBy("vec_id").collect()]
    b = [list(r.embedding) for r in back.orderBy("vec_id").collect()]
    assert a == b
