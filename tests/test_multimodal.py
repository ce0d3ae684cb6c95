"""Multimodal plumbing invariants: schema, determinism, stub gating,
frame-sampling bounds."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nano_vectordb_spark.operators import multimodal as mm
from tests.conftest import SF_CORRECT


def _docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(50)


def test_features_schema_and_determinism(spark):
    d = mm.attach_blob(_docs(spark))
    f1 = mm.extract_features(d, dim=16)
    rows = f1.orderBy("doc_id").collect()
    assert f1.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,byte_len:int,features:array<double>>"
    )
    for r in rows:
        assert len(r.features) == 16
        assert abs(math.sqrt(sum(x * x for x in r.features)) - 1.0) < 1e-9
        assert 16 <= r.width < 80 and 16 <= r.height < 80
    rows2 = mm.extract_features(d, dim=16).orderBy("doc_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_byte_len_matches_text(spark):
    d = mm.attach_blob(_docs(spark))
    f = mm.extract_features(d, dim=8)
    joined = f.join(_docs(spark), "doc_id").filter(
        F.col("byte_len") != F.length("text")
    )
    assert joined.count() == 0  # ascii corpus: bytes == chars


def test_real_decoder_is_stubbed(spark):
    d = mm.attach_blob(_docs(spark))
    with pytest.raises(NotImplementedError, match="decoder"):
        mm.extract_features(d, decoder="real")


def test_frame_sample_bounds(spark):
    d = mm.attach_blob(_docs(spark))
    frames = mm.frame_sample(d, n_frames=4)
    assert frames.filter(F.col("frame_id") >= 4).count() == 0
    assert frames.filter(F.length("frame_bytes") == 0).count() == 0
    # every doc produces at least one frame
    assert frames.select("doc_id").distinct().count() == 50


def test_byte_histogram_signature_values(spark):
    from nano_vectordb_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "AAAa"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in mm.byte_histogram_signatures(mm.attach_blob(df)).collect()
    }
    # 'A' = 0x41 (nibble 4) x3, 'a' = 0x61 (nibble 6) x1
    assert out[1]["byte_len"] == 4
    want = [0] * 16
    want[4], want[6] = 3, 1
    assert out[1]["hist"] == want
    assert out[2]["byte_len"] == 0 and out[2]["hist"] == [0] * 16


def test_multimodal_neardup_finds_bucket_boundary_pair(spark, tmp_path):
    """Two near-identical blobs straddling a length-bucket boundary
    (len 63 vs 65) must still pair — the +1-bucket probe's reason to
    exist — and an unrelated doc must not."""
    from nano_vectordb_spark import registry

    a = "x" * 63
    b = "x" * 63 + "yy"          # len 65, L1 = 2 (one extra nibble-7 pair)
    c = "Q" * 200                # different bucket and histogram
    rows = [
        (0, a, "en", "s", len(a)),
        (1, b, "en", "s", len(b)),
        (2, c, "en", "s", len(c)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = [
        (r["doc_id_a"], r["doc_id_b"], r["l1_dist"], r["len_diff"])
        for r in registry.REGISTRY["multimodal_neardup"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    assert out == [(0, 1, 2, 2)]
