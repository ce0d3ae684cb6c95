"""Quantization codec invariants (SURVEY.md §5c) + f16 parity vs NumPy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nano_vectordb_spark.functions import quantize as qz
from tests.conftest import SF_CORRECT


def _emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


def test_i8_roundtrip_bound(spark):
    enc = qz.quantize_i8_df(_emb(spark))
    err = enc.select(
        F.array_max(
            F.zip_with(
                qz.i8_dequant_expr("embedding_i8", "scale"),
                F.col("embedding").cast("array<double>"),
                lambda a, b: F.abs(a - b),
            )
        ).alias("max_err"),
        F.col("scale"),
    )
    bad = err.filter(F.col("max_err") > F.col("scale") * 0.5000001).count()
    assert bad == 0


def test_i8_matches_numpy(spark):
    rows = qz.quantize_i8_df(_emb(spark)).select("vec_id", "embedding", "scale", "embedding_i8").orderBy("vec_id").limit(50).collect()
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        scale = np.abs(x).max() / 127.0
        assert abs(scale - r.scale) < 1e-12
        if scale == 0:
            codes = np.zeros_like(x, dtype=np.int8)
        else:
            # np.rint is round-half-to-even, same as lrint in the reference
            codes = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
        assert codes.tolist() == list(r.embedding_i8), r.vec_id


def test_f16_roundtrip_matches_numpy(spark):
    rows = (
        _emb(spark)
        .withColumn("f16", qz.f16_round_expr("embedding"))
        .select("vec_id", "embedding", "f16")
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    for r in rows:
        expect = np.asarray(r.embedding, dtype=np.float32).astype(np.float16).astype(np.float32)
        assert expect.tolist() == list(r.f16)


def test_f16_idempotent(spark):
    df = _emb(spark).withColumn("f16", qz.f16_round_expr("embedding"))
    df2 = df.withColumn("f16b", qz.f16_round_expr("f16"))
    n_diff = df2.filter(F.col("f16") != F.col("f16b")).count()
    assert n_diff == 0
