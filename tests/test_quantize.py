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


def test_dot_expr_fixed_bitwise_equals_fold(spark):
    """The unrolled known-dim dot (functions/vector.dot_expr_fixed)
    must be BIT-identical to the sequential fold (dot_expr): same
    initial 0.0, same index-order rounding sequence — on real fixture
    vectors (all pairs of the first 40) and on adversarial values
    (denormals, huge/tiny mixes, exact cancellations, negative
    zeros)."""
    from nano_vectordb_spark.functions.vector import dot_expr, dot_expr_fixed

    emb = _emb(spark).orderBy("vec_id").limit(40)
    dim = len(emb.select("embedding").first()[0])
    a = emb.select(F.col("vec_id").alias("ai"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("bi"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).select(
        dot_expr("va", "vb").alias("fold"),
        dot_expr_fixed("va", "vb", dim).alias("unrolled"),
    ).collect()
    import struct

    # bitwise via the IEEE754 byte pattern so -0.0 vs 0.0 or a 1-ulp
    # slip cannot hide behind == semantics
    for r in pairs:
        assert struct.pack("<d", r.fold) == struct.pack("<d", r.unrolled)
    adversarial = [
        ([1e308, 1.0, -1e308, 1.0], [1.0, 1e-300, 1.0, 1e-300]),
        ([5e-324, 5e-324, -5e-324, 0.0], [1.0, 1.0, 1.0, -1.0]),
        ([0.1, 0.2, 0.3, -0.6], [1.0, 1.0, 1.0, 1.0]),
        ([-0.0, 0.0, -0.0, 0.0], [1.0, -1.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(
        [(x, y) for x, y in adversarial], "va array<double>, vb array<double>"
    )
    rows = df.select(
        dot_expr("va", "vb").alias("fold"),
        dot_expr_fixed("va", "vb", 4).alias("unrolled"),
    ).collect()
    for r in rows:
        assert struct.pack("<d", r.fold) == struct.pack("<d", r.unrolled), r
