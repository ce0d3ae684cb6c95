"""Robustness edges: invalid arguments, empty inputs, degenerate rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nano_vectordb_spark.functions import quantize as qz
from nano_vectordb_spark.operators import refine as refine_ops
from nano_vectordb_spark.operators import sample as sample_ops
from nano_vectordb_spark.operators import topk as topk_ops
from tests.conftest import SF_CORRECT


def _emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


def test_invalid_metric_rejected(spark):
    with pytest.raises(ValueError, match="metric"):
        topk_ops.topk(_emb(spark), [0.0] * 64, 5, metric="manhattan")
    with pytest.raises(ValueError, match="strategy"):
        topk_ops.topk_multi(_emb(spark), _emb(spark), 5, strategy="magic")


def test_invalid_sample_mode_rejected(spark):
    with pytest.raises(ValueError, match="mode"):
        sample_ops.sample_queries(_emb(spark), 5, mode="bogus")


def test_dim_mismatch_rejected(spark):
    # the guard is in-plan now (per-row raise_error at execution time —
    # checks EVERY row, costs no plan-build job); see also
    # tests/test_topk.py::test_topk_dim_mismatch_raises_in_plan
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="dim"):
        topk_ops.topk(_emb(spark), [0.0] * 7, 5).collect()


def test_refine_staged_equals_fused(spark):
    q = sample_ops.sample_queries(_emb(spark), 3, seed=1)
    cand = topk_ops.topk_multi(_emb(spark), q, 20).select("query_id", "vec_id")
    fused = refine_ops.refine(_emb(spark), q, cand, 5)
    staged = refine_ops.refine(_emb(spark), q, cand, 5, staged=True)
    assert sorted(map(tuple, fused.collect())) == sorted(map(tuple, staged.collect()))


def test_topk_on_empty_base(spark):
    empty = _emb(spark).filter("vec_id < 0")
    assert topk_ops.topk(empty, [0.0] * 64, 5).count() == 0
    q = sample_ops.sample_queries(_emb(spark), 3, seed=1)
    assert topk_ops.topk_multi(empty, q, 5, strategy="two_phase").count() == 0


def test_refine_with_empty_candidates(spark):
    q = sample_ops.sample_queries(_emb(spark), 3, seed=1)
    cand = spark.createDataFrame([], "query_id long, vec_id long")
    assert refine_ops.refine(_emb(spark), q, cand, 5).count() == 0


def test_quantize_all_zero_row(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
    row = qz.quantize_i8_df(df).first()
    assert row.scale == 0.0
    assert list(row.embedding_i8) == [0, 0, 0]


def test_k_larger_than_base(spark):
    small = _emb(spark).limit(3)
    q = small.select("embedding").first()[0]
    res = topk_ops.topk(small, q, 100)
    assert res.count() == 3  # returns what exists, ranked


def test_norm_of_empty_text_chunks(spark):
    from nano_vectordb_spark.operators import textops

    df = spark.createDataFrame(
        [(0, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert textops.chunk_words(df, 50).count() == 0  # no tokens -> no chunks


def test_register_views_partial_fixture(spark, tmp_path):
    """Partial scale fixtures (e.g. the sf100 decade ships only
    documents+events) register the tables that exist; a directory with
    no tables at all fails loudly (typo'd sf_dir, not a partial
    fixture)."""
    import shutil

    from nano_vectordb_spark.sources import tables as tbl

    part = tmp_path / "partial"
    part.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", part / "documents.parquet"
    )
    tbl.register_views(spark, str(part))
    assert spark.sql("SELECT count(*) FROM documents").first()[0] > 0
    # no tables at all -> loud failure, and the views-state memo must
    # not record the bad dir
    import pytest as _pytest

    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(FileNotFoundError):
        tbl.register_views(spark, str(empty))
    # restore full-fixture views for any later test in this session
    tbl.register_views(spark, "/root/testdata/sf0.01")
