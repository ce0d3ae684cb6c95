"""Strategy equivalence: the declarative window plan and the two-phase
partial/final plan must return identical (query_id, vec_id, rank) sets
for every metric — the reference's ST-vs-OMP/async/pool determinism
check (SURVEY.md §5.5) mapped to our two physical strategies."""

from __future__ import annotations

import pytest

from nano_vectordb_spark.operators import sample as sample_ops
from nano_vectordb_spark.operators import topk as topk_ops
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def base(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, base):
    return sample_ops.sample_queries(base, 10, seed=7)


@pytest.mark.parametrize("metric", ["dot", "l2", "cosine"])
def test_strategies_agree(base, queries, metric):
    a = topk_ops.topk_multi(base, queries, 10, metric=metric, strategy="window")
    b = topk_ops.topk_multi(base, queries, 10, metric=metric, strategy="two_phase")
    ka = sorted((r.query_id, r.rank, r.vec_id) for r in a.collect())
    kb = sorted((r.query_id, r.rank, r.vec_id) for r in b.collect())
    assert ka == kb


def test_single_query_matches_multi(base, queries):
    qrow = queries.first()
    single = topk_ops.topk(base, qrow.embedding, 10)
    multi = topk_ops.topk_multi(
        base, queries.filter(queries.query_id == qrow.query_id), 10
    )
    assert [r.vec_id for r in single.collect()] == [
        r.vec_id for r in multi.orderBy("rank").collect()
    ]


def test_empty_queries(base, queries):
    empty = queries.filter("query_id < 0")
    out = topk_ops.topk_multi(base, empty, 10, strategy="two_phase")
    assert out.count() == 0


def test_two_phase_tiebreak_on_duplicate_vectors(spark):
    """>k rows tying at the boundary score inside ONE Arrow batch: the
    partial selection must keep the (score desc, vec_id asc) winners,
    not an arbitrary argpartition subset. 40 identical vectors in a
    single partition force exactly that case."""
    rows = [(i, [1.0, 0.0]) for i in range(40)] + [
        (100 + i, [0.5, 0.5]) for i in range(5)
    ]
    base = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    got = topk_ops.topk_multi(base, queries, 10, strategy="two_phase")
    # all 40 duplicates tie at score 1.0; vec_id asc must win
    assert [r.vec_id for r in got.orderBy("rank").collect()] == list(range(10))


def test_two_phase_query_cap(base, queries):
    import pytest as _pytest

    from nano_vectordb_spark.operators.topk import MAX_BROADCAST_QUERIES

    assert MAX_BROADCAST_QUERIES == 10_000
    big = base.sparkSession.range(MAX_BROADCAST_QUERIES + 5).selectExpr(
        "id as query_id", "array(1.0, 2.0) as embedding"
    )
    with _pytest.raises(ValueError, match="at most"):
        topk_ops.topk_multi(base, big, 10, strategy="two_phase")


def test_topk_dim_mismatch_raises_in_plan(spark):
    """The dim guard is in-plan (per-row raise_error): a mismatched
    query errors at execution, naming both dims — and costs no extra
    driver job at plan-build time."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from nano_vectordb_spark.operators import topk as topk_ops
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    bad = topk_ops.topk(emb, [1.0, 2.0, 3.0], 5)  # fixture dim != 3
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="query dim 3"):
        bad.collect()
