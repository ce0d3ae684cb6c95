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
