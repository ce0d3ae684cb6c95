"""Graph ANN (operators/graphann.py) — the Spark-first O31 surface.

Mirrors the reference's own evaluation (apps/nvdb_hnsw_eval.cpp +
Performance.md §5): recall@10 against the exact flat-scan ground
truth, monotone in the ef search budget, reaching the reference's
operating band at moderate ef."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nano_vectordb_spark.operators import graphann
from nano_vectordb_spark.operators.gt import gt_build, recall_at_k
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def graph(spark, emb):
    g = graphann.build_knn_graph(emb, k=16, iters=3).persist()
    g.count()
    yield g
    g.unpersist()


def test_build_shape_and_determinism(spark, emb, graph):
    n = emb.count()
    per_src = graph.groupBy("src_id").count()
    assert per_src.count() == n  # every node has neighbors
    assert per_src.agg(F.max("count")).first()[0] <= 16
    assert graph.filter("src_id = nbr_id").count() == 0
    # deterministic: an independent rebuild yields the identical edge set
    g2 = graphann.build_knn_graph(emb, k=16, iters=3)
    sym_diff = graph.select("src_id", "nbr_id").exceptAll(
        g2.select("src_id", "nbr_id")
    )
    assert sym_diff.count() == 0
    assert g2.count() == graph.count()


def test_graph_edges_are_exact_l2(spark, emb, graph):
    """Edge distances must be the exact squared L2 of the endpoints
    (the build never carries a stale/approximate distance)."""
    from nano_vectordb_spark.functions.vector import l2sq_expr

    a = emb.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("vb"))
    bad = (
        graph.join(a, "src_id")
        .join(b, "nbr_id")
        .withColumn("true_d", l2sq_expr("va", "vb"))
        .filter(F.abs(F.col("dist") - F.col("true_d")) > 1e-12)
    )
    assert bad.count() == 0


def test_recall_ladder_monotone_to_reference_band(spark, emb, graph):
    """Recall@10 vs exact GT: monotone in ef, and >= 0.95 at ef=64 —
    the reference's Performance.md §5 band (0.9796 at efSearch=64 for
    M=16/efC=200 at 500K; at our 500-vector module scale the graph is
    denser relative to n, so the band is reachable with iters=3)."""
    queries = emb.limit(100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    gt = gt_build(
        emb,
        queries.select("query_id", "embedding"),
        k=10,
        metric="l2",
    )
    recalls = {}
    for ef in (8, 16, 64):
        pred = graphann.graph_search(graph, emb, queries, k=10, ef=ef)
        pred_ids = pred.groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"],
            ).alias("pred_ids")
        )
        recalls[ef] = recall_at_k(gt, pred_ids, 10).first()["recall_at_k"]
    assert recalls[8] <= recalls[16] + 1e-9 <= recalls[64] + 2e-9
    assert recalls[64] >= 0.95, recalls


def test_search_is_deterministic(spark, emb, graph):
    queries = emb.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
    a = graphann.graph_search(graph, emb, queries, k=10, ef=32).collect()
    b = graphann.graph_search(graph, emb, queries, k=10, ef=32).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(a, key=key) == sorted(b, key=key)


def test_broadcast_guard(spark, emb, graph):
    old = graphann.MAX_GRAPH_BROADCAST_NODES
    graphann.MAX_GRAPH_BROADCAST_NODES = 10
    try:
        with pytest.raises(ValueError, match="MAX_GRAPH_BROADCAST_NODES"):
            graphann.graph_search(
                graph, emb, emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
            )
    finally:
        graphann.MAX_GRAPH_BROADCAST_NODES = old


def test_graph_ann_recall_entry_vs_oracle(spark, duck):
    """The r8-queued O31 registry entry through the exact driver-gate
    comparison (registration waits for the growth freeze)."""
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.registry_parts.p13_analytics_graph import (
        _SQL_GRAPH_ANN,
        graph_ann_recall,
    )
    from tests.conftest import SF_CORRECT
    from tests.oracle_harness import compare

    assert "graph_ann_recall" not in registry.REGISTRY
    df = graph_ann_recall(spark, SF_CORRECT)
    ok, msg = compare(df, duck, _SQL_GRAPH_ANN)
    assert ok, msg
