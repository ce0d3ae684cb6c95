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


def test_broadcast_byte_guard(spark, emb, graph):
    """r6 ADVICE: the guard must bound estimated BYTES (dimension-
    aware), not just node count — d=768 blows the RAM budget at far
    fewer than 1M nodes."""
    old = graphann.MAX_GRAPH_BROADCAST_BYTES
    graphann.MAX_GRAPH_BROADCAST_BYTES = 1024
    try:
        with pytest.raises(ValueError, match="MAX_GRAPH_BROADCAST_BYTES"):
            graphann.graph_search(
                graph, emb, emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
            )
    finally:
        graphann.MAX_GRAPH_BROADCAST_BYTES = old


@pytest.fixture(scope="module")
def ivf_index(spark, emb):
    from nano_vectordb_spark.operators.ivf import ivf_build

    idx = ivf_build(emb, nlist=8)
    idx.assigned = idx.assigned.persist()
    idx.assigned.count()
    yield idx
    idx.assigned.unpersist()


@pytest.fixture(scope="module")
def shard_graph(spark, ivf_index):
    g = graphann.shard_graph_build(ivf_index, k=8).persist()
    g.count()
    yield g
    g.unpersist()


def test_shard_graph_build_shape(spark, ivf_index, shard_graph):
    # <= k edges per (cluster, src); no self-loops; edges stay in-list
    per_src = shard_graph.groupBy("cluster_id", "src_id").count()
    assert per_src.agg(F.max("count")).first()[0] <= 8
    assert shard_graph.filter("src_id = nbr_id").count() == 0
    a = ivf_index.assigned.select(
        F.col("vec_id").alias("src_id"), F.col("cluster_id").alias("ca")
    )
    b = ivf_index.assigned.select(
        F.col("vec_id").alias("nbr_id"), F.col("cluster_id").alias("cb")
    )
    crossed = (
        shard_graph.join(a, "src_id").join(b, "nbr_id")
        .filter("ca != cb OR ca != cluster_id")
    )
    assert crossed.count() == 0
    # deterministic rebuild
    g2 = graphann.shard_graph_build(ivf_index, k=8)
    assert shard_graph.exceptAll(g2).count() == 0
    assert g2.count() == shard_graph.count()


def test_shard_search_full_probe_equals_exact(spark, emb, ivf_index, shard_graph):
    """nprobe=nlist + coarse/ef >= every list size => every shard node
    seeds the beam and the search is exhaustive: the result must EQUAL
    the exact flat top-k (the same identity IVF search has at full
    probe)."""
    queries = emb.limit(50).select(F.col("vec_id").alias("query_id"), "embedding")
    gt = gt_build(emb, queries, k=10, metric="l2")
    pred = graphann.shard_graph_search(
        ivf_index, shard_graph, queries, k=10, ef=1000, nprobe=8, coarse=1000
    )
    pred_ids = pred.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
            lambda s: s["vec_id"],
        ).alias("pred_ids")
    )
    diff = gt.join(pred_ids, "query_id").filter(
        F.col("gt_ids") != F.col("pred_ids")
    )
    assert diff.count() == 0


def test_shard_search_recall_monotone_in_nprobe(spark, emb, ivf_index, shard_graph):
    queries = emb.limit(50).select(F.col("vec_id").alias("query_id"), "embedding")
    gt = gt_build(emb, queries, k=10, metric="l2")
    recalls = {}
    for nprobe in (2, 4, 8):
        pred = graphann.shard_graph_search(
            ivf_index, shard_graph, queries, k=10, ef=64, nprobe=nprobe
        )
        pred_ids = pred.groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"],
            ).alias("pred_ids")
        )
        recalls[nprobe] = recall_at_k(gt, pred_ids, 10).first()["recall_at_k"]
    assert recalls[2] <= recalls[4] + 1e-9 <= recalls[8] + 2e-9
    assert recalls[8] >= 0.9, recalls


def _pred_ids(pred):
    return pred.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
            lambda s: s["vec_id"],
        ).alias("pred_ids")
    )


def test_adaptive_probe_exhaustive_equals_exact(spark, emb, ivf_index, shard_graph):
    """The r10 adaptive re-probe guarantee: with exhaustive per-shard
    beams and an unbinding nprobe_max, expansion stops only when every
    unprobed list is provably outside the k-th distance (triangle
    bound on ivf_list_radii) — so the output EQUALS the exact flat
    top-k even from nprobe=1, and the stats must show it did NOT
    blindly probe everything for every query."""
    queries = emb.limit(50).select(F.col("vec_id").alias("query_id"), "embedding")
    gt = gt_build(emb, queries, k=10, metric="l2")
    pred, stats = graphann.shard_graph_search_adaptive(
        ivf_index, shard_graph, queries, k=10, ef=1000, nprobe=1,
        nprobe_max=8, n_entry=1000, coarse=1000, return_stats=True,
    )
    diff = gt.join(_pred_ids(pred), "query_id").filter(
        F.col("gt_ids") != F.col("pred_ids")
    )
    assert diff.count() == 0
    assert stats["expanded_queries"] >= 1
    assert all(1 <= v <= 8 for v in stats["probes_used"].values())


def test_adaptive_probe_not_below_static(spark, emb, ivf_index, shard_graph):
    """With a binding nprobe_max the adaptive result is best-effort but
    never below the static-nprobe search: its candidate set is a
    superset and the final exact rank can only improve."""
    queries = emb.limit(50).select(F.col("vec_id").alias("query_id"), "embedding")
    gt = gt_build(emb, queries, k=10, metric="l2")
    static = graphann.shard_graph_search(
        ivf_index, shard_graph, queries, k=10, ef=64, nprobe=1
    )
    adaptive, stats = graphann.shard_graph_search_adaptive(
        ivf_index, shard_graph, queries, k=10, ef=64, nprobe=1,
        nprobe_max=3, return_stats=True,
    )
    r_static = recall_at_k(gt, _pred_ids(static), 10).first()["recall_at_k"]
    r_adapt = recall_at_k(gt, _pred_ids(adaptive), 10).first()["recall_at_k"]
    assert r_adapt >= r_static - 1e-12, (r_adapt, r_static)
    assert all(1 <= v <= 3 for v in stats["probes_used"].values())
    # deterministic across runs (driver-side NumPy bound math is fixed)
    again = graphann.shard_graph_search_adaptive(
        ivf_index, shard_graph, queries, k=10, ef=64, nprobe=1, nprobe_max=3
    )
    key = lambda r: (r.query_id, r.rank)
    assert sorted(adaptive.collect(), key=key) == sorted(again.collect(), key=key)


def test_ivf_list_radii_cover(spark, emb, ivf_index):
    """Radii must COVER: no member farther from its centroid than the
    list radius (the property the triangle bound needs)."""
    import numpy as np

    from nano_vectordb_spark.functions.vector import l2sq_expr
    from nano_vectordb_spark.operators.ivf import ivf_list_radii

    radii = ivf_list_radii(ivf_index)
    assert radii.shape == (ivf_index.nlist,)
    rows = (
        ivf_index.assigned.select("cluster_id", F.col("embedding").alias("__v"))
        .join(F.broadcast(ivf_index.centroids), "cluster_id")
        .select("cluster_id", l2sq_expr("__v", "centroid").alias("d2"))
        .collect()
    )
    for r in rows:
        assert float(r["d2"]) ** 0.5 <= radii[int(r["cluster_id"])] + 1e-12


def test_shard_search_deterministic(spark, emb, ivf_index, shard_graph):
    queries = emb.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
    a = graphann.shard_graph_search(
        ivf_index, shard_graph, queries, k=10, ef=32, nprobe=4
    ).collect()
    b = graphann.shard_graph_search(
        ivf_index, shard_graph, queries, k=10, ef=32, nprobe=4
    ).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(a, key=key) == sorted(b, key=key)


def test_multi_assign_element0_equals_assign_udf(spark, emb, ivf_index):
    """multi_assign_udf's FIRST element must be the single-assignment
    argmin (the de-replication contract in ivf_replicate's docstring):
    assign_udf orders by the reduced -2x.c + |c|^2 expression and
    multi_assign by the full distance — mathematically identical
    orderings; this pins that they agree on the fixture."""
    from nano_vectordb_spark.functions import kmeans as km
    from nano_vectordb_spark.operators.ivf import centroids_matrix

    cent = centroids_matrix(ivf_index)
    both = emb.select(
        "vec_id",
        km.assign_udf(cent)(F.col("embedding")).alias("single"),
        km.multi_assign_udf(cent, 3, 0.25)(F.col("embedding")).alias("multi"),
    )
    bad = both.filter(F.col("single") != F.element_at("multi", 1))
    assert bad.count() == 0
    # every row keeps >= 1 and <= replicas assignments
    sizes = both.select(F.size("multi").alias("s"))
    lo, hi = sizes.agg(F.min("s"), F.max("s")).first()
    assert lo >= 1 and hi <= 3


def test_ivf_replicate_superset_and_guards(spark, emb, ivf_index):
    """Replicated assignment is a strict superset of single assignment
    (argmin always kept), and the single-assignment consumers refuse a
    replicated index loudly."""
    from nano_vectordb_spark.operators.ivf import ivf_add, ivf_replicate, ivf_search

    rep = ivf_replicate(ivf_index, replicas=2, eps=0.3)
    assert rep.replicated
    cols = ["vec_id", "cluster_id"]
    missing = ivf_index.assigned.select(*cols).exceptAll(
        rep.assigned.select(*cols)
    )
    assert missing.count() == 0
    # a boundary fixture this size must actually replicate something
    assert rep.assigned.count() > ivf_index.assigned.count()
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="single-assignment"):
        ivf_search(rep, queries, nprobe=2, k=5)
    with pytest.raises(ValueError, match="single-assignment"):
        ivf_add(rep, emb.limit(1))


def test_shard_search_replicated_full_probe_equals_exact(spark, emb, ivf_index):
    """The full-probe == exact identity must survive replication: with
    every list probed, duplicates are deduped before rescore and the
    result still equals the flat exact top-k, one row per (query,
    rank)."""
    from nano_vectordb_spark.operators.ivf import ivf_replicate

    rep = ivf_replicate(ivf_index, replicas=3, eps=0.3)
    g = graphann.shard_graph_build(rep, k=8)
    queries = emb.limit(30).select(F.col("vec_id").alias("query_id"), "embedding")
    gt = gt_build(emb, queries, k=10, metric="l2")
    pred = graphann.shard_graph_search(
        rep, g, queries, k=10, ef=1000, nprobe=8, coarse=1000
    )
    # no duplicate ids per query, exactly one row per rank
    per_q = pred.groupBy("query_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("vec_id").alias("nd"),
        F.countDistinct("rank").alias("nr"),
    )
    assert per_q.filter("n != 10 OR nd != 10 OR nr != 10").count() == 0
    pred_ids = pred.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
            lambda s: s["vec_id"],
        ).alias("pred_ids")
    )
    diff = gt.join(pred_ids, "query_id").filter(F.col("gt_ids") != F.col("pred_ids"))
    assert diff.count() == 0


def test_replication_eps_for_factor_hits_target(spark, emb, ivf_index):
    """The factor->eps inverse map (operators/ivf.
    replication_eps_for_factor): replicating with the suggested eps
    must land the achieved factor near the target (the sample here is
    the whole fixture, so the estimator's only slack is quantile
    interpolation + the per-vector replica cap)."""
    from nano_vectordb_spark.operators.ivf import (
        ivf_replicate,
        replication_eps_for_factor,
    )

    n = ivf_index.assigned.count()
    for target in (1.5, 2.5):
        eps = replication_eps_for_factor(
            ivf_index, target, replicas=8, sample_rows=n
        )
        assert eps >= 0.0
        rep = ivf_replicate(ivf_index, replicas=8, eps=eps)
        achieved = rep.assigned.count() / n
        assert abs(achieved - target) <= 0.35, (target, eps, achieved)
    # monotone: a bigger target needs a bigger eps
    e1 = replication_eps_for_factor(ivf_index, 1.5, replicas=8, sample_rows=n)
    e2 = replication_eps_for_factor(ivf_index, 3.0, replicas=8, sample_rows=n)
    assert e2 >= e1
    with pytest.raises(ValueError, match="target_factor"):
        replication_eps_for_factor(ivf_index, 9.0, replicas=8)
    with pytest.raises(ValueError, match="target_factor"):
        replication_eps_for_factor(ivf_index, 1.0, replicas=8)


def test_replication_eps_nlist_caps_the_factor(spark, emb, ivf_index):
    """ADVICE r9: when nlist < replicas the achievable factor is capped
    by nlist, so (a) a target above nlist is rejected up front and (b)
    the quantile denominator uses k = min(replicas, nlist) — with
    replicas=16 over nlist=8 lists a target of 2.5 must still land
    near 2.5, not systematically undershoot."""
    from nano_vectordb_spark.operators.ivf import (
        ivf_replicate,
        replication_eps_for_factor,
    )

    n = ivf_index.assigned.count()
    with pytest.raises(ValueError, match="min\\(replicas, nlist\\)"):
        replication_eps_for_factor(ivf_index, 9.0, replicas=16)
    eps = replication_eps_for_factor(
        ivf_index, 2.5, replicas=16, sample_rows=n
    )
    achieved = ivf_replicate(ivf_index, replicas=16, eps=eps).assigned.count() / n
    assert abs(achieved - 2.5) <= 0.35, (eps, achieved)


def test_build_driver_budget_envelope(spark, emb):
    """r9 VERDICT item 3: the RAM-resident build must refuse loudly
    UP FRONT when its estimated driver working set exceeds the budget,
    naming the sharded path — not OOM mid-build. The estimator must
    admit the measured-good 400k x d=64 point and refuse the
    measured-fatal 800k at the default 8 GiB heap."""
    from nano_vectordb_spark.operators import graphann

    heap_8g = 8 << 30
    # measured-good point passes, measured-fatal point refuses
    graphann.check_build_driver_budget(400_000, 64, 16, heap_8g)
    with pytest.raises(ValueError, match="shard_graph_build"):
        graphann.check_build_driver_budget(800_000, 64, 16, heap_8g)
    # end-to-end: a tiny heap makes even the fixture build refuse fast
    with pytest.raises(ValueError, match="driver working set"):
        orig = graphann._driver_heap_bytes
        try:
            graphann._driver_heap_bytes = lambda _s: 1 << 20
            graphann.build_knn_graph(emb, k=16, iters=1)
        finally:
            graphann._driver_heap_bytes = orig
    # heap-string parsing covers the JVM suffix forms
    assert graphann._driver_heap_bytes is orig


def test_driver_heap_parse(spark):
    from nano_vectordb_spark.operators.graphann import _driver_heap_bytes

    class _FakeConf:
        def __init__(self, v):
            self._v = v

        def get(self, _k, _d=None):
            return self._v

    class _FakeSpark:
        def __init__(self, v):
            self.conf = _FakeConf(v)

    assert _driver_heap_bytes(_FakeSpark("8g")) == 8 << 30
    assert _driver_heap_bytes(_FakeSpark("512M")) == 512 << 20
    assert _driver_heap_bytes(_FakeSpark("1024")) == 1024


def test_replication_eps_refuses_replicated_index(spark, emb, ivf_index):
    """ADVICE r9: estimating eps on a replicated index would sample
    duplicate boundary rows and bias the quantile — refuse loudly."""
    from nano_vectordb_spark.operators.ivf import (
        ivf_replicate,
        replication_eps_for_factor,
    )

    rep = ivf_replicate(ivf_index, replicas=3, eps=0.4)
    with pytest.raises(ValueError, match="single-assignment"):
        replication_eps_for_factor(rep, 1.5)


def test_shard_search_replicated_recall_not_below_single(spark, emb, ivf_index, shard_graph):
    """At a fixed LOW nprobe, boundary replication may only help:
    probed lists are supersets of their single-assignment selves, so
    recall(replicated) >= recall(single) query-set-wide (the SPANN
    closure argument, Chen et al. NeurIPS 2021 section 4.1)."""
    from nano_vectordb_spark.operators.ivf import ivf_replicate

    rep = ivf_replicate(ivf_index, replicas=3, eps=0.4)
    g_rep = graphann.shard_graph_build(rep, k=8)
    queries = emb.limit(50).select(F.col("vec_id").alias("query_id"), "embedding")
    gt = gt_build(emb, queries, k=10, metric="l2")

    def recall(index, g, nprobe):
        pred = graphann.shard_graph_search(
            index, g, queries, k=10, ef=256, nprobe=nprobe, coarse=1000
        )
        pred_ids = pred.groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"],
            ).alias("pred_ids")
        )
        return recall_at_k(gt, pred_ids, 10).first()["recall_at_k"]

    r_single = recall(ivf_index, shard_graph, 2)
    r_rep = recall(rep, g_rep, 2)
    assert r_rep >= r_single - 1e-9, (r_single, r_rep)


def test_graph_persist_roundtrip(spark, emb, graph, tmp_path):
    """saveIndex/loadIndex analog: reloaded graph searches identically."""
    path = str(tmp_path / "flat_graph")
    graphann.graph_write(graph, path)
    g2 = graphann.graph_read(spark, path)
    assert g2.exceptAll(graph).count() == 0 and g2.count() == graph.count()
    queries = emb.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    a = graphann.graph_search(graph, emb, queries, k=10, ef=32).collect()
    b = graphann.graph_search(g2, emb, queries, k=10, ef=32).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(a, key=key) == sorted(b, key=key)


def test_shard_graph_persist_roundtrip(spark, ivf_index, shard_graph, tmp_path):
    path = str(tmp_path / "shard_graph")
    graphann.shard_graph_write(shard_graph, path)
    g2 = graphann.shard_graph_read(spark, path)
    assert (
        g2.select("cluster_id", "src_id", "nbr_id")
        .exceptAll(shard_graph.select("cluster_id", "src_id", "nbr_id"))
        .count()
        == 0
    )
    assert g2.count() == shard_graph.count()


def test_shard_graph_add_equals_bulk(spark, emb):
    """addPoint analog: incremental insert + touched-list rebuild must
    EQUAL the bulk build over the union (per-list builds are
    deterministic functions of list content)."""
    from nano_vectordb_spark.operators.ivf import ivf_build

    old = emb.filter("vec_id % 10 != 0")
    new = emb.filter("vec_id % 10 = 0")
    idx = ivf_build(old, nlist=8)
    g_old = graphann.shard_graph_build(idx, k=8)
    idx2, g_inc = graphann.shard_graph_add(idx, g_old, new, k=8)
    from nano_vectordb_spark.operators.ivf import ivf_add

    g_bulk = graphann.shard_graph_build(ivf_add(idx, new), k=8)
    cols = ["cluster_id", "src_id", "nbr_id"]
    assert g_inc.select(*cols).exceptAll(g_bulk.select(*cols)).count() == 0
    assert g_inc.count() == g_bulk.count()


def test_shard_search_partition_prunes_persisted_layouts(spark, emb, tmp_path):
    """On persisted layouts (ivf_write base + shard_graph_write edges)
    the probed-cluster IN filter must reach BOTH scans as
    PartitionFilters — only the probed directories are read, the same
    scan-skip the IVF plan pin guarantees (test_plans.py:62)."""
    from nano_vectordb_spark.operators.ivf import ivf_build, ivf_read, ivf_write
    from tests.test_plans import physical_plan

    idx = ivf_build(emb, nlist=8)
    ivf_write(idx, str(tmp_path / "ivf"))
    g = graphann.shard_graph_build(idx, k=8)
    graphann.shard_graph_write(g, str(tmp_path / "sg"))
    idx2 = ivf_read(spark, str(tmp_path / "ivf"))
    g2 = graphann.shard_graph_read(spark, str(tmp_path / "sg"))
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    pred = graphann.shard_graph_search(idx2, g2, queries, k=5, ef=32, nprobe=2)
    plan = physical_plan(pred, "formatted")
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters: [" in ln]
    pruned = [ln for ln in pf_lines if "cluster_id" in ln and "IN (" in ln]
    # base scan (x2: beam state + exact rescore) and edge scan (x2:
    # both union branches) all carry the IN partition filter
    assert len(pruned) >= 3, plan
    assert pred.count() > 0


def test_graph_ann_recall_entry_vs_oracle(spark, duck):
    """The O31 registry entry (registered in r7, gate window slot 21)
    through the exact driver-gate comparison."""
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.registry_parts.p13_analytics_graph import (
        _SQL_GRAPH_ANN,
        graph_ann_recall,
    )
    from tests.conftest import SF_CORRECT
    from tests.oracle_harness import compare

    assert "graph_ann_recall" in registry.REGISTRY
    assert "graph_ann_recall" in registry.GATE_BASKET_R7
    df = graph_ann_recall(spark, SF_CORRECT)
    ok, msg = compare(df, duck, _SQL_GRAPH_ANN)
    assert ok, msg


def test_graph_ann_sharded_entry_vs_oracle(spark, duck):
    """The sharded-O31 registry entry (registered in r7, gate window
    slot 22) through the exact driver-gate comparison."""
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.registry_parts.p13_analytics_graph import (
        _SQL_GRAPH_ANN_SHARDED,
        graph_ann_sharded,
    )
    from tests.conftest import SF_CORRECT
    from tests.oracle_harness import compare

    assert "graph_ann_sharded" in registry.REGISTRY
    assert "graph_ann_sharded" in registry.GATE_BASKET_R7
    df = graph_ann_sharded(spark, SF_CORRECT)
    ok, msg = compare(df, duck, _SQL_GRAPH_ANN_SHARDED)
    assert ok, msg


def test_entry_selection_auto_scaling():
    """graph_search's coarse layer (the HNSW upper-hierarchy analog)
    scales as ~n/12 clamped [1024, 65536]; gate fixtures land exactly
    on the historical (1024, 4) so recorded results are unchanged
    (r8: fixed 1024 cost 0.776@ef=32 on the adversarial 200k fixture,
    the scaled point gives 0.912 at identical per-query wall)."""

    from nano_vectordb_spark.operators.graphann import graph_entry_params as params

    # gate scales: historical point, byte-identical official rows
    assert params(200) == (1024, 4)
    assert params(2_000) == (1024, 4)
    assert params(12_288) == (1024, 4)
    # scale: ratio region (the r8 grid's winning band at 200k)
    c, e = params(200_000)
    assert 16_000 <= c <= 17_000 and e == 32
    # clamp: bounded per-query work at any n
    assert params(10**9) == (65536, 32)
    # monotone in n
    cs = [params(n)[0] for n in (1_000, 50_000, 500_000, 10**7)]
    assert cs == sorted(cs)


def test_entry_count_follows_effective_coarse():
    """n_entry derives from the EFFECTIVE coarse (ADVICE r8): an
    explicit coarse=1024 must yield n_entry=4 regardless of graph
    size — the documented n_entry = coarse/512 relation — and
    graph_entry_params itself goes through the same helper."""
    from nano_vectordb_spark.operators.graphann import (
        entry_count_for_coarse,
        graph_entry_params,
    )

    assert entry_count_for_coarse(1024) == 4
    assert entry_count_for_coarse(16_384) == 32
    assert entry_count_for_coarse(65_536) == 32  # clamped
    assert entry_count_for_coarse(100) == 4  # clamped low
    for n in (200, 12_288, 200_000, 10**9):
        c, e = graph_entry_params(n)
        assert e == entry_count_for_coarse(c)


def test_default_nprobe_constant_fraction_rule():
    """r11 VERDICT item 7: the capacity rule 'hold nprobe/nlist
    constant as the index scales' is code, not prose. The floor
    reproduces the historical default at every gate-fixture nlist;
    above nlist=512 the derivation holds the 1/64 probed fraction the
    2M/512/np8 = 0.984 reference point pinned (4M/1024 -> np16, the
    measured 0.994 restoration)."""
    from nano_vectordb_spark.operators.graphann import default_nprobe

    for nlist in (8, 16, 64, 256, 512):
        assert default_nprobe(nlist) == 8
    assert default_nprobe(1024) == 16
    assert default_nprobe(2048) == 32
    # fraction is constant above the floor
    assert default_nprobe(4096) / 4096 == default_nprobe(1024) / 1024
