"""Graph ANN — the Spark-first form of the reference's HNSW surface
(SURVEY.md §2 O31).

Reference surface:
  apps/nvdb_hnsw_build.cpp:38-51  (hnswlib build, L2Space, M=16,
                                   efConstruction=200)
  apps/nvdb_hnsw_search.cpp:33-57 (efSearch-bounded kNN search)
  apps/nvdb_hnsw_eval.cpp:47-52   (recall@10 vs the exact flat GT)
  Performance.md §5               (recall–latency ladder: recall@10
                                   monotone in efSearch, ~0.98 at
                                   efSearch=64 for M=16/efC=200)

A literal HNSW port would be anti-Spark: hnswlib's build is a strictly
sequential insert loop mutating one shared graph (addPoint in
nvdb_hnsw_build.cpp:44-49), which cannot distribute. The
cluster-native construction with the same CONTRACT — a navigable
neighbor graph whose ef-bounded best-first search drives recall -> 1
as ef grows — is **NN-Descent** (Dong, Moses, Li: "Efficient K-Nearest
Neighbor Graph Construction for Generic Similarity Measures", WWW'11):
start from an arbitrary k-NN guess and repeatedly refine with the
observation that *a neighbor of a neighbor is likely a neighbor*.
Every round is bounded DataFrame work: a degree-capped
neighbor-of-neighbor self-join, one distance computation per NEW
candidate pair, and a per-node top-k — shuffles keyed on the node id,
no global sort, no cartesian. Per-round candidate volume is
<= n * (2k)^2 rows (degree cap), the published NN-Descent cost.

Search mirrors the reference's execution model honestly: hnswlib
search is single-node shared-memory (the whole index is RAM-resident,
nvdb_hnsw_search.cpp:34), so here the finished graph — n*2k int32
neighbors + n*d float32 vectors — is BROADCAST and each Arrow batch
of queries runs classic best-first search in NumPy inside
mapInPandas. A size guard refuses bases past the broadcast budget;
at 100 TB the graph shards by IVF partition (route queries to probed
shards first), which composes with operators/ivf.py.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nano_vectordb_spark.functions.vector import l2sq_expr
from nano_vectordb_spark.operators.globalrank import two_phase_rank

# n=1M at k=16/d=64: 1M*(32*4 + 64*4) ~ 384 MB broadcast — the same
# RAM-resident regime as the reference index (Performance.md §5 reports
# 4.6 GB on-disk at 500K*d=768); past this, shard the graph by IVF list.
MAX_GRAPH_BROADCAST_NODES = 1_000_000


def _init_offsets(k: int, n: int) -> list[int]:
    """k deterministic, distinct ring offsets in [1, n-1] — the
    arbitrary starting graph NN-Descent requires (quality of the init
    only affects rounds-to-converge, not the fixed point it refines
    toward). A multiplicative stride spreads them over the ring."""
    if n <= 1:
        return []
    offs: list[int] = []
    seen = set()
    step = max(1, (n - 1) // (k + 1))
    o = 1
    while len(offs) < min(k, n - 1):
        while o % n == 0 or (o % n) in seen:
            o += 1
        offs.append(o % n)
        seen.add(o % n)
        o += step
    return offs


def _topk_per_node(pairs: DataFrame, k: int) -> DataFrame:
    """Per-node k best neighbors by (dist, nbr) — node-partitioned
    window, deterministic ties."""
    w = Window.partitionBy("idx").orderBy(F.asc("dist"), F.asc("nbr"))
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _degree_cap(edges: DataFrame, cap: int) -> DataFrame:
    w = Window.partitionBy("idx").orderBy(F.asc("dist"), F.asc("nbr"))
    return (
        edges.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def build_knn_graph(
    emb: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed NN-Descent k-NN graph. Returns (src_id, nbr_id,
    dist) with <= k rows per src, dist = exact squared L2 (the
    reference's L2Space), deterministic for a given input.

    ``k`` plays hnswlib's M role (neighbors kept per node), ``iters``
    plays efConstruction's (construction effort -> graph quality).
    """
    spark = emb.sparkSession
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    idxd = (
        two_phase_rank(base, [F.col("id").asc()], rn_name="__rn")
        .select((F.col("__rn") - 1).cast("int").alias("idx"), "id", "vec")
        .persist()
    )
    n = idxd.count()
    vecs_a = idxd.select("idx", F.col("vec").alias("__va"))
    vecs_b = idxd.select(F.col("idx").alias("nbr"), F.col("vec").alias("__vb"))

    def with_dist(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(vecs_a, "idx")
            .join(vecs_b, "nbr")
            .select("idx", "nbr", l2sq_expr("__va", "__vb").alias("dist"))
        )

    offs = _init_offsets(k, n)
    if not offs:
        idxd.unpersist()
        return spark.createDataFrame(
            [], "src_id long, nbr_id long, dist double"
        )
    init = idxd.select("idx").select(
        "idx",
        F.explode(F.array(*[F.lit(o) for o in offs])).alias("__off"),
    ).select("idx", ((F.col("idx") + F.col("__off")) % n).alias("nbr"))
    cur = _topk_per_node(with_dist(init), k).localCheckpoint(eager=False)

    for _ in range(iters):
        # symmetrize + degree-cap: NN-Descent explores out- AND
        # in-neighbors; the cap bounds the self-join to (2k)^2 per node
        u = _degree_cap(
            cur.select("idx", "nbr", "dist").union(
                cur.select(
                    F.col("nbr").alias("idx"),
                    F.col("idx").alias("nbr"),
                    "dist",
                )
            ),
            2 * k,
        ).select("idx", "nbr")
        # neighbor-of-neighbor candidates: two neighbors of the same
        # node are candidate neighbors of EACH OTHER
        cand = (
            u.select(F.col("idx").alias("__pivot"), F.col("nbr").alias("idx"))
            .join(
                u.select(F.col("idx").alias("__pivot"), F.col("nbr").alias("nbr")),
                "__pivot",
            )
            .filter(F.col("idx") != F.col("nbr"))
            .select("idx", "nbr")
            .distinct()
            # only NEW pairs pay a distance computation
            .join(cur.select("idx", "nbr"), ["idx", "nbr"], "left_anti")
        )
        cur = _topk_per_node(
            with_dist(cand).unionByName(cur), k
        ).localCheckpoint(eager=False)

    out = (
        cur.join(idxd.select(F.col("idx"), F.col("id").alias("src_id")), "idx")
        .join(
            idxd.select(F.col("idx").alias("nbr"), F.col("id").alias("nbr_id")),
            "nbr",
        )
        .select("src_id", "nbr_id", "dist")
    )
    out = out.localCheckpoint(eager=True)
    idxd.unpersist()
    return out


def _collect_graph(graph: DataFrame, emb: DataFrame, id_col: str, vec_col: str):
    """Driver-side (adjacency, vectors, ids) arrays ordered by idx —
    the broadcastable RAM-resident index, with the same hard size
    guard discipline as operators/topk.MAX_BROADCAST_QUERIES."""
    import numpy as np

    base = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy("id")
        .collect()
    )
    n = len(base)
    if n > MAX_GRAPH_BROADCAST_NODES:
        raise ValueError(
            f"graph_search broadcasts the whole index; n={n} exceeds "
            f"MAX_GRAPH_BROADCAST_NODES={MAX_GRAPH_BROADCAST_NODES}. "
            "Shard the graph by IVF partition instead (operators/ivf.py)."
        )
    ids = np.array([r["id"] for r in base], dtype=np.int64)
    vecs = np.array([r["vec"] for r in base], dtype=np.float32)
    pos = {int(v): i for i, v in enumerate(ids)}
    # symmetrized adjacency (out + in edges), ragged -> (n, maxdeg)
    adj_rows = (
        graph.select("src_id", "nbr_id")
        .union(
            graph.select(
                F.col("nbr_id").alias("src_id"), F.col("src_id").alias("nbr_id")
            )
        )
        .distinct()
        .groupBy("src_id")
        .agg(F.sort_array(F.collect_set("nbr_id")).alias("nbrs"))
        .collect()
    )
    maxdeg = max((len(r["nbrs"]) for r in adj_rows), default=0)
    adj = np.full((n, maxdeg), -1, dtype=np.int32)
    for r in adj_rows:
        i = pos[int(r["src_id"])]
        row = [pos[int(x)] for x in r["nbrs"]]
        adj[i, : len(row)] = row
    return adj, vecs, ids


def _beam_search(q, adj, vecs, ef: int, k: int, entries) -> list[tuple[float, int]]:
    """hnswlib layer-0 search semantics (searchBaseLayerST): best-first
    expansion with an ef-bounded result heap; stop when the closest
    unexpanded candidate is farther than the worst kept result.
    Deterministic: all orderings tie-break on node index."""
    import numpy as np

    def dist(i: int) -> float:
        d = vecs[i] - q
        return float(np.dot(d, d))

    visited = set()
    cand: list[tuple[float, int]] = []
    res: list[tuple[float, int]] = []  # max-heap via negated key
    for e in entries:
        if e in visited:
            continue
        visited.add(e)
        de = dist(e)
        heapq.heappush(cand, (de, e))
        heapq.heappush(res, (-de, -e))
        if len(res) > ef:
            heapq.heappop(res)
    while cand:
        d, u = heapq.heappop(cand)
        if len(res) >= ef and d > -res[0][0]:
            break
        for v in adj[u]:
            v = int(v)
            if v < 0 or v in visited:
                continue
            visited.add(v)
            dv = dist(v)
            if len(res) < ef or dv < -res[0][0]:
                heapq.heappush(cand, (dv, v))
                heapq.heappush(res, (-dv, -v))
                if len(res) > ef:
                    heapq.heappop(res)
    ordered = sorted((-nd, -ni) for nd, ni in res)
    return ordered[:k]


def graph_search(
    graph: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ef: int = 64,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ef-bounded kNN over the broadcast graph (reference O31 search,
    nvdb_hnsw_search.cpp:33-57). Returns (query_id, rank, vec_id,
    dist) with rank 1..k best-first. ``ef`` is efSearch; ``n_entry``
    deterministic entry points spread over the id ring stand in for
    the HNSW upper layers' zoom-in (a flat k-NN graph has no
    hierarchy, so multiple spread entries restore global reach)."""
    spark = emb.sparkSession
    adj, vecs, ids = _collect_graph(graph, emb, id_col, vec_col)
    n = len(ids)
    entries = sorted({(t * n) // n_entry for t in range(n_entry)} - {n}) or [0]
    b = spark.sparkContext.broadcast((adj, vecs, ids, entries))

    qdf = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        adj_, vecs_, ids_, entries_ = b.value
        for pdf in batches:
            out = {"query_id": [], "rank": [], "vec_id": [], "dist": []}
            for qid, qv in zip(pdf["query_id"], pdf["__qv"]):
                q = np.asarray(qv, dtype=np.float32)
                hits = _beam_search(q, adj_, vecs_, ef, k, entries_)
                for r, (d, i) in enumerate(hits, start=1):
                    out["query_id"].append(qid)
                    out["rank"].append(r)
                    out["vec_id"].append(int(ids_[i]))
                    out["dist"].append(d)
            yield pd.DataFrame(out)

    return qdf.mapInPandas(
        run, "query_id long, rank int, vec_id long, dist double"
    )
