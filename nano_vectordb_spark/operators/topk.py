"""Exact top-k nearest-neighbor search (the reference's flagship path).

Reference surface covered (SURVEY.md §2.1):
  O9  single-query full-scan top-k      (src/flat_index.cpp:16-48)
  O10-O12 partial/final parallel top-k  (src/flat_index_omp.cpp:16-85,
          flat_index_async.cpp:10-55, flat_index_pool.cpp:29-215)
  O13 TopKBuffer partial-agg buffer     (include/nvdb/topK.h:15-69)
  O14 batched multi-query scan          (apps/nvdb_bench.cpp:47-159)

Two physical strategies behind one logical contract:

* ``window``  — declarative: cross-join broadcast queries, score with a
  codegen'd expression, rank with a window. Catalyst output; used as the
  semantic definition and the oracle-checked path.
* ``two_phase`` — the scale path, mirroring the reference's per-thread
  heap + merge (O10-O12): ``mapInPandas`` computes a local top-k per
  query per partition with one NumPy matmul per Arrow batch (the analog
  of the reference's batched SIMD tile loop, apps/nvdb_bench.cpp:87-121),
  then a final window over the tiny Q x partitions x k remainder merges
  partials. The Q x N intermediate never shuffles; only Q x P x k rows
  cross the exchange. On a 1000-executor cluster the matmul runs where
  the base partitions live and the merge input stays kilobytes per query.

Scores are double precision. Tie-break is always (score desc, vec_id asc)
so results are deterministic across strategies and match the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nano_vectordb_spark.functions.vector import cosine_expr, dot_expr, l2sq_expr

METRICS = ("dot", "l2", "cosine")

# the reference's query-batch contract (apps/nvdb_gt_build.cpp:50-53)
MAX_BROADCAST_QUERIES = 10_000


def score_expr(metric: str, a, b) -> Column:
    """Score dispatch (reference O8, include/nvdb/score_dispatch.h:13-48):
    pick the scoring expression at plan-build time."""
    if metric == "dot":
        return dot_expr(a, b)
    if metric == "l2":
        return l2sq_expr(a, b)
    if metric == "cosine":
        return cosine_expr(a, b)
    raise ValueError(f"metric must be one of {METRICS}, got {metric!r}")


def _ordering(metric: str) -> list[Column]:
    # dot/cosine: higher is better; l2: lower is better.
    lead = F.col("score").asc() if metric == "l2" else F.col("score").desc()
    return [lead, F.col("vec_id").asc()]


def rank_topk(scored: DataFrame, k: int, metric: str = "dot") -> DataFrame:
    """Rank a pre-scored (query_id, vec_id, score, ...) relation and keep
    the best k per query. Lets any scoring space (f32, i8+scale, f16,
    PQ/ADC) share one ranking definition — the reference's TopKBuffer
    contract (O13)."""
    return (
        scored.withColumn("rank", F.row_number().over(_rank_window(metric)))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def check_dim(base: DataFrame, dim: int, vec_col: str = "embedding") -> None:
    """Dimension-compatibility check (reference apps/nvdb_bench.cpp:
    288-292). Without it a mismatched query silently null-pads through
    zip_with and produces null scores."""
    row = base.select(F.size(vec_col)).first()
    if row is not None and row[0] != dim:
        raise ValueError(f"query dim {dim} != base dim {row[0]}")


def topk(
    base: DataFrame,
    query_vec: Sequence[float],
    k: int,
    metric: str = "dot",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate: bool = True,
) -> DataFrame:
    """Single-query exact top-k (reference O9, src/flat_index.cpp:16-48).

    Physical shape: scan -> codegen'd score -> TakeOrderedAndProject,
    which is exactly the reference's per-partition heap + global merge —
    Spark plans the partial top-k per partition automatically.

    Validation is IN-PLAN (reference apps/nvdb_bench.cpp:288-292): a
    per-row size guard that raise_error()s on the first mismatched
    vector. Stronger than the old first-row probe (every row is
    checked, matching the reference's per-row bounds checks) and free
    of the extra driver job the probe cost on every plan build.
    """
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    score = score_expr(metric, vec_col, q)
    if validate:
        dim = len(query_vec)
        score = F.when(F.size(vec_col) == dim, score).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"query dim {dim} != base dim "),
                    F.size(vec_col).cast("string"),
                )
            )
        )
    scored = base.select(
        F.col(id_col).alias("vec_id"),
        score.alias("score"),
    )
    return scored.orderBy(*_ordering(metric)).limit(k)


def topk_multi(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "dot",
    strategy: str = "two_phase",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Batched multi-query exact top-k (reference O14).

    Returns (query_id, vec_id, score, rank) with rank in [1, k].
    """
    if strategy == "window":
        return _topk_multi_window(
            base, queries, k, metric, id_col, vec_col, query_id_col, query_vec_col
        )
    if strategy == "two_phase":
        return _topk_multi_two_phase(
            base, queries, k, metric, id_col, vec_col, query_id_col, query_vec_col
        )
    raise ValueError(f"strategy must be 'window' or 'two_phase', got {strategy!r}")


def _rank_window(metric: str):
    return Window.partitionBy("query_id").orderBy(*_ordering(metric))


def _topk_multi_window(
    base, queries, k, metric, id_col, vec_col, query_id_col, query_vec_col
) -> DataFrame:
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qvec"),
        )
    )
    scored = base.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        score_expr(metric, vec_col, "__qvec").alias("score"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(_rank_window(metric)))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def _topk_multi_two_phase(
    base, queries, k, metric, id_col, vec_col, query_id_col, query_vec_col
) -> DataFrame:
    # Queries are small by contract (reference: Q <= 10000, always f32,
    # apps/nvdb_gt_build.cpp:50-53); ship them to every task like the
    # reference shares the query batch across threads. The limit+check
    # guards the driver: a mis-call with a huge "queries" side fails
    # fast instead of OOMing the collect.
    qrows = queries.select(query_id_col, query_vec_col).limit(
        MAX_BROADCAST_QUERIES + 1
    ).collect()
    if len(qrows) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"two_phase broadcasts the query batch to every task and supports "
            f"at most {MAX_BROADCAST_QUERIES} queries (the reference's Q "
            f"contract); got more. Split the query set or use a join-based plan."
        )
    if not qrows:
        spark = base.sparkSession
        return spark.createDataFrame([], "query_id long, vec_id long, score double, rank int")
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)  # (Q, D)
    largest = metric != "l2"
    spark = base.sparkSession
    sc = spark.sparkContext
    b_qids = sc.broadcast(qids)
    b_qmat = sc.broadcast(qmat)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = b_qids.value, b_qmat.value
        nq = qm.shape[0]
        qnorm = np.linalg.norm(qm, axis=1) if metric == "cosine" else None
        cand_ids: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []  # each (n_cand, Q)
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            vals = pdf["embedding"].to_numpy()
            try:  # fixed dim per table (format invariant): flat concat+reshape
                bm = np.concatenate(vals).reshape(len(vals), -1).astype(np.float64)
            except ValueError:  # ragged safety net
                bm = np.array(list(vals), dtype=np.float64)
            if metric == "dot":
                s = bm @ qm.T
            elif metric == "cosine":
                s = (bm @ qm.T) / (
                    np.linalg.norm(bm, axis=1)[:, None] * qnorm[None, :]
                )
            else:  # l2: |b|^2 - 2 b.q + |q|^2
                s = (
                    (bm * bm).sum(axis=1)[:, None]
                    - 2.0 * (bm @ qm.T)
                    + (qm * qm).sum(axis=1)[None, :]
                )
            n = s.shape[0]
            if n > k:  # per-batch partial top-k (the TopKBuffer analog)
                bkey = -s if largest else s
                part = np.argpartition(bkey, k - 1, axis=0)[:k]
                # tie-aware boundary repair: argpartition picks arbitrary
                # rows among boundary-score ties, which could drop the
                # (score, vec_id asc) winner before the merge ever sees
                # it. Where a non-selected row ties the per-query
                # boundary, redo that column with a full lexsort.
                sel_key = np.take_along_axis(bkey, part, axis=0)
                boundary = sel_key.max(axis=0)
                ties_all = (bkey == boundary[None, :]).sum(axis=0)
                ties_sel = (sel_key == boundary[None, :]).sum(axis=0)
                for j in np.flatnonzero(ties_all > ties_sel):
                    part[:, j] = np.lexsort((ids, bkey[:, j]))[:k]
                cand_ids.append(ids[part])  # (k, Q)
                cand_scores.append(np.take_along_axis(s, part, axis=0))
            else:
                cand_ids.append(np.broadcast_to(ids[:, None], (n, nq)).copy())
                cand_scores.append(s)
        if not cand_ids:
            return
        all_ids = np.concatenate(cand_ids, axis=0)  # (C, Q)
        all_s = np.concatenate(cand_scores, axis=0)
        kk = min(k, all_s.shape[0])
        # deterministic per-partition winner set: sort by (score, vec_id)
        key = (-all_s) if largest else all_s
        order = np.lexsort((all_ids, key), axis=0)[:kk]  # (kk, Q)
        out_q = np.repeat(qi, kk)
        out_ids = np.take_along_axis(all_ids, order, axis=0).T.reshape(-1)
        out_s = np.take_along_axis(all_s, order, axis=0).T.reshape(-1)
        yield pd.DataFrame({"query_id": out_q, "vec_id": out_ids, "score": out_s})

    partials = base.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).mapInPandas(local_topk, "query_id long, vec_id long, score double")
    return (
        partials.withColumn("rank", F.row_number().over(_rank_window(metric)))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def exact_rescore(
    base: DataFrame,
    queries: DataFrame,
    result: DataFrame,
    metric: str = "dot",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Recompute scores of a (query_id, vec_id) candidate set with the
    exact sequential-fold expression and re-rank.

    Used to make the two-phase path's output bit-identical to the
    declarative definition: NumPy's matmul reduces in a different order
    than the sequential fold, so partial-phase scores can differ in the
    last ulp. The candidate set is tiny (Q x k), so this is a broadcast
    join + expression — same role as the reference's exact-refine rerank
    (apps/nvdb_ivf_eval.cpp:278-307).
    """
    cand = F.broadcast(result.select("query_id", "vec_id"))
    joined = (
        cand.join(
            base.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__bvec")),
            "vec_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col).alias("query_id"),
                    F.col(query_vec_col).alias("__qvec"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "vec_id",
            score_expr(metric, "__bvec", "__qvec").alias("score"),
        )
    )
    return joined.withColumn(
        "rank", F.row_number().over(_rank_window(metric))
    ).select("query_id", "vec_id", "score", "rank")
