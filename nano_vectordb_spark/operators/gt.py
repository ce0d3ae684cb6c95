"""Ground-truth build and recall@k evaluation.

Reference surface (SURVEY.md §2.1):
  O16 exact k-NN ground-truth build (apps/nvdb_gt_build.cpp:74-124)
  O17 recall@k                      (apps/nvdb_hnsw_eval.cpp:47-52,
                                     apps/nvdb_ivf_eval.cpp:190-219)

The GT table is the engine's self-oracle, exactly as in the reference:
every approximate operator (IVF, PQ, quantized ranking) is judged by
recall against the exact scan's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nano_vectordb_spark.operators.topk import topk_multi


def gt_from_topk(topk_result: DataFrame, k: int) -> DataFrame:
    """Collapse a ranked top-k result (query_id, vec_id, score, rank)
    into the GT shape (query_id, k, gt_ids best-first) — the gtbin
    analog (include/nvdb/gtbin_format.h:8-35)."""
    return (
        topk_result.groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                lambda s: s["vec_id"],
            ).alias("gt_ids")
        )
        .select("query_id", F.lit(k).alias("k"), "gt_ids")
    )


def gt_build(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "dot",
    strategy: str = "two_phase",
) -> DataFrame:
    """Exact k-NN GT (reference O16). Dot ranking is valid L2 GT on
    normalized vectors: L2^2 = 2 - 2*dot (apps/nvdb_gt_build.cpp:27-28)."""
    return gt_from_topk(topk_multi(base, queries, k, metric=metric, strategy=strategy), k)


def recall_at_k(gt: DataFrame, pred: DataFrame, k: int) -> DataFrame:
    """Mean recall@k = avg(|gt_ids[:k] ∩ pred_ids[:k]| / k) over queries
    (reference O17). Inputs: (query_id, gt_ids) and (query_id, pred_ids)."""
    joined = gt.select("query_id", F.slice("gt_ids", 1, k).alias("g")).join(
        pred.select("query_id", F.slice("pred_ids", 1, k).alias("p")), "query_id"
    )
    per_query = joined.select(
        "query_id",
        (F.size(F.array_intersect("g", "p")) / F.lit(float(k))).alias("recall"),
    )
    return per_query.agg(
        F.avg("recall").alias("recall_at_k"), F.count("*").alias("n_queries")
    )
