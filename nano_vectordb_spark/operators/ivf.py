"""IVF (inverted-file) index as a partitioned table.

Reference surface (SURVEY.md §2.1):
  O26 IVF build: k-means train + assign (apps/nvdb_ivf_build.cpp:35-92)
  O28 IVF search with nprobe probing    (apps/nvdb_ivf_eval.cpp:395-413,
                                         478-489)

Spark-first design (SURVEY.md §4): the index IS the physical layout.
  * build: k-means trained driver-side on a bounded prefix sample — the
    analog of FAISS training on the first ntrain rows
    (ivf_build.cpp:44,63-66); the distributed part is only the
    assignment pass (broadcast-centroid matmul UDF, no shuffle);
    persisting with
    partitionBy("cluster_id") turns nprobe probing into partition
    pruning, the reference's one semantic optimization (SURVEY §4).
  * search: stage 1 scores Q queries against the nlist centroids (both
    tiny — broadcast) and keeps the top-nprobe clusters per query;
    stage 2 scans ONLY those clusters (an IN filter on the partition
    column — at cluster scale Spark reads nprobe/nlist of the data) and
    ranks top-k per query.

At 100 TB with nlist=4096 and nprobe=64, stage 2 touches ~1.6% of the
base bytes — the same data-skip ratio FAISS gets from inverted lists.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nano_vectordb_spark.operators.topk import rank_topk, score_expr


@dataclass
class IvfIndex:
    centroids: DataFrame  # (cluster_id int, centroid array<double>)
    assigned: DataFrame   # base columns + cluster_id
    nlist: int


def ivf_build(
    base: DataFrame,
    nlist: int,
    seed: int = 42,
    train_fraction: float | None = None,
    vec_col: str = "embedding",
) -> IvfIndex:
    """Train k-means centroids and assign every row to its nearest list
    (reference O26). Training happens driver-side on a bounded prefix
    sample — the FAISS ntrain split (ivf_build.cpp:44,53-56); at 100 TB
    only the assignment pass (broadcast matmul, no shuffle) touches the
    full table. ``train_fraction`` optionally thins the prefix further."""
    from nano_vectordb_spark.functions import kmeans as km

    src = base if train_fraction is None else base.sample(
        fraction=train_fraction, seed=seed
    )
    mat = km.collect_train_sample(src, vec_col, km.train_rows_for(nlist))
    cent = km.lloyd_fit(mat, nlist, seed=seed)
    assigned = km.assign_clusters(base, cent, vec_col=vec_col)
    spark = base.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
        "cluster_id int, centroid array<double>",
    )
    return IvfIndex(centroids=centroids, assigned=assigned, nlist=nlist)


def ivf_write(index: IvfIndex, path: str) -> None:
    """Persist the index as its physical layout: base partitioned by
    cluster_id (so probing prunes partitions) + a centroids table."""
    index.assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{path}/base"
    )
    index.centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_read(spark: SparkSession, path: str, nlist: int | None = None) -> IvfIndex:
    centroids = spark.read.parquet(f"{path}/centroids")
    assigned = spark.read.parquet(f"{path}/base")
    if nlist is None:
        nlist = centroids.count()
    return IvfIndex(centroids=centroids, assigned=assigned, nlist=nlist)


def probe_clusters(
    index: IvfIndex,
    queries: DataFrame,
    nprobe: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Stage 1: coarse quantization — top-nprobe nearest centroids per
    query by L2 (FAISS IVF uses METRIC_L2, ivf_build.cpp:58). Returns
    (query_id, cluster_id). Both sides are small: broadcast."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qvec")
    )
    scored = q.crossJoin(F.broadcast(index.centroids)).select(
        "query_id",
        F.col("cluster_id").alias("vec_id"),  # rank_topk contract
        score_expr("l2", "centroid", "__qvec").alias("score"),
    )
    return rank_topk(scored, nprobe, metric="l2").select(
        "query_id", F.col("vec_id").cast("int").alias("cluster_id")
    )


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    k: int,
    nprobe: int,
    metric: str = "dot",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Stage 2: scan only the probed clusters and rank top-k per query
    (reference O28). The join on cluster_id is the IN-filter/partition-
    prune; the probe table is Q x nprobe rows — broadcast."""
    probes = probe_clusters(index, queries, nprobe, query_id_col, query_vec_col)
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qvec")
        )
    )
    pruned = index.assigned.join(
        F.broadcast(probes), "cluster_id"
    )  # keeps only probed (query, cluster) slices
    scored = pruned.join(q, "query_id").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        score_expr(metric, vec_col, "__qvec").alias("score"),
    )
    return rank_topk(scored, k, metric=metric)
