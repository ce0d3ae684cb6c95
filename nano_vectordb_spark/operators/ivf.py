"""IVF (inverted-file) index as a partitioned table.

Reference surface (SURVEY.md §2.1):
  O26 IVF build: k-means train + assign (apps/nvdb_ivf_build.cpp:35-92)
  O28 IVF search with nprobe probing    (apps/nvdb_ivf_eval.cpp:395-413,
                                         478-489)

Spark-first design (SURVEY.md §4): the index IS the physical layout.
  * build: KMeans (pyspark.ml) trained on a bounded sample — the analog
    of FAISS training on the first ntrain rows (ivf_build.cpp:44,63-66);
    assignment adds a cluster_id column; persisting with
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
    (reference O26). ``train_fraction`` bounds the training sample like
    the reference's ntrain cap (ivf_build.cpp:53-56) — at 100 TB you
    train on a sample, never the full table."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featurized = base.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    train = featurized if train_fraction is None else featurized.sample(
        fraction=train_fraction, seed=seed
    )
    # random init matches FAISS's subsampled-init k-means and is ~2x
    # faster than k-means|| at indistinguishable final cost (PERF.md)
    model = KMeans(
        k=nlist,
        seed=seed,
        featuresCol="__features",
        predictionCol="cluster_id",
        initMode="random",
    ).fit(train)
    assigned = model.transform(featurized).drop("__features")
    spark = base.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
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
