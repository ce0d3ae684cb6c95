"""IVF-PQ composite: coarse quantizer + residual product quantization.

Reference surface (SURVEY.md §2.1 O27/O28/O29/O32 composed —
apps/nvdb_ivfpq_build.cpp + apps/nvdb_ivf_eval.cpp): FAISS IndexIVFPQ
assigns each vector to a coarse list and PQ-encodes its RESIDUAL
(vector - centroid); search probes nprobe lists, scores codes against
per-(query, cluster) ADC lookup tables, and optionally exact-refines.

Spark shape:
  * the codes table carries (vec_id, cluster_id, codes) and is
    partitioned by cluster_id at rest — probing prunes partitions
    exactly as in operators/ivf.py;
  * ADC LUTs are tiny (Q x nprobe x M x 2^nbits doubles) and broadcast;
  * scoring = a codegen'd fold of byte-indexed lookups, keyed by the
    (query_id, cluster_id) join — no Python in the scan.

Metric: L2 on residuals (the FAISS METRIC_L2 contract): score of row r
in list c for query q  ≈ sum_m ||q_res_m - codebook_m[code_m]||^2 with
q_res = q - centroid_c. Ranking ascending. Refine then reranks by dot
(the GT metric on normalized vectors, gt_build.cpp:27-28).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from nano_vectordb_spark.operators.ivf import IvfIndex, ivf_build, probe_ids_np
from nano_vectordb_spark.operators.refine import refine
from nano_vectordb_spark.operators.topk import rank_topk


@dataclass
class IvfPqIndex:
    ivf: IvfIndex
    codebooks: np.ndarray      # (M, K, dsub) float64, trained on residuals
    codes: DataFrame           # (vec_id, cluster_id, codes array<tinyint>)
    centroids_np: np.ndarray   # (nlist, D) float64
    m: int
    nbits: int
    dim: int


def ivfpq_build(
    base: DataFrame,
    nlist: int = 16,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfPqIndex:
    """Coarse k-means, then M subspace codebooks fit on residuals —
    both driver-side on the bounded training prefix (FAISS ntrain
    split); only the encode pass (one Arrow-batched UDF, no shuffle)
    touches the full table."""
    from nano_vectordb_spark.functions import kmeans as km

    dim = len(base.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if not 1 <= nbits <= 8:
        raise ValueError(f"nbits must be in 1..8 (byte codes), got {nbits}")
    dsub = dim // m
    k = 2**nbits

    ivf = ivf_build(base, nlist=nlist, seed=seed, vec_col=vec_col)
    centroids_np = np.asarray(
        [r.centroid for r in ivf.centroids.orderBy("cluster_id").collect()],
        dtype=np.float64,
    )
    # training residuals computed in NumPy from the same prefix sample
    mat = km.collect_train_sample(base, vec_col, km.train_rows_for(k))
    d2 = (
        (mat * mat).sum(axis=1)[:, None]
        - 2.0 * (mat @ centroids_np.T)
        + (centroids_np * centroids_np).sum(axis=1)[None, :]
    )
    resid = mat - centroids_np[d2.argmin(axis=1)]
    books = [
        km.lloyd_fit(resid[:, mi * dsub : (mi + 1) * dsub], k, seed=seed + 1000 + mi)
        for mi in range(m)
    ]
    codebooks = np.stack(books)
    codes = ivf.assigned.select(
        F.col(id_col).alias("vec_id"),
        "cluster_id",
        km.encode_udf(codebooks, centroids=centroids_np)(
            F.col(vec_col), F.col("cluster_id")
        ).alias("codes"),
    )
    return IvfPqIndex(
        ivf=ivf,
        codebooks=codebooks,
        codes=codes,
        centroids_np=centroids_np,
        m=m,
        nbits=nbits,
        dim=dim,
    )


def ivfpq_search(
    index: IvfPqIndex,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
) -> DataFrame:
    """Probe nprobe lists, ADC-score residual codes (L2), top-k per
    query, ascending."""
    spark = index.codes.sparkSession
    # stage-1 probing runs driver-side (queries and centroids are both
    # tiny and already here) — no Spark job; bit-exact vs probe_clusters
    qrows = queries.select("query_id", "embedding").collect()
    qmat = np.asarray([r.embedding for r in qrows], dtype=np.float64)
    probe_rows = [
        Row(query_id=int(qrows[j].query_id), cluster_id=int(c))
        for j, probed in enumerate(probe_ids_np(index.centroids_np, qmat, nprobe))
        for c in probed
    ]
    qmap = {
        int(r.query_id): np.asarray(r.embedding, dtype=np.float64) for r in qrows
    }
    dsub = index.dim // index.m
    lut_rows = []
    for r in probe_rows:
        qr = qmap[r.query_id] - index.centroids_np[r.cluster_id]
        lut = []
        for mi in range(index.m):
            qs = qr[mi * dsub : (mi + 1) * dsub]
            diff = index.codebooks[mi] - qs[None, :]
            lut.append((diff * diff).sum(axis=1).tolist())
        lut_rows.append((int(r.query_id), int(r.cluster_id), lut))
    lut_df = F.broadcast(
        spark.createDataFrame(
            lut_rows, "query_id long, cluster_id int, lut array<array<double>>"
        )
    )
    # the join on cluster_id IS the pruning: only probed lists are scanned
    joined = index.codes.join(lut_df, "cluster_id")
    # pmod unwraps signed-byte codes for nbits=8 (see operators/pq.py)
    score = F.aggregate(
        F.transform(
            "codes",
            lambda c, i: F.element_at(
                F.element_at("lut", i + 1), F.pmod(c.cast("int"), F.lit(256)) + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.select("query_id", "vec_id", score.alias("score"))
    return rank_topk(scored, k, metric="l2")


def ivfpq_search_refined(
    index: IvfPqIndex,
    base: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    refine_k: int = 50,
) -> DataFrame:
    """The reference's staged pipeline (O32): IVF-PQ candidates ->
    exact dot rerank (valid L2 ranking on normalized vectors)."""
    cand = ivfpq_search(index, queries, refine_k, nprobe=nprobe)
    return refine(base, queries, cand, k, metric="dot")


def ivfpq_write(index: IvfPqIndex, path: str) -> None:
    """Persist the composite index: residual codes partitioned by
    cluster_id (probing prunes partitions exactly like operators/ivf),
    coarse centroids, and the subspace codebooks sidecar."""
    from nano_vectordb_spark.operators.pq import PqIndex, pq_write

    index.codes.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{path}/codes"
    )
    index.ivf.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    pq_write(
        PqIndex(
            codebooks=index.codebooks,
            codes=index.codes.sparkSession.createDataFrame(
                [], "vec_id long, codes array<tinyint>"
            ),
            m=index.m,
            nbits=index.nbits,
            dim=index.dim,
        ),
        f"{path}/pq",
    )


def ivfpq_read(spark, path: str) -> IvfPqIndex:
    from nano_vectordb_spark.operators.pq import pq_read

    pq = pq_read(spark, f"{path}/pq")
    centroids = spark.read.parquet(f"{path}/centroids")
    centroids_np = np.asarray(
        [r.centroid for r in centroids.orderBy("cluster_id").collect()],
        dtype=np.float64,
    )
    codes = spark.read.parquet(f"{path}/codes")
    ivf = IvfIndex(centroids=centroids, assigned=codes, nlist=len(centroids_np))
    return IvfPqIndex(
        ivf=ivf,
        codebooks=pq.codebooks,
        codes=codes,
        centroids_np=centroids_np,
        m=pq.m,
        nbits=pq.nbits,
        dim=pq.dim,
    )
