"""Product quantization (PQ) with asymmetric-distance (ADC) scoring.

Reference surface (SURVEY.md §2.1):
  O27 IVF-PQ / OPQ-PQ build (apps/nvdb_ivfpq_build.cpp:40-96 — M
      subquantizers x 2^bits codebooks; D % M == 0 enforced at :53-56;
      OPQ rotation optional, identity here per SURVEY §7 phase 5)
  O28-adjacent: ADC search — scan codes, score against a per-query
      lookup table, top-k; refine composes via operators/refine.py.

Spark-first shape:
  * build: M independent KMeans fits on column slices — each a bounded
    sample fit like the IVF coarse quantizer; codebooks are tiny
    (M x 2^bits x dsub doubles) and broadcast.
  * encode: M nearest-centroid assignments produce codes
    array<tinyint> — 8 bytes/row for M=8 vs 256 bytes of f32 at D=64,
    the same ~32x scan-byte cut the reference gets (41 MB index for
    500K x 384-D, Performance.md:619-625).
  * search: the per-query LUT (M x 2^bits partial dots) is computed
    once, shipped as a broadcast map, and the scan reduces each row to
    M byte-indexed lookups — a codegen'd fold, no Python per row.

Parity is recall-level, not centroid-level (FAISS k-means != Spark ML
k-means numerically, SURVEY §7): the tests assert the reference's
ladder shape — recall(PQ) < recall(PQ+refine), refine closes the gap.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nano_vectordb_spark.operators.refine import refine
from nano_vectordb_spark.operators.topk import rank_topk


@dataclass
class PqIndex:
    codebooks: np.ndarray  # (M, K, dsub) float64
    codes: DataFrame       # (vec_id, codes array<tinyint>)
    m: int
    nbits: int
    dim: int
    rotation: np.ndarray | None = None  # (D, D) orthonormal, None = identity


def pca_rotation(base: DataFrame, vec_col: str = "embedding", sample_rows: int = 10_000) -> np.ndarray:
    """PCA-based rotation for OPQ (reference wraps PQ in an OPQMatrix
    pretransform, apps/nvdb_ivfpq_build.cpp:78-91; SURVEY §7 phase 5
    sanctions PCA as the first-fidelity rotation before full OPQ
    iteration). Computed driver-side from a bounded sample — at 100 TB
    a D x D covariance never needs more than a sample. The sample is
    the ``sample_rows`` SMALLEST vec_ids (TakeOrdered), not a bare
    limit(): a partition-order prefix follows Spark's size-descending
    file packing and is not reproducible outside Spark on multi-file
    layouts (found by the r6 sf1 ANN oracle re-fit sweep)."""
    if "vec_id" in base.columns:
        rows = (
            base.select("vec_id", vec_col)
            .orderBy("vec_id")
            .limit(sample_rows)
            .collect()
        )
        mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    else:
        rows = base.select(vec_col).limit(sample_rows).collect()
        mat = np.asarray([r[0] for r in rows], dtype=np.float64)
    cov = np.cov(mat, rowvar=False)
    # eigh returns ascending; descending variance order balances
    # information across the M subspaces after rotation
    w, v = np.linalg.eigh(cov)
    return v[:, ::-1]  # columns = principal directions


def opq_learn_rotation(
    mat: np.ndarray,
    m: int,
    nbits: int,
    n_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Learned OPQ rotation — the non-parametric alternating
    optimization FAISS's OPQMatrix runs (the reference trains it in
    apps/nvdb_ivfpq_build.cpp:78-91; algorithm: Ge et al., "Optimized
    Product Quantization", CVPR 2013, OPQ-NP):

      repeat: (1) fix R, fit subspace codebooks on X R and quantize to
      Y; (2) fix Y, solve the orthogonal Procrustes problem
      min_R ||X R - Y||_F  =>  R = U V^T from SVD(X^T Y).

    Driver-side on the bounded training sample (a D x D rotation never
    needs the full table), deterministic per seed, PCA-initialized so
    iteration starts from the reference's own first-fidelity rotation.
    Returns a (D, D) orthonormal rotation to pass to pq_build."""
    from nano_vectordb_spark.functions import kmeans as km

    mat = np.ascontiguousarray(mat, dtype=np.float64)
    n, dim = mat.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    k = 2**nbits
    cov = np.cov(mat, rowvar=False)
    _w, v = np.linalg.eigh(cov)
    rot = v[:, ::-1]
    for _ in range(max(1, n_iter)):
        xr = mat @ rot
        recon = np.empty_like(xr)
        for mi in range(m):
            xs = xr[:, mi * dsub : (mi + 1) * dsub]
            book = km.lloyd_fit(xs, min(k, n), seed=seed + mi, n_init=1, max_iter=10)
            d2 = (
                (xs * xs).sum(axis=1)[:, None]
                - 2.0 * (xs @ book.T)
                + (book * book).sum(axis=1)[None, :]
            )
            recon[:, mi * dsub : (mi + 1) * dsub] = book[d2.argmin(axis=1)]
        u, _s, vt = np.linalg.svd(mat.T @ recon)
        rot = u @ vt
    return rot


def pq_build(
    base: DataFrame,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> PqIndex:
    """Train M subspace codebooks and encode the base table.

    D % M == 0 is enforced exactly like the reference
    (apps/nvdb_ivfpq_build.cpp:53-56). With ``rotation`` (see
    pca_rotation) this is the OPQ-PQ variant: vectors are rotated
    before subspace splitting, queries are rotated at LUT build.
    """
    from nano_vectordb_spark.functions import kmeans as km

    dim = len(base.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} (reference check)")
    if not 1 <= nbits <= 8:
        raise ValueError(f"nbits must be in 1..8 (byte codes), got {nbits}")
    dsub = dim // m
    k = 2**nbits

    # all M subspace codebooks train from ONE bounded prefix collect
    # (the FAISS ntrain split); rotation is applied in NumPy both here
    # and inside the encode UDF so train and encode see the same space
    mat = km.collect_train_sample(base, vec_col, km.train_rows_for(k))
    if rotation is not None:
        mat = mat @ rotation
    books = [
        km.lloyd_fit(mat[:, mi * dsub : (mi + 1) * dsub], k, seed=seed + mi)
        for mi in range(m)
    ]
    codebooks = np.stack(books)
    codes = base.select(
        F.col(id_col).alias("vec_id"),
        km.encode_udf(codebooks, rotation=rotation)(F.col(vec_col)).alias("codes"),
    )
    return PqIndex(
        codebooks=codebooks, codes=codes, m=m, nbits=nbits, dim=dim,
        rotation=rotation,
    )


def _query_luts(index: PqIndex, queries: DataFrame, metric: str) -> list[tuple[int, list[list[float]]]]:
    """Per-query M x K lookup tables, driver-side (queries are small by
    contract). dot: partial dot per subspace; l2: partial squared
    distance per subspace."""
    qrows = queries.select("query_id", "embedding").collect()
    dsub = index.dim // index.m
    out = []
    for r in qrows:
        q = np.asarray(r.embedding, dtype=np.float64)
        if index.rotation is not None:
            q = index.rotation.T @ q
        lut = []
        for mi in range(index.m):
            qs = q[mi * dsub : (mi + 1) * dsub]
            # sequential left-to-right accumulation, NOT a BLAS matvec:
            # the DuckDB oracle recomputes these entries with its own
            # sequential list folds, and bit-parity of the ADC scores
            # requires the identical summation order (the LUT is tiny —
            # M x K x dsub driver-side multiplies)
            if metric == "dot":
                lut.append(
                    [
                        _seq_dot(row, qs)
                        for row in index.codebooks[mi]
                    ]
                )
            else:
                lut.append(
                    [
                        _seq_l2(row, qs)
                        for row in index.codebooks[mi]
                    ]
                )
        out.append((int(r.query_id), lut))
    return out


def _seq_dot(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _seq_l2(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        s += d * d
    return s


def pq_adc_search(
    index: PqIndex,
    queries: DataFrame,
    k: int,
    metric: str = "dot",
) -> DataFrame:
    """ADC scan: score = sum_m LUT[m][code_m], ranked top-k per query.
    The LUT table is a broadcast join (Q x M x 2^nbits doubles); the
    fold over codes is a native expression in codegen."""
    spark = index.codes.sparkSession
    luts = _query_luts(index, queries, metric)
    lut_df = F.broadcast(
        spark.createDataFrame(
            luts, "query_id long, lut array<array<double>>"
        )
    )
    joined = index.codes.crossJoin(lut_df)
    # codes are stored as signed bytes; pmod unwraps the nbits=8 case
    # where codes 128..255 arrive as negatives (K=256, the reference's
    # default PQ_BITS=8)
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
    return rank_topk(scored, k, metric=metric)


def pq_search_refined(
    index: PqIndex,
    base: DataFrame,
    queries: DataFrame,
    k: int,
    refine_k: int,
    metric: str = "dot",
) -> DataFrame:
    """Staged PQ + exact refine (reference O27+O29 composition,
    apps/nvdb_ivf_eval.cpp:603-634): ADC top-refine_k candidates, then
    full-precision rerank to top-k."""
    cand = pq_adc_search(index, queries, refine_k, metric=metric)
    return refine(base, queries, cand, k, metric=metric)


def pq_write(index: PqIndex, path: str) -> None:
    """Persist the PQ index (the faiss::write_index analog,
    apps/nvdb_ivfpq_build.cpp:93-96): codes as parquet; codebooks,
    rotation, and params as a small parquet sidecar (one row per
    (m, k) centroid — tiny: M x 2^nbits x dsub doubles)."""
    spark = index.codes.sparkSession
    index.codes.write.mode("overwrite").parquet(f"{path}/codes")
    rows = [
        (mi, ki, [float(x) for x in index.codebooks[mi, ki]])
        for mi in range(index.m)
        for ki in range(index.codebooks.shape[1])
    ]
    spark.createDataFrame(
        rows, "m int, k int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    meta = [(index.m, index.nbits, index.dim, index.rotation is not None)]
    spark.createDataFrame(
        meta, "m int, nbits int, dim int, has_rotation boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    if index.rotation is not None:
        rot_rows = [(i, [float(x) for x in index.rotation[i]]) for i in range(index.dim)]
        spark.createDataFrame(rot_rows, "i int, row array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}/rotation")


def pq_read(spark, path: str) -> PqIndex:
    meta = spark.read.parquet(f"{path}/meta").first()
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    k = 2**meta.nbits
    dsub = meta.dim // meta.m
    books = np.zeros((meta.m, k, dsub))
    for r in cb_rows:
        books[r.m, r.k] = r.centroid
    rotation = None
    if meta.has_rotation:
        rot = np.zeros((meta.dim, meta.dim))
        for r in spark.read.parquet(f"{path}/rotation").collect():
            rot[r.i] = r.row
        rotation = rot
    return PqIndex(
        codebooks=books,
        codes=spark.read.parquet(f"{path}/codes"),
        m=meta.m,
        nbits=meta.nbits,
        dim=meta.dim,
        rotation=rotation,
    )
