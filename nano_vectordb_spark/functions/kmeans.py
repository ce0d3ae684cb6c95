"""Driver-side k-means training + distributed vectorized assignment.

The reference trains its coarse/subspace quantizers single-node on a
bounded prefix of the data (FAISS ntrain, apps/nvdb_ivf_build.cpp:44,
53-56: train=200K of 500K) and only the ASSIGN step touches the full
table. We mirror that split exactly — it is also the only shape that
works at 100 TB:

  * fit: collect a bounded training sample (first ``train_rows`` rows,
    the FAISS prefix convention) and run Lloyd's iterations in NumPy on
    the driver. A k=4096, D=384 fit on 256K samples is seconds of BLAS;
    running it as distributed Spark jobs costs one scheduler round-trip
    PER ITERATION and is strictly slower at every scale.
  * assign: broadcast the tiny (k x D) centroid matrix inside an
    Arrow-batched pandas UDF and argmin via one matmul per batch —
    embarrassingly parallel over the full table, no shuffle.

Empty clusters are reseeded from the points farthest from their
assigned centroid (the standard Lloyd repair, same effect as FAISS's
split-largest policy), which keeps all nlist partitions non-empty so
the partitionBy("cluster_id") layout stays complete.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def lloyd_fit(
    mat: np.ndarray,
    k: int,
    seed: int = 42,
    max_iter: int = 25,
    tol: float = 1e-6,
    n_init: int = 4,
) -> np.ndarray:
    """Seeded Lloyd's k-means on an in-memory (n, d) float64 matrix.
    ``n_init`` random restarts, keep the lowest-inertia fit (restarts
    are nearly free driver-side; they buy the robustness Spark ML got
    from k-means||). Returns (k, d) centroids, row order = cluster_id."""
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    n = mat.shape[0]
    if n < k:
        raise ValueError(f"training sample ({n}) smaller than k ({k})")
    best_cent, best_cost = None, np.inf
    for trial in range(max(1, n_init)):
        cent, cost = _lloyd_once(mat, k, seed + 7919 * trial, max_iter, tol)
        if cost < best_cost:
            best_cent, best_cost = cent, cost
    return best_cent


def _assign_repair(
    mat: np.ndarray, cent: np.ndarray, x_sq: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float]:
    """Assign each point to its nearest centroid, then repair empty
    clusters by reseeding them from far points — recomputing distances
    after every reseed, so on exit every cluster owns >= 1 point under
    the (possibly reseeded, in-place mutated) ``cent``. Returns
    (assign, best, inertia)."""
    n, k = mat.shape[0], cent.shape[0]
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over clusters
    d2 = x_sq[:, None] - 2.0 * (mat @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    assign = d2.argmin(axis=1)
    best = d2[np.arange(n), assign]
    used = np.zeros(n, dtype=bool)  # each reseed consumes a distinct donor
    while True:
        empties = np.flatnonzero(np.bincount(assign, minlength=k) == 0)
        if len(empties) == 0:
            break
        e = int(empties[0])
        far = int(np.where(used, -np.inf, best).argmax())
        used[far] = True
        cent[e] = mat[far]
        # exact distances to the reseeded centroid; strictly-closer points
        # switch, and the donor switches even on an exact tie (duplicate
        # points all sitting on their centroids would tie at 0)
        d2e = x_sq - 2.0 * (mat @ cent[e]) + float(cent[e] @ cent[e])
        switch = d2e < best
        assign[switch] = e
        best[switch] = d2e[switch]
        assign[far] = e
        best[far] = d2e[far]
    return assign, best, float(best.sum())


def _lloyd_once(
    mat: np.ndarray, k: int, seed: int, max_iter: int, tol: float
) -> tuple[np.ndarray, float]:
    n = mat.shape[0]
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(n, size=k, replace=False)].copy()
    x_sq = (mat * mat).sum(axis=1)
    prev_inertia = np.inf
    for _ in range(max_iter):
        assign, _best, inertia = _assign_repair(mat, cent, x_sq)
        sums = np.zeros((k, mat.shape[1]))
        np.add.at(sums, assign, mat)
        cent = sums / np.bincount(assign, minlength=k)[:, None]
        if prev_inertia - inertia <= tol * max(prev_inertia, 1.0):
            break
        prev_inertia = inertia
    # the loop exits right after a mean update, which can starve a
    # centroid (no point's nearest); one final assign+repair pass makes
    # the returned centroids self-consistent: every centroid owns a point.
    _assign2, _best2, inertia = _assign_repair(mat, cent, x_sq)
    return cent, inertia


def collect_train_sample(
    df: DataFrame, vec_col: str, train_rows: int, id_col: str = "vec_id"
) -> np.ndarray:
    """First-N training rows (the FAISS ntrain convention,
    ivf_build.cpp:44), keyed by ``id_col`` when the table has one: the
    N smallest ids, via TakeOrderedAndProject — distributed partial
    top-N, O(train_rows x D) driver traffic regardless of table size.

    Keying on the id (rather than a bare limit()) makes the training
    set well-defined under ANY physical layout: limit() takes a
    partition-order prefix, and partition order over a multi-file scan
    follows Spark's size-descending file packing — not reproducible
    outside Spark, and not stable across layouts of the same data. On
    the single-file fixtures rows are id-monotone, so this is
    bit-identical to the historical prefix; on directory-layout scale
    fixtures (tests/make_sf1.py) it is what lets the NumPy oracle
    re-fit reproduce the Spark fit exactly.

    Two passes so driver traffic is bounded by train_rows TOTAL, not
    per task: a single TakeOrderedAndProject over (id, vec) returns
    each task's local top-N — at nlist=512 over a 31-file 2M-row
    fixture that was 31 x 35 MiB = 1.1 GiB of serialized results,
    over spark.driver.maxResultSize (measured r10). Pass 1 takes the
    N smallest IDS (8 B each); pass 2 fetches vectors with a pushed
    id predicate and trims driver-side. A bare ``id <=
    ids[-1]`` fetch is NOT bounded when ids repeat (degenerate: one id
    everywhere collects the whole table, reintroducing the driver OOM
    this fixes — ADVICE r10), so pass 2 fetches in two bounded
    pieces: rows STRICTLY below the threshold id (provably <=
    train_rows - 1 of them — every such row is among the N smallest
    with multiplicity), then threshold-TIED rows under a limit() for
    the remainder. With unique ids (every real fixture and the vecbin
    contract) this is the same rows as the one-pass form,
    deterministically; under duplicate ids the choice among
    threshold-tied rows is arbitrary (as any first-N-by-id must be),
    but driver traffic stays bounded by train_rows."""
    from pyspark.sql import functions as F

    if id_col in df.columns:
        ids = [
            r[0]
            for r in df.select(id_col).orderBy(id_col).limit(train_rows).collect()
        ]
        if not ids:
            return np.zeros((0, 0), dtype=np.float64)
        strict = (
            df.select(id_col, vec_col)
            .filter(F.col(id_col) < ids[-1])
            .collect()
        )
        strict.sort(key=lambda r: r[0])
        need = train_rows - len(strict)
        tied = (
            df.select(id_col, vec_col)
            .filter(F.col(id_col) == ids[-1])
            .limit(max(need, 0))
            .collect()
        )
        rows = strict + tied
        return np.asarray(
            [r[1] for r in rows[:train_rows]], dtype=np.float64
        )
    rows = df.select(vec_col).limit(train_rows).collect()
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def train_rows_for(k: int, cap: int = 262_144) -> int:
    """FAISS guidance: ~39..256 points per centroid; capped so the
    driver collect stays bounded at any nlist."""
    return min(max(256 * k, 4096), cap)


def assign_udf(centroids: np.ndarray):
    """pandas UDF: embedding -> nearest-centroid id (L2). One matmul
    per Arrow batch; the (k, d) matrix rides the closure broadcast."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (cent * cent).sum(axis=1)

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        d2 = -2.0 * (x @ cent.T) + c_sq[None, :]  # ||x||^2 constant per row
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return _assign


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    return df.withColumn(out_col, assign_udf(centroids)(F.col(vec_col)))


def multi_assign_udf(centroids: np.ndarray, replicas: int, eps: float):
    """pandas UDF: embedding -> array of the row's nearest-centroid id
    plus up to ``replicas - 1`` additional centroid ids whose TRUE L2
    distance is within (1+eps) of the nearest (compared as squared
    distances against (1+eps)^2 * d2_min) — SPANN's closure
    multi-assignment (Chen et al., "SPANN", NeurIPS 2021 §4.1),
    the boundary-replication rule that lets probed shards contain a
    query's frontier neighbors.

    The FIRST element is always the single-assignment argmin (ties by
    cluster_id, same lexsort discipline as assign_udf), so replication
    is a strict superset of assign_clusters and de-replication is
    "keep element 0"."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (cent * cent).sum(axis=1)
    cids = np.arange(cent.shape[0], dtype=np.int64)
    ratio = (1.0 + eps) ** 2

    @pandas_udf("array<int>")
    def _massign(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(x) == 0:
            return pd.Series([], dtype="object")
        d2 = -2.0 * (x @ cent.T) + c_sq[None, :] + (x * x).sum(axis=1)[:, None]
        np.maximum(d2, 0.0, out=d2)  # clamp matmul round-off below zero
        out = []
        for row in d2:
            order = np.lexsort((cids, row))[:replicas]
            lim = ratio * row[order[0]]
            keep = [int(order[0])]
            keep += [int(o) for o in order[1:] if row[o] <= lim]
            out.append(keep)
        return pd.Series(out)

    return _massign


def encode_udf(
    codebooks: np.ndarray,
    rotation: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
):
    """pandas UDF: embedding [, cluster_id] -> PQ codes array<tinyint>.

    All M subspace argmins happen in one Arrow batch pass (vs M
    sequential ML transforms). ``rotation`` pre-multiplies (OPQ);
    ``centroids`` switches to residual encoding (IVF-PQ): the second
    column must then be the row's cluster_id."""
    books = np.ascontiguousarray(codebooks, dtype=np.float64)  # (M, K, dsub)
    m, _, dsub = books.shape
    rot = None if rotation is None else np.ascontiguousarray(rotation, dtype=np.float64)
    cent = None if centroids is None else np.ascontiguousarray(centroids, dtype=np.float64)

    def _encode_mat(x: np.ndarray) -> list:
        if rot is not None:
            x = x @ rot  # row-wise R^T x
        codes = np.empty((x.shape[0], m), dtype=np.int8)
        for mi in range(m):
            xs = x[:, mi * dsub : (mi + 1) * dsub]
            b = books[mi]
            d2 = -2.0 * (xs @ b.T) + (b * b).sum(axis=1)[None, :]
            codes[:, mi] = d2.argmin(axis=1).astype(np.int8)
        return [c.tolist() for c in codes]

    if cent is None:

        @pandas_udf("array<tinyint>")
        def _encode(vecs: pd.Series) -> pd.Series:
            if len(vecs) == 0:
                return pd.Series([], dtype="object")
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            return pd.Series(_encode_mat(x))

        return _encode

    @pandas_udf("array<tinyint>")
    def _encode_resid(vecs: pd.Series, cluster_ids: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        x = x - cent[cluster_ids.to_numpy(dtype=np.int64)]
        return pd.Series(_encode_mat(x))

    return _encode_resid
