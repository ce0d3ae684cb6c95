"""Diversified reranking: maximal marginal relevance (MMR) over the
candidate head of a vector search.

Search results cluster — near-duplicate passages crowd out coverage.
MMR (Carbonell & Goldstein, SIGIR'98) greedily picks the candidate
maximizing ``lambda * relevance - (1 - lambda) * max similarity to the
already-selected set``, trading relevance against redundancy.

Scale shape: the greedy loop is inherently sequential in k, but it only
ever touches the candidate HEAD (pool of ~50-100 rows per query) that a
distributed top-k already produced — the same head the refine stage
reranks. Like IVF probing (operators/ivf.probe_ids_np), the head is
driver-resident by contract, so the greedy runs in NumPy with zero
extra Spark jobs. The distributed work — scan, score, top-pool — stays
in the two-phase plan.

Float parity: lambda is fixed to 0.5 (exact dyadic — `0.5 * x` is a
single IEEE operation both engines perform identically, with no decimal
-literal rounding), similarities accumulate per-dimension left-to-right
(the list_dot_product / sequential-fold order), and normalization is
per-element x / sqrt(sum x^2) — so a DuckDB recursive CTE replays every
selection decision bit-exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import topk_multi

MMR_LAMBDA = 0.5  # exact dyadic by design — see module docstring
MAX_HEAD_ROWS = 1_000_000  # driver-residency guard (Q x pool)


def _seq_dot_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, m) dot products with per-dimension left-to-right
    accumulation — the exact order of list_dot_product / the engine's
    sequential double fold (same trick as ivf.probe_ids_np)."""
    acc = np.zeros((a.shape[0], b.shape[0]))
    for d in range(a.shape[1]):
        acc += a[:, d][:, None] * b[:, d][None, :]
    return acc


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    """x / sqrt(sum x^2) per row, the sum accumulated per-dimension
    left-to-right (matches list_aggregate(..., 'sum') of x*x)."""
    acc = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        acc += mat[:, d] * mat[:, d]
    return mat / np.sqrt(acc)[:, None]


def _exact_scores(mat: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    """Relevance of every head row to the query with the engine's exact
    sequential-fold semantics (operators/topk.score_expr's definitions,
    accumulated per-dimension left-to-right in doubles)."""
    if metric == "dot":
        return _seq_dot_matrix(mat, q[None, :])[:, 0]
    if metric == "cosine":
        dots = _seq_dot_matrix(mat, q[None, :])[:, 0]
        bn = np.zeros(mat.shape[0])
        qn = 0.0
        for d in range(mat.shape[1]):
            bn += mat[:, d] * mat[:, d]
            qn += q[d] * q[d]
        return dots / (np.sqrt(bn) * np.sqrt(qn))
    # MMR trades relevance against similarity in the same space; a
    # distance metric would need a sign convention the objective doesn't
    # define — reject instead of silently maximizing distance.
    raise ValueError(f"mmr_rerank supports dot/cosine relevance, got {metric!r}")


def mmr_rerank(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    pool: int,
    metric: str = "dot",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``pool`` candidates per query (distributed two-phase scan),
    then greedy MMR down to ``k`` diversified results per query.

    Returns (query_id, vec_id, score, mmr_rank): score is the original
    relevance score; mmr_rank the diversified selection order."""
    cand = topk_multi(base, queries, pool, metric=metric, strategy="two_phase")
    head = cand.join(
        base.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")),
        "vec_id",
    ).select("query_id", "vec_id", "score", "__v")
    qvecs = {
        int(r[0]): np.asarray(r[1], dtype=np.float64)
        for r in queries.select("query_id", "embedding").collect()
    }
    rows = head.limit(MAX_HEAD_ROWS + 1).collect()
    if len(rows) > MAX_HEAD_ROWS:
        raise ValueError(
            f"MMR reranks the driver-resident candidate head and supports at "
            f"most {MAX_HEAD_ROWS} (query, candidate) rows; got more. Lower "
            f"the pool or split the query set."
        )
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(int(r[0]), []).append(r)
    out: list[tuple[int, int, float, int]] = []
    for qid in sorted(by_q):
        rs = by_q[qid]
        ids = np.asarray([r[1] for r in rs], dtype=np.int64)
        mat = np.asarray([r[3] for r in rs], dtype=np.float64)
        # Recompute relevance with the exact sequential fold rather than
        # trusting the two-phase partials: the BLAS matmul's reduction
        # order (and so its last ulp) depends on partition/batch layout,
        # which would make MMR's output partition-dependent and break
        # the bit-exact oracle contract. The head is already
        # driver-resident, so this costs one (pool x D) pass.
        scores = _exact_scores(mat, qvecs[qid], metric)
        en = _normalize_rows(mat)
        sim = _seq_dot_matrix(en, en)
        selected: list[int] = []
        remaining = np.ones(len(rs), dtype=bool)
        for step in range(min(k, len(rs))):
            if not selected:
                obj = scores.copy()
            else:
                maxsim = sim[:, selected].max(axis=1)
                obj = MMR_LAMBDA * scores - (1.0 - MMR_LAMBDA) * maxsim
            obj = np.where(remaining, obj, -np.inf)
            best_val = obj.max()
            # argmax with (obj desc, vec_id asc) tie-break, matching the
            # oracle's ORDER BY ... DESC, vec_id ASC
            tied = np.flatnonzero(obj == best_val)
            pick = int(tied[np.argmin(ids[tied])])
            selected.append(pick)
            remaining[pick] = False
            out.append((qid, int(ids[pick]), float(scores[pick]), step + 1))
    spark = base.sparkSession
    return spark.createDataFrame(
        out, "query_id long, vec_id long, score double, mmr_rank int"
    )
