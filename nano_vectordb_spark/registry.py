"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, an
equivalent DuckDB oracle SQL string.

This is the single source of truth behind ``__spark_entry__.queries()``
and ``__spark_entry__.oracle_sql()`` — the driver's correctness gate —
and behind tests/test_oracle_parity.py, which runs the same comparison
locally at sf0.01 before the driver does.

Cross-engine determinism rules used throughout:
  * vector math in double precision with sequential left-to-right folds
    (bit-identical to DuckDB's list_* functions — verified in tests);
  * seeded randomness via md5 keyed hashes, never engine RNGs;
  * order-dependent float aggregates (avg over many rows) rounded to 6
    decimals on both sides; order-independent ones (min/max) left exact;
  * every computed column aliased identically in both engines.
"""

from __future__ import annotations

import math as _math
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nano_vectordb_spark.functions import quantize as qz
from nano_vectordb_spark.functions import text as tx
from nano_vectordb_spark.functions.vector import has_nan_expr, norm_expr
from nano_vectordb_spark.operators import components as comp_ops
from nano_vectordb_spark.operators import dedup as dedup_ops
from nano_vectordb_spark.operators import globalrank as grank
from nano_vectordb_spark.operators import gt as gt_ops
from nano_vectordb_spark.operators import metrics as metrics_ops
from nano_vectordb_spark.operators import ivf as ivf_ops
from nano_vectordb_spark.operators import lexical as lexical_ops
from nano_vectordb_spark.operators import pipeline as pipe_ops
from nano_vectordb_spark.operators import pq as pq_ops
from nano_vectordb_spark.operators import refine as refine_ops
from nano_vectordb_spark.operators import rerank as rerank_ops
from nano_vectordb_spark.operators import sample as sample_ops
from nano_vectordb_spark.operators import textops as text_ops
from nano_vectordb_spark.operators import topk as topk_ops
from nano_vectordb_spark.sources.tables import load_table

K = 10
NQ = 20
SEED = 42


@dataclass(frozen=True)
class Entry:
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL, a zero-arg callable producing it lazily (used when the
    # SQL embeds literals computed from the fixture, e.g. seeded k-means
    # centroids), or None -> rows-only check
    oracle: str | Callable[[], str] | None


REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn):
        REGISTRY[name] = Entry(fn, oracle)
        return fn

    return deco


_ORACLE_SQL_CACHE: dict[int, str] = {}


def resolve_oracle(entry: Entry) -> str | None:
    if entry.oracle is None or isinstance(entry.oracle, str):
        return entry.oracle
    key = id(entry.oracle)
    if key not in _ORACLE_SQL_CACHE:
        _ORACLE_SQL_CACHE[key] = entry.oracle()
    return _ORACLE_SQL_CACHE[key]


# --------------------------------------------------------------------------
# Shared SQL fragments (DuckDB dialect)
# --------------------------------------------------------------------------

# seeded sample of NQ query vectors (operators/sample.py semantics)
_SQL_QUERIES = f"""
  SELECT (row_number() OVER w - 1) AS query_id,
         vec_id AS source_vec_id,
         embedding
  FROM embeddings
  WINDOW w AS (ORDER BY md5('{SEED}:' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC)
  ORDER BY md5('{SEED}:' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
  LIMIT {NQ}
"""

_SQL_TOPK_MULTI = f"""
WITH q AS ({_SQL_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {K}
"""


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sample_ops.sample_queries(emb, NQ, seed=SEED, mode="random")


# --------------------------------------------------------------------------
# Canonical array serialization (driver's canonicalizer requires hashable
# columns, so registry entries emit arrays as deterministic strings).
#
# Floats: bround(x, 9) in Spark is bit-identical to round_even(x, 9) in
# DuckDB (RNE, verified in tests), and DECIMAL(12,9) formatting matches
# between the engines — verified exhaustively over sf0.01 embeddings.
# --------------------------------------------------------------------------


def _ser_f32_col(col: str):
    """Spark: array<float/double> -> canonical comma-joined string."""
    return F.expr(
        f"array_join(transform({col}, x -> cast(cast(bround(cast(x as double), 9)"
        f" as decimal(12,9)) as string)), ',')"
    )


def _sql_ser_f32(col: str) -> str:
    """DuckDB equivalent of :func:`_ser_f32_col`."""
    return (
        f"list_aggregate(list_transform(CAST({col} AS DOUBLE[]), "
        f"x -> CAST(CAST(round_even(x, 9) AS DECIMAL(12,9)) AS VARCHAR)), "
        f"'string_agg', ',')"
    )


def _ser_int_col(col: str):
    """Spark: integer array -> comma-joined string."""
    return F.expr(f"array_join(transform({col}, x -> cast(x as string)), ',')")


# --------------------------------------------------------------------------
# Vector search core (reference O9-O17, O20-O21)
# --------------------------------------------------------------------------


@register(
    "topk_dot",
    oracle=f"""
SELECT vec_id,
       list_dot_product(CAST(embedding AS DOUBLE[]),
         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS score
FROM embeddings
ORDER BY score DESC, vec_id ASC
LIMIT {K}
""",
)
def topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: single-query exact top-k by dot score (reference O9,
    src/flat_index.cpp:16-48)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return topk_ops.topk(emb, qvec, K, metric="dot")


@register(
    "topk_filtered",
    oracle=f"""
SELECT vec_id,
       list_dot_product(CAST(embedding AS DOUBLE[]),
         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS score
FROM embeddings
WHERE label = 1
ORDER BY score DESC, vec_id ASC
LIMIT {K}
""",
)
def topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: exact top-k restricted to a metadata
    predicate (label = 1) — the standard vector-DB filter feature in
    its pre-filter form. The equality predicate reaches the parquet
    scan as a pushed filter (pinned in tests/test_plans.py), so at
    100 TB only matching row groups are decoded and scored;
    post-filtering an ANN result would under-fill k instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return topk_ops.topk(
        emb.filter(F.col("label") == 1), qvec, K, metric="dot"
    )


@register(
    "topk_l2",
    oracle=f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       list_aggregate(list_transform(list_zip(CAST(embedding AS DOUBLE[]), (SELECT v FROM q)),
         p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS score
FROM embeddings
ORDER BY score ASC, vec_id ASC
LIMIT {K}
""",
)
def topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query exact top-k by L2^2 distance (reference O7)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return topk_ops.topk(emb, qvec, K, metric="l2")


@register(
    "topk_cosine",
    oracle=f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 7)
SELECT vec_id,
       list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM q))
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product((SELECT v FROM q), (SELECT v FROM q)))) AS score
FROM embeddings
ORDER BY score DESC, vec_id ASC
LIMIT {K}
""",
)
def topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    return topk_ops.topk(emb, qvec, K, metric="cosine")


@register("topk_multi_window", oracle=_SQL_TOPK_MULTI)
def topk_multi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query exact top-k, declarative strategy
    (reference O14, apps/nvdb_bench.cpp:47-159)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk_ops.topk_multi(emb, _queries_df(spark, sf_dir), K, strategy="window")


@register("topk_multi_twophase", oracle=_SQL_TOPK_MULTI)
def topk_multi_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query exact top-k, partial/final strategy
    (reference O10-O12 heap-merge pattern), rescored exactly so the
    output is bit-identical to the declarative definition."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    two = topk_ops.topk_multi(emb, q, K, strategy="two_phase")
    return topk_ops.exact_rescore(emb, q, two)


@register(
    "gt_build",
    oracle=f"""
WITH ranked AS ({_SQL_TOPK_MULTI})
SELECT query_id, CAST({K} AS INT) AS k,
       array_to_string(list(vec_id ORDER BY rank ASC), ',') AS gt_ids
FROM ranked GROUP BY query_id
""",
)
def gt_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN ground truth (reference O16, apps/nvdb_gt_build.cpp:74-124).

    gt_ids is emitted as a comma-joined string (canonical serialization
    of the gtbin ids artifact, apps/nvdb_gt_build.cpp:107-124)."""
    emb = load_table(spark, sf_dir, "embeddings")
    gt = gt_ops.gt_build(emb, _queries_df(spark, sf_dir), K)
    return gt.withColumn("gt_ids", _ser_int_col("gt_ids"))


@register(
    "sample_queries",
    oracle=f"""
SELECT query_id, source_vec_id, {_sql_ser_f32('embedding')} AS embedding
FROM ({_SQL_QUERIES})
""",
)
def sample_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded query sampling (reference O21, tools/nvdb_make_query.cpp:56-75).

    The vector is emitted in canonical string serialization."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = sample_ops.sample_queries(emb, NQ, seed=SEED, mode="random")
    return q.withColumn("embedding", _ser_f32_col("embedding"))


@register(
    "slice_first_n",
    oracle=f"""
SELECT vec_id, {_sql_ser_f32('embedding')} AS embedding, label
FROM embeddings ORDER BY vec_id ASC LIMIT 100
""",
)
def slice_first_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-n slice (reference O20, tools/nvdb_slice.cpp:27-75)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return sample_ops.slice_first_n(emb, 100).withColumn(
        "embedding", _ser_f32_col("embedding")
    )


@register(
    "sanity_stats",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count_if(len(embedding) <> (SELECT max(len(embedding)) FROM embeddings)) AS BIGINT) AS n_bad_dim,
       CAST(count_if(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
           x -> CAST(isnan(x) OR isinf(x) AS INT)), 'sum') > 0) AS BIGINT) AS n_nonfinite,
       min(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS min_norm,
       max(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS max_norm,
       round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 6) AS avg_norm
FROM embeddings
""",
)
def sanity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data sanity invariants (reference O24, apps/nvdb_sanity.cpp:7-47):
    NaN/Inf absence, dimension consistency, L2-norm spread."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.agg(F.max(F.size("embedding"))).first()[0]
    return emb.agg(
        F.count("*").alias("n_rows"),
        F.sum((F.size("embedding") != F.lit(dim)).cast("long")).alias("n_bad_dim"),
        F.sum(has_nan_expr("embedding").cast("long")).alias("n_nonfinite"),
        F.min(norm_expr("embedding")).alias("min_norm"),
        F.max(norm_expr("embedding")).alias("max_norm"),
        F.round(F.avg(norm_expr("embedding")), 6).alias("avg_norm"),
    )


# --------------------------------------------------------------------------
# Quantization ladder (reference O3, O6, O22, O23) + refine (O29, O32)
# --------------------------------------------------------------------------

# (vec_id, e double[], scale float) — the i8 codec preamble
_SQL_I8_PRE = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         CAST(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 AS REAL) AS scale
  FROM embeddings
"""

# (vec_id, scale, embedding_i8) — full encode
_SQL_I8_ENCODE = f"""
  SELECT vec_id, scale,
         list_transform(e, x -> CAST(
           CASE WHEN scale = 0 THEN 0
                ELSE greatest(-127.0, least(127.0, round_even(x / CAST(scale AS DOUBLE), 0)))
           END AS TINYINT)) AS embedding_i8
  FROM ({_SQL_I8_PRE})
"""

_SQL_TOPK_I8 = f"""
WITH q AS ({_SQL_QUERIES}),
enc AS ({_SQL_I8_ENCODE}),
scored AS (
  SELECT q.query_id, enc.vec_id,
         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(enc.embedding_i8 AS DOUBLE[]))
           * CAST(enc.scale AS DOUBLE) AS score
  FROM enc CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {K}
"""


def _i8_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.withColumn(
        "scale", qz.i8_scale_expr("embedding").cast("float")
    ).withColumn("embedding_i8", qz.i8_encode_expr("embedding", F.col("scale")))


def _topk_i8_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    enc = _i8_base(spark, sf_dir)
    q = F.broadcast(
        _queries_df(spark, sf_dir).select("query_id", F.col("embedding").alias("__qvec"))
    )
    scored = enc.crossJoin(q).select(
        "query_id",
        "vec_id",
        qz.dot_i8_expr("__qvec", "embedding_i8", F.col("scale").cast("double")).alias(
            "score"
        ),
    )
    return topk_ops.rank_topk(scored, K, metric="dot")


@register(
    "quantize_i8",
    oracle=f"""
SELECT vec_id, scale,
       array_to_string(embedding_i8, ',') AS embedding_i8
FROM ({_SQL_I8_ENCODE})
""",
)
def quantize_i8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row max-abs int8 quantization (reference O23,
    apps/nvdb_quantize_i8.cpp:57-85): f32 scale + tinyint codes
    (codes serialized to a canonical comma-joined string)."""
    return _i8_base(spark, sf_dir).select(
        "vec_id", "scale", _ser_int_col("embedding_i8").alias("embedding_i8")
    )


@register("topk_i8", oracle=_SQL_TOPK_I8)
def topk_i8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query top-k ranked in the int8-quantized scoring space
    (reference O6 + 'exact within quantized space', README.md:17)."""
    return _topk_i8_df(spark, sf_dir)


@register(
    "quant_error_stats",
    oracle=f"""
WITH enc AS (
  SELECT s.vec_id, s.e, s.scale,
         list_transform(s.e, x -> CAST(
           CASE WHEN s.scale = 0 THEN 0
                ELSE greatest(-127.0, least(127.0, round_even(x / CAST(s.scale AS DOUBLE), 0)))
           END AS TINYINT)) AS codes
  FROM ({_SQL_I8_PRE}) s
),
err AS (
  SELECT vec_id, scale,
         list_max(list_transform(list_zip(codes, e),
           p -> abs(CAST(p[1] AS DOUBLE) * CAST(scale AS DOUBLE) - p[2]))) AS max_err
  FROM enc
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count_if(max_err > CAST(scale AS DOUBLE) * 0.5000001) AS BIGINT) AS n_violations,
       max(max_err) AS max_abs_err,
       round(avg(max_err), 6) AS avg_max_err
FROM err
""",
)
def quant_error_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization round-trip invariant (SURVEY.md §5c): per-element
    error of dequant(i8) is bounded by scale/2."""
    enc = _i8_base(spark, sf_dir)
    max_err = F.array_max(
        F.zip_with(
            F.col("embedding_i8").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
            lambda c, x: F.abs(c * F.col("scale").cast("double") - x),
        )
    )
    per_row = enc.select("vec_id", F.col("scale").cast("double").alias("scale"), max_err.alias("max_err"))
    return per_row.agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("max_err") > F.col("scale") * 0.5000001).cast("long")).alias(
            "n_violations"
        ),
        F.max("max_err").alias("max_abs_err"),
        F.round(F.avg("max_err"), 6).alias("avg_max_err"),
    )


@register(
    "recall_i8_vs_f32",
    oracle=f"""
WITH gt AS ({_SQL_TOPK_MULTI}),
pred AS ({_SQL_TOPK_I8}),
per_query AS (
  SELECT gt.query_id,
         CAST(count(pred.vec_id) AS DOUBLE) / {K} AS recall
  FROM gt LEFT JOIN pred
    ON gt.query_id = pred.query_id AND gt.vec_id = pred.vec_id
  GROUP BY gt.query_id
)
SELECT round(avg(recall), 6) AS recall_at_k,
       CAST(count(*) AS BIGINT) AS n_queries
FROM per_query
""",
)
def recall_i8_vs_f32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of int8-space ranking against the exact f32 ground truth
    (reference O17 with the quantized scan as the predictor)."""
    gt = gt_ops.gt_from_topk(
        topk_ops.topk_multi(
            load_table(spark, sf_dir, "embeddings"), _queries_df(spark, sf_dir), K
        ),
        K,
    ).select("query_id", "gt_ids")
    pred = gt_ops.gt_from_topk(_topk_i8_df(spark, sf_dir), K).select(
        "query_id", F.col("gt_ids").alias("pred_ids")
    )
    res = gt_ops.recall_at_k(gt, pred, K)
    return res.select(F.round("recall_at_k", 6).alias("recall_at_k"), "n_queries")


_REFINE_R = 50


@register(
    "refine_i8",
    oracle=f"""
WITH q AS ({_SQL_QUERIES}),
enc AS ({_SQL_I8_ENCODE}),
scored AS (
  SELECT q.query_id, enc.vec_id,
         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(enc.embedding_i8 AS DOUBLE[]))
           * CAST(enc.scale AS DOUBLE) AS score
  FROM enc CROSS JOIN q
),
cand AS (
  SELECT query_id, vec_id
  FROM (SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS r
        FROM scored)
  WHERE r <= {_REFINE_R}
),
rescored AS (
  SELECT c.query_id, c.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q ON q.query_id = c.query_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM rescored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {K}
""",
)
def refine_i8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged ANN pipeline (reference O29+O32): top-R candidates in the
    int8 space, then exact full-precision rerank to top-k."""
    enc = _i8_base(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    qb = F.broadcast(q.select("query_id", F.col("embedding").alias("__qvec")))
    scored = enc.crossJoin(qb).select(
        "query_id",
        "vec_id",
        qz.dot_i8_expr("__qvec", "embedding_i8", F.col("scale").cast("double")).alias(
            "score"
        ),
    )
    cand = topk_ops.rank_topk(scored, _REFINE_R, metric="dot")
    emb = load_table(spark, sf_dir, "embeddings")
    return refine_ops.refine(emb, q, cand, K, metric="dot")


# IEEE-754 half RNE round-trip emulated arithmetically (DuckDB has no
# half type; spec: tools/nvdb_convert_f16.cpp:20-94): quantize to the
# f16 mantissa grid ulp = 2^(max(floor(log2|x|)-10, -24)) with
# round-half-even; x/ulp and *ulp are exact power-of-two scalings, so
# the result is bit-identical to NumPy's float16 cast (verified over the
# full fixture and a stress sweep into the subnormal range).
_SQL_F16 = (
    "CASE WHEN x = 0 THEN x ELSE "
    "round_even(x / power(2.0, greatest(floor(log2(abs(x))) - 10, -24)), 0) "
    "* power(2.0, greatest(floor(log2(abs(x))) - 10, -24)) END"
)

_SQL_TOPK_F16 = f"""
WITH q AS ({_SQL_QUERIES}),
h AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> {_SQL_F16}) AS emb16
  FROM embeddings
),
scored AS (
  SELECT q.query_id, h.vec_id,
         list_dot_product(h.emb16, CAST(q.embedding AS DOUBLE[])) AS score
  FROM h CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {K}
"""


@register("topk_f16", oracle=_SQL_TOPK_F16)
def topk_f16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query top-k in the f16-rounded scoring space (reference
    O5/O22). Oracle: DuckDB emulates the half round-trip on the f16
    mantissa grid with round-half-even (bit-identical to NumPy float16);
    parity also covered by tests/test_quantize.py."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding_f16", qz.f16_round_expr("embedding")
    )
    q = F.broadcast(
        _queries_df(spark, sf_dir).select("query_id", F.col("embedding").alias("__qvec"))
    )
    from nano_vectordb_spark.functions.vector import dot_expr

    scored = emb.crossJoin(q).select(
        "query_id", "vec_id", dot_expr("embedding_f16", "__qvec").alias("score")
    )
    return topk_ops.rank_topk(scored, K, metric="dot")


# --------------------------------------------------------------------------
# IVF (reference O26, O28). The coarse quantizer is a SEEDED driver-side
# fit on a deterministic training prefix, so the centroids are
# reproducible outside Spark: the oracle recomputes them in NumPy and
# embeds them as literals, letting DuckDB replay probe -> prune -> rank
# exactly — the reference's own exact-oracle methodology
# (apps/nvdb_ivf_eval.cpp:580-601). Self-oracle recall ladder lives in
# tests/test_ivf.py.
# --------------------------------------------------------------------------

_IVF_NLIST = 16
_IVF_NPROBE = 4
_INDEX_CACHE: dict[tuple[str, str], object] = {}


def _materialize_once(path: str, write_fn, marker: str = "_SUCCESS") -> None:
    """Concurrency-safe /tmp materialization for the content-addressed
    layout caches: write to a PID-suffixed temp dir and atomically
    rename into place. Two sessions racing over the same testdata can
    otherwise interleave `exists(_SUCCESS)` / `mode("overwrite")` and
    one reads a half-overwritten layout. The rename loser just discards
    its copy; a dead session's partial dir (no marker) is replaced."""
    import os as _os
    import shutil as _shutil

    if _os.path.exists(_os.path.join(path, marker)):
        return
    tmp = f"{path}.tmp.{_os.getpid()}"
    _shutil.rmtree(tmp, ignore_errors=True)
    write_fn(tmp)
    try:
        _os.rename(tmp, path)
    except OSError:
        if _os.path.exists(_os.path.join(path, marker)):
            _shutil.rmtree(tmp, ignore_errors=True)  # race lost: keep winner
        else:
            _shutil.rmtree(path, ignore_errors=True)  # stale partial dir
            _os.rename(tmp, path)

# the driver's correctness gate runs at this fixture; lazy oracles that
# embed fit-derived literals compute them from the same parquet
_ORACLE_SF = "/root/testdata/sf0.01"


def _sql_l2(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')"
    )



_ORACLE_FIT_CACHE: dict[str, object] = {}


def _fit_cached(key: str, fn):
    """Oracle fits are deterministic per fixture; cache them so a
    harness that calls oracle_sql() repeatedly (e.g. once per query
    subprocess) pays for each fit once per process."""
    if key not in _ORACLE_FIT_CACHE:
        _ORACLE_FIT_CACHE[key] = fn()
    return _ORACLE_FIT_CACHE[key]


def _oracle_centroids_np() -> "object":
    """Recompute the IVF coarse centroids for the oracle fixture with
    the IDENTICAL seeded NumPy fit Spark's ivf_build runs (same training
    prefix: parquet file order, same seed)."""

    def fit():
        import numpy as np
        import pyarrow.parquet as papq

        from nano_vectordb_spark.functions import kmeans as km

        tbl = papq.read_table(
            f"{_ORACLE_SF}/embeddings.parquet", columns=["embedding"]
        )
        rows = tbl.column("embedding").to_pylist()[: km.train_rows_for(_IVF_NLIST)]
        return km.lloyd_fit(
            np.asarray(rows, dtype=np.float64), _IVF_NLIST, seed=SEED
        )

    return _fit_cached("ivf_centroids", fit)


def _ivf_oracle(cent=None, pred: str | None = None) -> str:
    """DuckDB replay of ivf_search: assign every row to its nearest
    centroid literal, probe top-nprobe centroids per query, rank dot
    top-k within the probed lists. ``cent`` overrides the centroid set
    (default: the full-fixture fit) — assignment/probe/rank SQL is
    identical either way. ``pred`` optionally restricts the searched
    rows by a metadata predicate over the assigned relation (filtered
    ANN; assignment itself always runs over the full corpus, matching
    an index built before the filter is known)."""
    if cent is None:
        cent = _oracle_centroids_np()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2_row = _sql_l2("CAST(e.embedding AS DOUBLE[])", "c.centroid")
    l2_q = _sql_l2("CAST(q.embedding AS DOUBLE[])", "c.centroid")
    where_pred = f" AND ({pred})" if pred else ""
    return f"""
WITH centroids(cluster_id, centroid) AS (VALUES
    {values}),
q AS ({_SQL_QUERIES}),
assigned AS (
  SELECT vec_id, embedding, cluster_id FROM (
    SELECT e.vec_id, e.embedding, e.label, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c)
  WHERE rn = 1{where_pred}
),
probes AS (
  SELECT query_id, cluster_id FROM (
    SELECT q.query_id, c.cluster_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {l2_q} ASC, c.cluster_id ASC) AS rn
    FROM q CROSS JOIN centroids c)
  WHERE rn <= {_IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(q.embedding AS DOUBLE[])) AS score
  FROM probes p
  JOIN assigned a ON a.cluster_id = p.cluster_id
  JOIN q ON q.query_id = p.query_id
)
SELECT query_id, vec_id, score, rank FROM (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM cand)
WHERE rank <= {K}
"""


def _ivf_index(spark: SparkSession, sf_dir: str) -> ivf_ops.IvfIndex:
    # memoized per sf_dir: builds are seeded/deterministic, and the
    # driver calls many registry entries in one session
    key = ("ivf", sf_dir)
    if key not in _INDEX_CACHE:
        base = load_table(spark, sf_dir, "embeddings")
        idx = ivf_ops.ivf_build(base, nlist=_IVF_NLIST, seed=SEED)
        idx.assigned = idx.assigned.cache()
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


@register("ivf_search", oracle=_ivf_oracle)
def ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probing search (reference O28): top-nprobe centroids ->
    pruned scan -> top-k. Oracle: DuckDB replays the same probe/prune/
    rank against the reproduced centroid literals (the reference's
    exact-oracle methodology, apps/nvdb_ivf_eval.cpp:580-601);
    exactness vs the flat scan at nprobe=nlist is additionally asserted
    in tests/test_ivf.py."""
    index = _ivf_index(spark, sf_dir)
    return ivf_ops.ivf_search(
        index, _queries_df(spark, sf_dir), K, nprobe=_IVF_NPROBE
    )


def _ivf_clusters_oracle() -> str:
    """DuckDB replay of the cluster profile: assign every row to its
    nearest centroid literal, then per-cluster count + min/max squared
    distance (min/max are order-independent, so doubles compare exactly
    — a float SUM would not)."""
    cent = _oracle_centroids_np()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2_row = _sql_l2("CAST(e.embedding AS DOUBLE[])", "c.centroid")
    l2_d = _sql_l2("CAST(a.embedding AS DOUBLE[])", "c.centroid")
    return f"""
WITH centroids(cluster_id, centroid) AS (VALUES
    {values}),
assigned AS (
  SELECT vec_id, embedding, cluster_id FROM (
    SELECT e.vec_id, e.embedding, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c)
  WHERE rn = 1
),
d AS (
  SELECT a.cluster_id, {l2_d} AS d2
  FROM assigned a JOIN centroids c USING (cluster_id)
)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_vectors,
       min(d2) AS min_d2, max(d2) AS max_d2
FROM d GROUP BY cluster_id
"""


@register("embedding_clusters", oracle=_ivf_clusters_oracle)
def embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering profile: per-cluster population and tightness
    (min/max squared distance to the centroid) over the IVF k-means
    partitioning — the topic-bucketing / corpus-organization view of
    the same index the search path uses. min/max are order-independent,
    keeping doubles hash-exact across engines (a float sum would
    accumulate in engine-specific order)."""
    from nano_vectordb_spark.functions.vector import l2sq_expr

    idx = _ivf_index(spark, sf_dir)
    joined = idx.assigned.join(F.broadcast(idx.centroids), "cluster_id")
    d2 = l2sq_expr("embedding", "centroid")
    return joined.groupBy("cluster_id").agg(
        F.count("*").alias("n_vectors"),
        F.min(d2).alias("min_d2"),
        F.max(d2).alias("max_d2"),
    )


_SQL_TRAILING_SPARK = """
SELECT user_id, ts, event_type,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS value_trailing_1h
FROM (SELECT *, timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS ts_us
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""

_SQL_TRAILING_DUCK = """
SELECT user_id, ts, event_type,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS value_trailing_1h
FROM (SELECT *, epoch_us(ts) AS ts_us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@register("events_trailing_window", oracle=_SQL_TRAILING_DUCK)
def events_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window coverage: per event, the count and exact
    DECIMAL sum of the same user's events in the trailing hour. The
    frame orders by timezone-free epoch micros on BOTH engines, so peer
    -row (equal-timestamp) semantics coincide; the DECIMAL sum is exact
    in any accumulation order, which is what lets the doubles
    hash-match."""
    return _sql_view_query(spark, sf_dir, _SQL_TRAILING_SPARK)


_IVF_ADD_MOD = 10  # vec_id % 10 == 0 stands in for the inserted batch


def _oracle_centroids_add_np() -> "object":
    """Centroids for the incremental-add entry: the IDENTICAL seeded
    fit, but trained on the pre-insert corpus (vec_id % _IVF_ADD_MOD
    != 0) — first-N prefix of the FILTERED table in file order, exactly
    what collect_train_sample sees on the Spark side."""

    def fit():
        import numpy as np
        import pyarrow.parquet as papq

        from nano_vectordb_spark.functions import kmeans as km

        tbl = papq.read_table(
            f"{_ORACLE_SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = tbl.column("vec_id").to_pylist()
        embs = tbl.column("embedding").to_pylist()
        rows = [e for i, e in zip(ids, embs) if i % _IVF_ADD_MOD != 0]
        rows = rows[: km.train_rows_for(_IVF_NLIST)]
        return km.lloyd_fit(
            np.asarray(rows, dtype=np.float64), _IVF_NLIST, seed=SEED
        )

    return _fit_cached("ivf_centroids_add", fit)


def _ivf_add_oracle() -> str:
    return _ivf_oracle(cent=_oracle_centroids_add_np())


@register("ivf_search_after_add", oracle=_ivf_add_oracle)
def ivf_search_after_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance: build IVF on the pre-insert
    corpus (vec_id % {_IVF_ADD_MOD} != 0), ivf_add the remaining batch
    (assign-to-frozen-centroids, union into the layout — the FAISS
    add() contract), then search the whole index. The oracle replays
    assignment over ALL vectors against the pre-insert centroid
    literals, which equals build-then-add exactly because assignment
    depends only on the frozen centroids."""
    key = ("ivf_add", sf_dir)
    if key not in _INDEX_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(F.col("vec_id") % _IVF_ADD_MOD != 0)
        batch = emb.filter(F.col("vec_id") % _IVF_ADD_MOD == 0)
        idx = ivf_ops.ivf_build(corpus, nlist=_IVF_NLIST, seed=SEED)
        idx = ivf_ops.ivf_add(idx, batch)
        idx.assigned = idx.assigned.cache()
        _INDEX_CACHE[key] = idx
    return ivf_ops.ivf_search(
        _INDEX_CACHE[key], _queries_df(spark, sf_dir), K, nprobe=_IVF_NPROBE
    )


@register("ivf_search_persisted", oracle=_ivf_oracle)
def ivf_search_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search against the PERSISTED partitioned layout — the true
    scale path: the scan carries PartitionFilters on cluster_id and
    reads only the probed directories (asserted in tests/test_plans.py).
    """
    import hashlib
    import os as _os

    key = ("ivf_disk", sf_dir)
    if key not in _INDEX_CACHE:
        idx = _ivf_index(spark, sf_dir)
        # content-addressed path: a layout written by an older fit (e.g.
        # a previous process's /tmp leftovers) must never be reused
        cent_rows = idx.centroids.orderBy("cluster_id").collect()
        fp = hashlib.md5(repr([tuple(r) for r in cent_rows]).encode()).hexdigest()[:12]
        path = "/tmp/nvdb_ivf_" + hashlib.md5(
            f"{sf_dir}:{fp}".encode()
        ).hexdigest()[:8]
        _materialize_once(
            path,
            lambda p: ivf_ops.ivf_write(idx, p),
            marker="centroids/_SUCCESS",
        )
        _INDEX_CACHE[key] = ivf_ops.ivf_read(spark, path, nlist=_IVF_NLIST)
    return ivf_ops.ivf_search(
        _INDEX_CACHE[key], _queries_df(spark, sf_dir), K, nprobe=_IVF_NPROBE
    )


_IVF_SWEEP_NPROBES = (1, 2, 4, 8, _IVF_NLIST)


def _ivf_sweep_oracle() -> str:
    """DuckDB replay of the whole recall ladder: rebuild assignment from
    the centroid literals, rank per nprobe, count exact-GT hits."""
    cent = _oracle_centroids_np()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2_row = _sql_l2("CAST(e.embedding AS DOUBLE[])", "c.centroid")
    l2_q = _sql_l2("CAST(q.embedding AS DOUBLE[])", "c.centroid")
    per_np = "\nUNION ALL\n".join(
        f"""
  SELECT {np} AS nprobe,
         CAST(count(*) AS BIGINT) AS n_hits,
         (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_queries,
         count(*) / ({K}.0 * (SELECT count(*) FROM q)) AS recall_at_k
  FROM (
    SELECT query_id, vec_id FROM (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, vec_id ASC) AS rank
      FROM cand WHERE probe_rn <= {np})
    WHERE rank <= {K}) pred
  JOIN gt USING (query_id, vec_id)"""
        for np in _IVF_SWEEP_NPROBES
    )
    return f"""
WITH centroids(cluster_id, centroid) AS (VALUES
    {values}),
q AS ({_SQL_QUERIES}),
assigned AS (
  SELECT vec_id, embedding, cluster_id FROM (
    SELECT e.vec_id, e.embedding, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c)
  WHERE rn = 1
),
probe_rank AS (
  SELECT q.query_id, c.cluster_id,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY {l2_q} ASC, c.cluster_id ASC) AS rn
  FROM q CROSS JOIN centroids c
),
cand AS (
  SELECT p.query_id, a.vec_id, p.rn AS probe_rn,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(q.embedding AS DOUBLE[])) AS score
  FROM probe_rank p
  JOIN assigned a ON a.cluster_id = p.cluster_id
  JOIN q ON q.query_id = p.query_id
),
gt AS (
  SELECT query_id, vec_id FROM ({_SQL_TOPK_MULTI})
)
SELECT * FROM ({per_np})
ORDER BY nprobe
"""


@register("ivf_recall_sweep", oracle=_ivf_sweep_oracle)
def ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall ladder over nprobe (reference Performance.md Table 16
    shape): one row per nprobe with exact-GT hit counts and recall@10.
    Hit counts are integers (order-independent, hash-exact); recall is
    the exact double division n_hits / (k * n_queries)."""
    index = _ivf_index(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    base = load_table(spark, sf_dir, "embeddings")
    gt_pairs = topk_ops.topk_multi(base, q, K).select("query_id", "vec_id")
    nq = q.count()
    rows = []
    for nprobe in _IVF_SWEEP_NPROBES:
        pred = ivf_ops.ivf_search(index, q, K, nprobe=nprobe).select(
            "query_id", "vec_id"
        )
        hits = pred.join(gt_pairs, ["query_id", "vec_id"]).count()
        rows.append((nprobe, hits, nq, hits / (K * nq)))
    return spark.createDataFrame(
        rows, "nprobe int, n_hits bigint, n_queries bigint, recall_at_k double"
    )


# --------------------------------------------------------------------------
# PQ / ADC (reference O27). Like the IVF oracle, the codebooks are
# seeded deterministic driver-side fits — the oracles recompute them in
# NumPy, embed them (and the OPQ rotation) as literals, and replay
# encode -> LUT -> ADC fold -> (refine) in DuckDB. The ADC score fold
# and LUT entries use sequential summation on both sides, so even the
# raw ADC scores hash-match. Recall-ladder self-oracle: tests/test_pq.py.
# --------------------------------------------------------------------------

_PQ_M, _PQ_NBITS = 8, 6
_IVFPQ_NBITS = 4
_PQ_REFINE_K = 50


def _pq_index(spark: SparkSession, sf_dir: str) -> pq_ops.PqIndex:
    key = ("pq", sf_dir)
    if key not in _INDEX_CACHE:
        base = load_table(spark, sf_dir, "embeddings")
        idx = pq_ops.pq_build(base, m=_PQ_M, nbits=_PQ_NBITS, seed=SEED)
        idx.codes = idx.codes.cache()
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _oracle_train_mat() -> "object":
    import numpy as np
    import pyarrow.parquet as papq

    from nano_vectordb_spark.functions import kmeans as km

    def load():
        tbl = papq.read_table(
            f"{_ORACLE_SF}/embeddings.parquet", columns=["embedding"]
        )
        rows = tbl.column("embedding").to_pylist()[: km.train_rows_for(2**_PQ_NBITS)]
        return np.asarray(rows, dtype=np.float64)

    return _fit_cached("train_mat", load)


def _oracle_pq_books(rotation=None, centroids=None, nbits=_PQ_NBITS, seed_off=0):
    """Replay pq_build/ivfpq_build's codebook fit in NumPy: optional
    rotation, optional coarse-residual (IVF-PQ), per-subspace seeded
    Lloyd fits."""
    import hashlib as _hl

    import numpy as np

    from nano_vectordb_spark.functions import kmeans as km

    key = "pq_books:%s:%s:%s:%s" % (
        nbits,
        seed_off,
        "-" if rotation is None else _hl.md5(rotation.tobytes()).hexdigest()[:8],
        "-" if centroids is None else _hl.md5(
            np.ascontiguousarray(centroids).tobytes()
        ).hexdigest()[:8],
    )
    if key in _ORACLE_FIT_CACHE:
        return _ORACLE_FIT_CACHE[key]
    mat = _oracle_train_mat()
    if rotation is not None:
        mat = mat @ rotation
    if centroids is not None:
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        mat = mat - centroids[d2.argmin(axis=1)]
    dsub = mat.shape[1] // _PQ_M
    books = np.stack(
        [
            km.lloyd_fit(
                mat[:, mi * dsub : (mi + 1) * dsub], 2**nbits, seed=SEED + seed_off + mi
            )
            for mi in range(_PQ_M)
        ]
    )
    _ORACLE_FIT_CACHE[key] = books
    return books


def _oracle_pca_rotation():
    import numpy as np

    def fit():
        mat = _oracle_train_mat()[:10_000]
        cov = np.cov(mat, rowvar=False)
        _w, v = np.linalg.eigh(cov)
        return v[:, ::-1]

    return _fit_cached("pca_rotation", fit)


def _dlist(vals) -> str:
    """Exact DOUBLE[] literal. Elements are written as string casts:
    a bare decimal inside a LIST literal gets promoted to a common
    DECIMAL type BEFORE any ::DOUBLE[] cast (double rounding, off by
    one ulp), while '...'::DOUBLE parses correctly rounded."""
    return "[" + ", ".join(f"'{float(v)!r}'::DOUBLE" for v in vals) + "]"


def _books_values(books) -> str:
    return ",\n    ".join(
        f"({mi}, {code}, {_dlist(books[mi][code])})"
        for mi in range(books.shape[0])
        for code in range(books.shape[1])
    )


def _sql_sub(col: str, dsub: int, mi: str = "b.mi") -> str:
    """1-based inclusive DuckDB list slice of subspace ``mi``."""
    return f"({col})[({mi} * {dsub} + 1):(({mi} + 1) * {dsub})]"


def _sql_pq_core(books, emb_expr: str = "CAST(e.embedding AS DOUBLE[])",
                 q_expr: str = "CAST(q.embedding AS DOUBLE[])",
                 emb_src: str = "embeddings e",
                 q_src: str = "q") -> str:
    """Shared CTE block: codes (per-row subspace argmin) + lut (per-query
    subspace dot) + scored (ordered sequential ADC fold)."""
    dsub = books.shape[2]
    values = _books_values(books)
    return f"""
books(mi, code, v) AS (VALUES
    {values}),
codes AS (
  SELECT vec_id, mi, code FROM (
    SELECT e.vec_id, b.mi, b.code,
           row_number() OVER (PARTITION BY e.vec_id, b.mi
             ORDER BY {_sql_l2(_sql_sub(emb_expr, dsub), 'b.v')} ASC,
                      b.code ASC) AS rn
    FROM {emb_src} CROSS JOIN books b)
  WHERE rn = 1
),
lut AS (
  SELECT q.query_id, b.mi, b.code,
         list_dot_product(b.v, {_sql_sub(q_expr, dsub)}) AS val
  FROM {q_src} q CROSS JOIN books b
),
scored AS (
  SELECT l.query_id, c.vec_id,
         list_aggregate(list(l.val ORDER BY l.mi), 'sum') AS score
  FROM codes c JOIN lut l ON l.mi = c.mi AND l.code = c.code
  GROUP BY l.query_id, c.vec_id
)"""


def _pq_adc_oracle() -> str:
    core = _sql_pq_core(_oracle_pq_books())
    return f"""
WITH q AS ({_SQL_QUERIES}),
{core}
SELECT query_id, vec_id, score, rank FROM (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {K}
"""


_SQL_RESCORE_TOPK = f"""
rescored AS (
  SELECT c.query_id, c.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                          CAST(q.embedding AS DOUBLE[])) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q ON q.query_id = c.query_id
)
SELECT query_id, vec_id, score, rank FROM (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM rescored)
WHERE rank <= {K}
"""


def _pq_refine_oracle() -> str:
    core = _sql_pq_core(_oracle_pq_books())
    return f"""
WITH q AS ({_SQL_QUERIES}),
{core},
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, vec_id ASC) AS r
    FROM scored)
  WHERE r <= {_PQ_REFINE_K}
),
{_SQL_RESCORE_TOPK}
"""


def _oracle_learned_rotation():
    from nano_vectordb_spark.operators import pq as pq_ops2

    return _fit_cached(
        "learned_rotation",
        lambda: pq_ops2.opq_learn_rotation(
            _oracle_train_mat(), m=_PQ_M, nbits=_PQ_NBITS, n_iter=8, seed=SEED
        ),
    )


def _opq_refine_oracle(rotation_fn=None) -> str:
    rot = (rotation_fn or _oracle_pca_rotation)()
    books = _oracle_pq_books(rotation=rot)
    rot_values = ",\n    ".join(
        f"({j}, {_dlist(rot[:, j])})" for j in range(rot.shape[1])
    )
    core = _sql_pq_core(
        books,
        emb_expr="e.rxv",
        q_expr="q.rxv",
        emb_src="rx e",
        q_src="qx",
    )
    return f"""
WITH q0 AS ({_SQL_QUERIES}),
rotc(j, v) AS (VALUES
    {rot_values}),
rx AS (
  SELECT e.vec_id,
         list(list_dot_product(CAST(e.embedding AS DOUBLE[]), r.v)
              ORDER BY r.j) AS rxv
  FROM embeddings e CROSS JOIN rotc r GROUP BY e.vec_id
),
qx AS (
  SELECT q.query_id,
         list(list_dot_product(CAST(q.embedding AS DOUBLE[]), r.v)
              ORDER BY r.j) AS rxv
  FROM q0 q CROSS JOIN rotc r GROUP BY q.query_id
),
{core},
q AS (SELECT query_id, embedding FROM q0),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, vec_id ASC) AS r
    FROM scored)
  WHERE r <= {_PQ_REFINE_K}
),
{_SQL_RESCORE_TOPK}
"""


def _ivfpq_refine_oracle() -> str:
    import numpy as np

    cent = np.asarray(_oracle_centroids_np())
    books = _oracle_pq_books(centroids=cent, nbits=_IVFPQ_NBITS, seed_off=1000)
    dsub = books.shape[2]
    cent_values = ",\n    ".join(
        f"({i}, {_dlist(c)})" for i, c in enumerate(cent)
    )
    books_values = _books_values(books)
    l2_row = _sql_l2("CAST(e.embedding AS DOUBLE[])", "c.centroid")
    l2_q = _sql_l2("CAST(q.embedding AS DOUBLE[])", "c.centroid")
    return f"""
WITH centroids(cluster_id, centroid) AS (VALUES
    {cent_values}),
books(mi, code, v) AS (VALUES
    {books_values}),
q AS ({_SQL_QUERIES}),
assigned AS (
  SELECT vec_id, embedding, cluster_id FROM (
    SELECT e.vec_id, e.embedding, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c)
  WHERE rn = 1
),
resid AS (
  SELECT a.vec_id, a.cluster_id,
         list_transform(list_zip(CAST(a.embedding AS DOUBLE[]), c.centroid),
                        p -> p[1] - p[2]) AS rv
  FROM assigned a JOIN centroids c USING (cluster_id)
),
codes AS (
  SELECT vec_id, cluster_id, mi, code FROM (
    SELECT e.vec_id, e.cluster_id, b.mi, b.code,
           row_number() OVER (PARTITION BY e.vec_id, b.mi
             ORDER BY {_sql_l2(_sql_sub('e.rv', dsub), 'b.v')} ASC,
                      b.code ASC) AS rn
    FROM resid e CROSS JOIN books b)
  WHERE rn = 1
),
probes AS (
  SELECT query_id, cluster_id FROM (
    SELECT q.query_id, c.cluster_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {l2_q} ASC, c.cluster_id ASC) AS rn
    FROM q CROSS JOIN centroids c)
  WHERE rn <= {_IVF_NPROBE}
),
qres AS (
  SELECT p.query_id, p.cluster_id,
         list_transform(list_zip(CAST(q.embedding AS DOUBLE[]), c.centroid),
                        p2 -> p2[1] - p2[2]) AS rv
  FROM probes p
  JOIN centroids c USING (cluster_id)
  JOIN q USING (query_id)
),
lut AS (
  SELECT r.query_id, r.cluster_id, b.mi, b.code,
         {_sql_l2('b.v', _sql_sub('r.rv', dsub))} AS val
  FROM qres r CROSS JOIN books b
),
scored AS (
  SELECT l.query_id, cd.vec_id,
         list_aggregate(list(l.val ORDER BY l.mi), 'sum') AS score
  FROM codes cd
  JOIN lut l ON l.cluster_id = cd.cluster_id
            AND l.mi = cd.mi AND l.code = cd.code
  GROUP BY l.query_id, cd.vec_id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score ASC, vec_id ASC) AS r
    FROM scored)
  WHERE r <= {_PQ_REFINE_K}
),
{_SQL_RESCORE_TOPK}
"""


@register("pq_adc_search", oracle=_pq_adc_oracle)
def pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC scan (reference O27): codes + per-query LUT fold, top-k.
    Oracle: DuckDB re-encodes against the reproduced codebook literals
    and replays the sequential ADC fold — raw ADC scores hash-match."""
    return pq_ops.pq_adc_search(_pq_index(spark, sf_dir), _queries_df(spark, sf_dir), K)


@register("pq_refine_search", oracle=_pq_refine_oracle)
def pq_refine_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ candidates + exact refine (reference Table 19/20 pipeline).
    Oracle replays ADC top-R candidate selection + exact dot rerank."""
    base = load_table(spark, sf_dir, "embeddings")
    return pq_ops.pq_search_refined(
        _pq_index(spark, sf_dir), base, _queries_df(spark, sf_dir), K,
        refine_k=_PQ_REFINE_K,
    )


@register("opq_refine_search", oracle=_opq_refine_oracle)
def opq_refine_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-PQ + refine (reference apps/nvdb_ivfpq_build.cpp:78-91): a
    PCA rotation balances variance across subspaces before PQ; queries
    are rotated at LUT build; refine reranks in the original space.
    Orthonormality preserves dot/L2 ranking semantics. Oracle embeds the
    rotation + codebook literals and replays the whole pipeline."""
    key = ("opq", sf_dir)
    if key not in _INDEX_CACHE:
        base = load_table(spark, sf_dir, "embeddings")
        rot = pq_ops.pca_rotation(base)
        idx = pq_ops.pq_build(base, m=_PQ_M, nbits=_PQ_NBITS, seed=SEED, rotation=rot)
        idx.codes = idx.codes.cache()
        _INDEX_CACHE[key] = idx
    base = load_table(spark, sf_dir, "embeddings")
    return pq_ops.pq_search_refined(
        _INDEX_CACHE[key], base, _queries_df(spark, sf_dir), K,
        refine_k=_PQ_REFINE_K,
    )


@register(
    "opq_learned_refine_search",
    oracle=lambda: _opq_refine_oracle(_oracle_learned_rotation),
)
def opq_learned_refine_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ with the LEARNED rotation (reference trains OPQMatrix,
    apps/nvdb_ivfpq_build.cpp:78-91; algorithm: OPQ-NP alternating
    codebook-fit / orthogonal-Procrustes, Ge et al. CVPR'13) + exact
    refine. The rotation-quality gain over naive subspace splitting is
    demonstrated in tests/test_pq.py on scrambled product-structured
    data (the reference's measured 0.69 -> 0.77 recall delta,
    Performance.md Table 19)."""
    from nano_vectordb_spark.functions import kmeans as km

    key = ("opq_learned", sf_dir)
    if key not in _INDEX_CACHE:
        base = load_table(spark, sf_dir, "embeddings")
        mat = km.collect_train_sample(
            base, "embedding", km.train_rows_for(2**_PQ_NBITS)
        )
        rot = pq_ops.opq_learn_rotation(
            mat, m=_PQ_M, nbits=_PQ_NBITS, n_iter=8, seed=SEED
        )
        idx = pq_ops.pq_build(base, m=_PQ_M, nbits=_PQ_NBITS, seed=SEED, rotation=rot)
        idx.codes = idx.codes.cache()
        _INDEX_CACHE[key] = idx
    base = load_table(spark, sf_dir, "embeddings")
    return pq_ops.pq_search_refined(
        _INDEX_CACHE[key], base, _queries_df(spark, sf_dir), K,
        refine_k=_PQ_REFINE_K,
    )


@register("ivfpq_refine_search", oracle=_ivfpq_refine_oracle)
def ivfpq_refine_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ composite (reference IndexIVFPQ semantics): coarse
    probe -> residual-PQ ADC scan over probed lists only -> exact
    refine. Oracle replays probe, residual encode, ADC candidate
    ranking and exact rerank from centroid + codebook literals. Recall
    ladder in tests/test_ivfpq.py."""
    from nano_vectordb_spark.operators import ivfpq as ivfpq_ops

    key = ("ivfpq", sf_dir)
    if key not in _INDEX_CACHE:
        base = load_table(spark, sf_dir, "embeddings")
        idx = ivfpq_ops.ivfpq_build(
            base, nlist=_IVF_NLIST, m=_PQ_M, nbits=_IVFPQ_NBITS, seed=SEED
        )
        idx.codes = idx.codes.cache()
        _INDEX_CACHE[key] = idx
    base = load_table(spark, sf_dir, "embeddings")
    return ivfpq_ops.ivfpq_search_refined(
        _INDEX_CACHE[key], base, _queries_df(spark, sf_dir), K,
        nprobe=_IVF_NPROBE, refine_k=_PQ_REFINE_K,
    )


# --------------------------------------------------------------------------
# Text analysis (pipeline extensions over `documents`; reference analog O33)
# --------------------------------------------------------------------------

_SQL_TOKS = """
  SELECT doc_id, text, n_chars,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
"""


def _toks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_expr("text")
    )


@register(
    "token_stats",
    oracle=f"""
WITH t AS ({_SQL_TOKS})
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_uniq_tokens,
       n_chars,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) END AS avg_token_len
FROM t
""",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer): totals, distinct, average
    token length per document."""
    d = _toks_df(spark, sf_dir)
    n = F.size("toks")
    sum_len = F.aggregate(
        F.transform("toks", F.length), F.lit(0), lambda a, x: a + x
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq_tokens"),
        "n_chars",
        F.when(n == 0, F.lit(0.0))
        .otherwise(sum_len.cast("double") / n.cast("double"))
        .alias("avg_token_len"),
    )


# BPE-ish pre-tokenizer (GPT-2 family shape, ASCII-restricted so Java
# regex and RE2 split identically): leading-space word / number / punct
# runs. The vocabulary-merge step of real BPE is a lookup, not a split —
# token COUNTS for data curation come from the pre-tokenizer.
_BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


@register(
    "bpe_token_stats",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text, '{_BPE_PATTERN}') AS bpe,
         list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
       CAST(len(bpe) AS INT) AS n_bpe_tokens,
       CAST(len(words) AS INT) AS n_word_tokens,
       CASE WHEN len(words) = 0 THEN 0.0
            ELSE CAST(len(bpe) AS DOUBLE) / CAST(len(words) AS DOUBLE)
       END AS bpe_per_word
FROM t
""",
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex pre-tokenizer next to the
    whitespace count — the fertility ratio (bpe_per_word) is the
    standard curation signal for training-cost estimation."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    words = tx.tokens_expr("text")
    d = docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(words).alias("n_word_tokens"),
    )
    return d.select(
        "doc_id",
        "n_bpe_tokens",
        "n_word_tokens",
        F.when(F.col("n_word_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_word_tokens").cast("double")
        )
        .alias("bpe_per_word"),
    )


def _sql_marker_hits(lang: str) -> str:
    lst = ", ".join(f"'{m}'" for m in tx.LANG_MARKERS[lang])
    return f"CAST(len(list_filter(toks, x -> list_contains([{lst}], x))) AS INT)"


@register(
    "lang_id",
    oracle=f"""
WITH t AS ({_SQL_TOKS}),
h AS (
  SELECT doc_id,
         {_sql_marker_hits("en")} AS en_hits,
         {_sql_marker_hits("de")} AS de_hits,
         {_sql_marker_hits("es")} AS es_hits,
         {_sql_marker_hits("fr")} AS fr_hits
  FROM t
)
SELECT doc_id, en_hits, de_hits, es_hits, fr_hits,
       CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
            WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
            WHEN es_hits >= fr_hits THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM h
""",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID via stopword-marker voting (n-gram heuristic family).
    Note: the synthetic corpus uses the same vocabulary for every lang
    label, so this predicts from content, not the label — the operator
    contract, not label agreement, is what the oracle checks."""
    d = _toks_df(spark, sf_dir)
    hits = {
        lang: tx.marker_hits_expr(F.col("toks"), tx.LANG_MARKERS[lang]).alias(
            f"{lang}_hits"
        )
        for lang in ("en", "de", "es", "fr")
    }
    h = d.select("doc_id", *hits.values())
    return h.select(
        "doc_id",
        "en_hits",
        "de_hits",
        "es_hits",
        "fr_hits",
        tx.lang_pred_expr(
            F.col("en_hits"), F.col("de_hits"), F.col("es_hits"), F.col("fr_hits")
        ).alias("pred_lang"),
    )


_SQL_EN_STOP = ", ".join(f"'{m}'" for m in tx.EN_STOPWORDS)


_SQL_QUALITY = f"""
WITH t AS ({_SQL_TOKS}),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains([{_SQL_EN_STOP}], x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
         CASE WHEN length(lower(text)) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(lower(text)) AS DOUBLE) END AS punct_ratio
  FROM t
)
SELECT doc_id, n_tokens, stopword_ratio, punct_ratio,
       0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 64.0)
         + 0.3 * (1.0 - stopword_ratio)
         + 0.2 * (1.0 - punct_ratio) AS quality
FROM m
"""


@register("quality_score", oracle=_SQL_QUALITY)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length saturation, stopword ratio,
    punctuation ratio, composite score in [0,1]."""
    d = _toks_df(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        tx.stopword_ratio_expr(F.col("toks")).alias("stopword_ratio"),
        tx.punct_ratio_expr("text").alias("punct_ratio"),
        tx.quality_expr(F.col("toks"), "text").alias("quality"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
WITH t AS ({_SQL_TOKS})
SELECT doc_id,
       CAST(list_aggregate(list_transform(toks,
              (x, i) -> (('0x' || substr(md5(x), 1, 7))::BIGINT) * (((i - 1) % 64) + 1)),
            'sum') % {tx.FP_MOD} AS BIGINT) AS fingerprint,
       md5(text) AS content_md5
FROM t
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: position-weighted rolling hash over
    token hashes + exact content md5."""
    d = _toks_df(spark, sf_dir)
    return d.select(
        "doc_id",
        tx.fingerprint_expr(F.col("toks")).alias("fingerprint"),
        F.md5("text").alias("content_md5"),
    )


_CHUNK_CHARS = 120


@register(
    "chunk_fixed",
    oracle=f"""
WITH ex AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(CAST(ceil(length(text) / {_CHUNK_CHARS}.0) AS BIGINT), 1))) AS i
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       substr(text, CAST(i * {_CHUNK_CHARS} + 1 AS INT), {_CHUNK_CHARS}) AS chunk,
       CAST(length(substr(text, CAST(i * {_CHUNK_CHARS} + 1 AS INT), {_CHUNK_CHARS})) AS INT) AS chunk_chars
FROM ex
""",
)
def chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width character chunking (reference O33 chunker, simplified
    to fixed windows; word-boundary variant is chunk_words)."""
    docs = load_table(spark, sf_dir, "documents")
    return text_ops.chunk_fixed(docs, _CHUNK_CHARS)


# DuckDB replay of the greedy word-packing fold: list_reduce carries the
# state as one string — finished chunks joined by chr(30), last segment =
# current chunk (list_reduce has no init value in DuckDB 1.0, so an empty
# state element is prepended). `cur` below is string_split(s, chr(30))[-1].
_SQL_CUR = "string_split(s, chr(30))[-1]"
_SQL_JOINED = f"CASE WHEN {_SQL_CUR} = '' THEN x ELSE {_SQL_CUR} || ' ' || x END"


def _sql_greedy_fold(pieces: str, max_chars: int) -> str:
    """DuckDB replay of greedy_pack_expr over a string-list expression:
    returns the packed chunk list."""
    return (
        f"list_filter(string_split(list_reduce(list_prepend('', {pieces}), "
        f"(s, x) -> CASE WHEN {_SQL_CUR} = '' OR length({_SQL_JOINED}) <= {max_chars} "
        f"THEN substr(s, 1, length(s) - length({_SQL_CUR})) || ({_SQL_JOINED}) "
        f"ELSE s || chr(30) || x END), chr(30)), c -> c <> '')"
    )


_SQL_CHUNK_WORDS = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
folded AS (
  SELECT doc_id, {_sql_greedy_fold('toks', _CHUNK_CHARS)} AS chunks
  FROM toks
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       chunks[CAST(i + 1 AS INT)] AS chunk,
       CAST(length(chunks[CAST(i + 1 AS INT)]) AS INT) AS chunk_chars
FROM (SELECT doc_id, chunks, unnest(range(0, len(chunks))) AS i FROM folded)
"""


@register("chunk_words", oracle=_SQL_CHUNK_WORDS)
def chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy word-boundary chunking <= 120 chars via a native fold
    (reference build_vecbin_chunked.py:189-225). Oracle: the identical
    greedy fold replayed through DuckDB list_reduce; additionally
    verified against a pure-Python reference in tests/test_textops.py."""
    docs = load_table(spark, sf_dir, "documents")
    return text_ops.chunk_words(docs, _CHUNK_CHARS)


# DuckDB replay of hash_embed (operators/textops.py:135): md5-prefix
# token hashes, 1/(pos+1) bucket weights (DuckDB lambda index is
# 1-based = pos+1), sequential per-dim folds, L2 normalize — every step
# bit-identical to the Spark expression form.
_EMBED_DIM = 32


def _sql_embed_ctes(src: str = "chunks") -> str:
    """staged/raw/embedded CTE block replaying hash_embed over a
    (doc_id, chunk_id, chunk, chunk_chars) relation named ``src``."""
    return f"""
staged AS (
  SELECT doc_id, chunk_id, chunk_chars,
         list_transform(list_filter(string_split(chunk, ' '), x -> x <> ''),
           (x, i) -> {{'b': ('0x' || substr(md5(x), 1, 7))::BIGINT % {_EMBED_DIM},
                       'w': 1.0 / i}}) AS buckets
  FROM {src}
),
raw AS (
  SELECT doc_id, chunk_id, chunk_chars,
         list_transform(range(0, {_EMBED_DIM}),
           d -> coalesce(list_aggregate(
             list_transform(buckets,
               s -> CASE WHEN s.b = d THEN s.w ELSE 0.0 END), 'sum'), 0.0)) AS r,
         len(buckets) AS ntoks
  FROM staged
),
embedded AS (
  SELECT doc_id, chunk_id, chunk_chars,
         CASE WHEN ntoks = 0 THEN r
              ELSE list_transform(r, x -> x / sqrt(list_dot_product(r, r)))
         END AS emb
  FROM raw
)"""


_SQL_EMBED_CTES = f"""
chunks AS ({_SQL_CHUNK_WORDS}),
{_sql_embed_ctes('chunks')}"""

_SQL_PIPELINE_CHUNKS_EMBED = f"""
WITH {_SQL_EMBED_CTES}
SELECT doc_id, chunk_id, chunk_chars, {_sql_ser_f32('emb')} AS embedding
FROM embedded
"""


@register("pipeline_chunks_embed", oracle=_SQL_PIPELINE_CHUNKS_EMBED)
def pipeline_chunks_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O33 pipeline end-to-end: documents -> word chunks ->
    deterministic hash-projection embeddings (normalized, dim=32).
    Oracle: the full chunk + hash-embed pipeline replayed in DuckDB
    SQL; invariants (norm==1, determinism) in tests/test_textops.py."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text_ops.chunk_words(docs, _CHUNK_CHARS)
    return text_ops.hash_embed(chunks, dim=32).select(
        "doc_id",
        "chunk_id",
        "chunk_chars",
        _ser_f32_col("embedding").alias("embedding"),
    )


def _csv_docs_path(sf_dir: str) -> str:
    """Content-addressed CSV cache path: keyed by the source parquet's
    (mtime_ns, size), not just sf_dir — the driver regenerates
    /root/testdata between rounds, and a stale /tmp copy written from
    the previous round's documents table must never be reused."""
    import hashlib
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "documents.parquet"))
    key = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    return "/tmp/nvdb_csv_" + hashlib.md5(key.encode()).hexdigest()[:8]


def _csv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from nano_vectordb_spark.sources import csv as csv_src

    path = _csv_docs_path(sf_dir)
    _materialize_once(
        path,
        lambda p: csv_src.write_documents_csv(
            load_table(spark, sf_dir, "documents"), p
        ),
    )
    return csv_src.read_documents_csv(spark, path)


def _jsonl_docs_path(sf_dir: str) -> str:
    """Content-addressed JSONL cache path (same staleness rule as
    _csv_docs_path: keyed by the source parquet's stat so a /tmp copy
    from a previous testdata generation is never reused)."""
    import hashlib
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "documents.parquet"))
    key = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    return "/tmp/nvdb_jsonl_" + hashlib.md5(key.encode()).hexdigest()[:8]


@register(
    "jsonl_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source fidelity (sources/jsonl.py): documents written to
    JSON-lines — the de-facto training-corpus interchange format — and
    read back with the explicit schema must equal the parquet table
    exactly. JSONL escapes newlines/quotes per field, so files stay
    line-splittable (parallel reads at any byte offset), unlike
    multiLine CSV."""
    import os as _os

    from nano_vectordb_spark.sources import jsonl as jsonl_src

    path = _jsonl_docs_path(sf_dir)
    _materialize_once(
        path,
        lambda p: jsonl_src.write_documents_jsonl(
            load_table(spark, sf_dir, "documents"), p
        ),
    )
    return jsonl_src.read_documents_jsonl(spark, path).orderBy("doc_id")


@register(
    "csv_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source fidelity (the reference pipeline's ingest format, O33
    build_vecbin_chunked.py:312-368): documents written to RFC-4180 CSV
    and read back with the explicit schema must equal the parquet table
    byte-for-byte — quoting, embedded newlines, and types all survive."""
    return _csv_docs(spark, sf_dir).orderBy("doc_id")


# DuckDB replay of the CSV ingest pipeline. The CSV copy is
# byte-identical to the documents table (csv_roundtrip is hash-checked)
# so the oracle reads documents directly. RE2 has no lookbehind, so the
# sentence split '(?<=[.!?])\s+' is replayed as replace-then-split
# (punct + whitespace -> punct + US separator) — identical boundaries.
_SQL_CSV_CHUNKS_EMBED = f"""
WITH sec AS (
  SELECT doc_id, source,
         unnest(list_filter(list_transform(
           regexp_split_to_array(text, '(?m)^#{{1,6}}\\s+'),
           p -> regexp_replace(p, '^\\s+|\\s+$', '', 'g')), p -> p <> '')) AS section
  FROM documents
),
sent AS (
  SELECT doc_id,
         list_filter(list_transform(
           string_split(
             regexp_replace(concat_ws(chr(10), source, '[SECTION]', section),
                            '([.!?])\\s+', '\\1' || chr(31), 'g'),
             chr(31)),
           x -> trim(x)), x -> x <> '') AS sentences
  FROM sec
),
folded AS (
  SELECT doc_id, {_sql_greedy_fold('sentences', _CHUNK_CHARS * 2)} AS chunks
  FROM sent
),
cchunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_id,
         chunks[CAST(i + 1 AS INT)] AS chunk,
         CAST(length(chunks[CAST(i + 1 AS INT)]) AS INT) AS chunk_chars
  FROM (SELECT doc_id, chunks, unnest(range(0, len(chunks))) AS i FROM folded)
),
{_sql_embed_ctes('cchunks')}
SELECT doc_id, chunk_id, chunk_chars, {_sql_ser_f32('emb')} AS embedding
FROM embedded
"""


@register("csv_chunks_embed", oracle=_SQL_CSV_CHUNKS_EMBED)
def csv_chunks_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL O33 ingest pipeline from the CSV entry point: CSV ->
    regex section split -> sentence-aware chunking -> '{source}
    [SECTION] {chunk}' formatting (build_vecbin_chunked.py:144-300) ->
    normalized hash embeddings. Oracle: the pipeline replayed in DuckDB
    over the documents table (the CSV is a proven byte-exact roundtrip
    of it); chunker semantics also tested in tests/test_textops.py."""
    docs = _csv_docs(spark, sf_dir)
    sections = text_ops.split_sections(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    chunks = text_ops.chunk_sentences(
        sections.withColumn(
            "text",
            F.concat_ws("\n", "source", F.lit("[SECTION]"), "section"),
        ),
        _CHUNK_CHARS * 2,
    )
    return text_ops.hash_embed(chunks, dim=32, text_col="chunk").select(
        "doc_id",
        "chunk_id",
        "chunk_chars",
        _ser_f32_col("embedding").alias("embedding"),
    )


# --------------------------------------------------------------------------
# Deduplication family (north-star extension; exact + MinHash-LSH +
# SimHash + n-gram Jaccard + embedding cosine)
# --------------------------------------------------------------------------

_JACCARD_T = 0.2
# Hamming threshold chosen from the corpus: planted near-dups land at
# hamming 0-2 under 32-bit SimHash while the background (shared small
# vocabulary) floods in from <=3 up — 2 keeps 24/25 planted pairs.
_SIMHASH_T = 2
# 64-bit: planted near-dups sit at hamming 0-3; background floods from
# ~4 up (measured ladder at sf0.001: 19 pairs <=2, 50 <=3, 148 <=4)
_SIMHASH64_T = 3
_COS_T = 0.4

def _sql_shingles(source: str = "documents") -> str:
    return f"""
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM {source})
  WHERE len(toks) >= 3
"""


_SQL_SHINGLES = _sql_shingles()


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_md5,
       min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup: one shuffle on a 16-byte key; the kept
    row is the minimum doc_id per group."""
    return dedup_ops.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH sh AS ({_SQL_SHINGLES}),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / CAST(len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT a_id, b_id, jaccard FROM pairs WHERE jaccard >= {_JACCARD_T}
""",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via the shingle inverted-
    index join (scales with posting lists, not N^2; the oracle computes
    the same exact semantics all-pairs)."""
    return dedup_ops.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), _JACCARD_T
    )


def _sql_minhash_base(source: str = "documents") -> str:
    """Shared CTE prefix: shingles -> token hashes -> 16-slot MinHash
    signature -> 4-band table (identical constants to
    operators/dedup.py)."""
    perms = dedup_ops.minhash_perms(16)
    p = dedup_ops.MINHASH_P
    mins = ",\n         ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {p})) AS m{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bi} AS band_id, "
        + " || '_' || ".join(f"CAST(m{bi * 4 + r} AS VARCHAR)" for r in range(4))
        + " AS band_sig FROM sig"
        for bi in range(4)
    )
    return f"""sh AS ({_sql_shingles(source)}),
hs AS (
  SELECT doc_id,
         list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hs
),
banded AS (
{band_selects}
)"""


def _sql_minhash_lsh(source: str = "documents") -> str:
    return f"""
WITH {_sql_minhash_base(source)},
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.a_id, c.b_id,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / CAST(len(sa.shingles) + len(sb.shingles)
                  - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
)
SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= {_JACCARD_T}
"""


@register("minhash_lsh_pairs", oracle=_sql_minhash_lsh())
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 4-band LSH candidates, exact-Jaccard verified.
    The oracle runs the identical algorithm (same permutation
    constants), so candidate sets match exactly. The built plan (with
    its persisted shingle+signature base) is memoized per sf_dir so
    repeat invocations reuse one cache instead of stacking persists."""
    key = ("minhash_lsh", sf_dir)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = dedup_ops.minhash_lsh_pairs(
            load_table(spark, sf_dir, "documents"), _JACCARD_T
        )
    return _INDEX_CACHE[key]


def _sql_corpus_release() -> str:
    clean = _sql_corpus_clean()
    return f"""
WITH cleaned AS ({clean}),
assigned AS (
  SELECT doc_id, n_tokens,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, n_tokens,
               ('0x' || substr(md5('split0:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 AS bucket
        FROM cleaned)
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_md5
FROM assigned
GROUP BY split
"""


@register("corpus_release", oracle=_sql_corpus_release)
def corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition a dataset release runs end-to-end:
    quality filter -> language filter -> exact dedup -> near-dup
    removal (all of corpus_clean) -> deterministic train/val/test
    assignment -> per-split counts, token totals, and an md5 over the
    ordered surviving ids. Every stage is an oracle-matched primitive,
    so the release manifest itself hash-matches — membership of each
    split is proven, not sampled."""
    cleaned = corpus_clean(spark, sf_dir)
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split0:"), F.col("doc_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    assigned = cleaned.select(
        "doc_id",
        "n_tokens",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list(F.col("doc_id"))).cast("array<string>"), ",")
        ).alias("ids_md5"),
    )


_SPLIT_SEED = "split0"

_SQL_DATA_SPLIT = f"""
WITH assigned AS (
  SELECT doc_id, n_chars,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, n_chars,
               ('0x' || substr(md5('{_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 AS bucket
        FROM documents)
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_md5
FROM assigned
GROUP BY split
"""


@register("data_split", oracle=_SQL_DATA_SPLIT)
def data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by keyed md5 of the
    doc id — stable under corpus growth (a doc's split never changes
    when other docs arrive), reproducible in any engine, no RNG. The
    md5 over the ordered id list proves the exact membership of every
    split, not just its size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{_SPLIT_SEED}:"), F.col("doc_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    assigned = docs.select(
        "doc_id",
        "n_chars",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list(F.col("doc_id"))).cast("array<string>"), ",")
        ).alias("ids_md5"),
    )


_SQL_BIGRAM_COMMONNESS = f"""
WITH t AS ({_SQL_TOKS}),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t WHERE len(toks) >= 2
),
counts AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY bg)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(min(c.c) AS BIGINT) AS min_freq,
       CAST(sum(c.c) AS DOUBLE) / count(*) AS avg_freq
FROM bg b JOIN counts c USING (bg)
GROUP BY b.doc_id
"""


@register("bigram_commonness", oracle=_SQL_BIGRAM_COMMONNESS)
def bigram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistical fluency signal: per document, how common its
    word bigrams are in the corpus (count of bigrams, rarest-bigram
    frequency, average frequency) — the cheap stand-in for LM
    perplexity filtering that needs no model. Deliberately built on
    integer sums (exact in any order) plus one IEEE division, never a
    float log whose libm rounding differs across engines. Scale shape:
    explode -> count (map-side partial) -> posting join on the bigram,
    like every inverted-index op here."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tx.tokens_expr("text")
    big = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(element_at(toks, i), ' ',"
                    " element_at(toks, i + 1)))"
                )
            ).alias("bg"),
        )
    )
    counts = big.groupBy("bg").agg(F.count("*").alias("c"))
    return (
        big.join(counts, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.min("c").alias("min_freq"),
            (F.sum("c").cast("double") / F.count("*")).alias("avg_freq"),
        )
    )


_UPSERT_MOD = 7

_SQL_UPSERT = f"""
WITH base AS (
  SELECT doc_id, text, lang, source, 1 AS version FROM documents
),
updates AS (
  SELECT doc_id, text || ' [v2]' AS text, lang, source, 2 AS version
  FROM documents WHERE doc_id % {_UPSERT_MOD} = 0
),
merged AS (
  SELECT * FROM base UNION ALL SELECT * FROM updates
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
  FROM merged
)
SELECT doc_id, md5(text) AS text_md5, lang, source,
       CAST(version AS INT) AS version
FROM ranked WHERE rn = 1
"""


@register("corpus_upsert", oracle=_SQL_UPSERT)
def corpus_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus refresh by last-write-wins upsert: a batch of updated
    documents (doc_id % {_UPSERT_MOD} == 0, text amended) merges into
    the corpus, newest version winning per doc_id — the SCD-style merge
    every corpus snapshot pipeline runs. Scale shape: union + one
    shuffle on doc_id (window rank), no join; the text md5 in the
    output proves exactly which version survived."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", "lang", "source", F.lit(1).alias("version")
    )
    updates = docs.filter(F.col("doc_id") % _UPSERT_MOD == 0).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" [v2]")).alias("text"),
        "lang",
        "source",
        F.lit(2).alias("version"),
    )
    merged = base.unionByName(updates)
    w = Window.partitionBy("doc_id").orderBy(F.col("version").desc())
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            "lang",
            "source",
            F.col("version").cast("int").alias("version"),
        )
    )


_VOCAB_TOP = 100

_SQL_VOCAB = f"""
WITH t AS ({_SQL_TOKS}),
terms AS (SELECT doc_id, unnest(toks) AS term FROM t),
agg AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM terms GROUP BY term
)
SELECT term, n_occurrences, n_docs,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, term ASC) AS INT) AS rank
FROM agg
ORDER BY n_occurrences DESC, term ASC
LIMIT {_VOCAB_TOP}
"""


@register("vocab_top_terms", oracle=_SQL_VOCAB)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-{_VOCAB_TOP} terms by occurrence count
    with document frequency — the input a tokenizer-training or
    stopword-selection pass needs. Scale shape: explode -> hash
    aggregate (count partials map-side before the term shuffle), then
    a TakeOrdered top-k; the full vocabulary never sorts globally.
    Window rank over {_VOCAB_TOP} surviving rows is driver-trivial."""
    docs = load_table(spark, sf_dir, "documents")
    agg = (
        docs.select(F.explode(tx.tokens_expr("text")).alias("term"), "doc_id")
        .groupBy("term")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(_VOCAB_TOP)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
    return agg.withColumn("rank", F.row_number().over(w))


_SQL_TEXT_NORM = """
SELECT doc_id,
       md5(norm) AS norm_md5,
       CAST(length(norm) AS BIGINT) AS n_chars_norm
FROM (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')) AS norm
  FROM documents
)
"""


@register("text_normalize", oracle=_SQL_TEXT_NORM)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (corpus-cleaning stage): lowercase, collapse
    all whitespace runs to one space, trim. Pure native expressions —
    zero shuffle, whole-stage codegen; the md5 of the normalized text
    proves byte-identical output across engines without shipping the
    text column through the gate."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[ \t\n\r]+", " ")
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


_MMR_POOL = 50

_SQL_MMR = f"""
WITH RECURSIVE
q AS ({_SQL_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                          CAST(q.embedding AS DOUBLE[])) AS score
  FROM embeddings e CROSS JOIN q
),
cand AS (
  SELECT query_id, vec_id, score FROM (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, vec_id ASC) AS rn
    FROM scored) WHERE rn <= {_MMR_POOL}
),
norms AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> x / sqrt(list_aggregate(
             list_transform(CAST(embedding AS DOUBLE[]), y -> y * y),
             'sum'))) AS en
  FROM embeddings
),
cn AS (
  SELECT c.query_id, c.vec_id, c.score, n.en
  FROM cand c JOIN norms n USING (vec_id)
),
sel(query_id, step, vec_id, score, selected) AS (
  SELECT query_id, 1, vec_id, score, [vec_id]
  FROM (SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rn
        FROM cn) WHERE rn = 1
  UNION ALL
  SELECT s.query_id, s.step + 1, pick.vec_id, pick.score,
         list_append(s.selected, pick.vec_id)
  FROM sel s, LATERAL (
    SELECT c.vec_id, c.score
    FROM cn c
    WHERE c.query_id = s.query_id
      AND NOT list_contains(s.selected, c.vec_id)
    ORDER BY 0.5 * c.score - 0.5 * (
        SELECT max(list_dot_product(c.en, c2.en))
        FROM cn c2
        WHERE c2.query_id = s.query_id
          AND list_contains(s.selected, c2.vec_id)
      ) DESC, c.vec_id ASC
    LIMIT 1) pick
  WHERE s.step < {K}
)
SELECT query_id, vec_id, score, CAST(step AS INT) AS mmr_rank FROM sel
"""


@register("topk_mmr", oracle=_SQL_MMR)
def topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified search: MMR rerank (operators/rerank.py) of the
    two-phase top-{_MMR_POOL} candidate head down to {K} results per
    query with lambda=0.5 (exact dyadic — no decimal-literal rounding
    risk). The greedy is driver-side NumPy over the head only — zero
    extra Spark jobs, like IVF probing — and the oracle replays every
    selection decision in a DuckDB recursive CTE with LATERAL argmax,
    bit-exact thanks to sequential-fold dots and per-element
    normalization."""
    return rerank_ops.mmr_rerank(
        load_table(spark, sf_dir, "embeddings"),
        _queries_df(spark, sf_dir),
        K,
        pool=_MMR_POOL,
    )


_CM_TOP = 20

_SQL_HEAVY_HITTERS = f"""
WITH t AS ({_SQL_TOKS}),
terms AS (SELECT unnest(toks) AS term FROM t),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM terms GROUP BY term),
rows_(r) AS (VALUES (0), (1), (2), (3)),
cells AS (
  SELECT r.r AS row,
         CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || term), 1, 7))::BIGINT
              % 1024 AS INT) AS bucket,
         CAST(sum(n) AS BIGINT) AS n
  FROM tc, rows_ r
  GROUP BY 1, 2
),
top AS (SELECT term, n AS true_n FROM tc ORDER BY n DESC, term ASC LIMIT {_CM_TOP}),
lk AS (
  SELECT term, true_n, r.r AS row,
         CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || term), 1, 7))::BIGINT
              % 1024 AS INT) AS bucket
  FROM top, rows_ r
)
SELECT lk.term, lk.true_n, CAST(min(c.n) AS BIGINT) AS est_n,
       CAST(min(c.n) - lk.true_n AS BIGINT) AS overcount
FROM lk JOIN cells c ON c.row = lk.row AND c.bucket = lk.bucket
GROUP BY lk.term, lk.true_n
"""


@register("heavy_hitters_cm", oracle=_SQL_HEAVY_HITTERS)
def heavy_hitters_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (operators/sketch.cm_sketch): the
    mergeable frequency summary next to the HLL distinct sketch. The
    sketch is at most depth x width cells built from map-side-partial
    term counts; per-partition (or per-day) sketches merge by cell-wise
    addition without rescanning, and point estimates never
    underestimate (overcount >= 0 by construction). md5 bucket
    arithmetic makes the whole sketch — and every estimate — replayable
    in DuckDB exactly."""
    from nano_vectordb_spark.operators import sketch as sketch_ops

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(tx.tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    sk = sketch_ops.cm_sketch(tc)
    top = tc.orderBy(F.col("n").desc(), F.col("term").asc()).limit(_CM_TOP)
    est = sketch_ops.cm_estimate(sk, top.select("term"))
    return top.withColumnRenamed("n", "true_n").join(est, "term").select(
        "term",
        "true_n",
        "est_n",
        (F.col("est_n") - F.col("true_n")).alias("overcount"),
    )


_INCR_MOD = 10  # doc_id % 10 == 0 stands in for the incoming batch


def _sql_minhash_incremental() -> str:
    return f"""
WITH {_sql_minhash_base()},
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
   AND a.doc_id % {_INCR_MOD} = 0 AND b.doc_id % {_INCR_MOD} <> 0
),
verified AS (
  SELECT c.new_id, c.corpus_id,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / CAST(len(sa.shingles) + len(sb.shingles)
                  - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.new_id
  JOIN sh sb ON sb.doc_id = c.corpus_id
)
SELECT new_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_corpus_dups,
       max(jaccard) AS max_jaccard
FROM verified WHERE jaccard >= {_JACCARD_T}
GROUP BY new_id
"""


@register("dedup_incremental", oracle=_sql_minhash_incremental())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: flag incoming-batch docs (doc_id %
    {_INCR_MOD} == 0 stands in for the new batch) that near-duplicate
    the existing corpus (operators/dedup.minhash_lsh_incremental).
    The production shape for continuous ingestion: only batch x corpus
    candidates are generated — the corpus band table is built once and
    persisted alongside the corpus, so per-ingest cost scales with the
    batch, not the corpus."""
    key = ("dedup_incremental", sf_dir)
    if key not in _INDEX_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        batch = docs.filter(F.col("doc_id") % _INCR_MOD == 0)
        corpus = docs.filter(F.col("doc_id") % _INCR_MOD != 0)
        # memoized like minhash_lsh_pairs: the op persists its two
        # signature DataFrames, so re-running the entry per gate/bench
        # invocation would re-persist both sides and leak cached blocks
        _INDEX_CACHE[key] = dedup_ops.minhash_lsh_incremental(
            corpus, batch, _JACCARD_T
        )
    return _INDEX_CACHE[key]


# component = min reachable id; DuckDB walks the transitive closure
# recursively (fine at oracle scale), Spark runs log-diameter
# min-label propagation (operators/components.py)
_SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({_sql_minhash_lsh()}),
e AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
walk(id, r) AS (
  SELECT s, d FROM e
  UNION
  SELECT w.id, e2.d FROM walk w JOIN e e2 ON w.r = e2.s
),
comp AS (
  SELECT id, least(id, min(r)) AS component FROM walk GROUP BY id
),
sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS group_size
  FROM comp GROUP BY component
)
SELECT CAST(c.id AS BIGINT) AS id, CAST(c.component AS BIGINT) AS component,
       s.group_size, c.id = c.component AS keep
FROM comp c JOIN sizes s USING (component)
"""


@register("dedup_components", oracle=_SQL_DEDUP_COMPONENTS)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP resolution: MinHash-LSH pairs -> connected
    components -> one keeper per cluster. Duplicates are transitive,
    so corpus cleaning must decide keep/drop per component, not per
    pair (pairwise removal over-deletes or leaves transitive dups).
    Spark side: log-diameter min-label propagation with pointer
    jumping over the label table (operators/components.py); oracle
    walks the same graph's transitive closure with a recursive CTE."""
    edges = minhash_lsh_pairs(spark, sf_dir)
    return comp_ops.dedup_groups(edges)


def _sql_simhash_pairs() -> str:
    bit_sums = ",\n         ".join(
        f"list_aggregate(list_transform(th, h -> CASE WHEN (h >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END), 'sum') AS s{j}"
        for j in range(32)
    )
    val = " + ".join(f"CASE WHEN s{j} > 0 THEN {2**j}::BIGINT ELSE 0 END" for j in range(32))
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
th AS (
  SELECT doc_id,
         list_transform(toks, x ->
           ((('0x' || substr(md5(x), 1, 7))::BIGINT * 2654435761 + 40503) % 4294967296)) AS th
  FROM t WHERE len(toks) > 0
),
sums AS (
  SELECT doc_id,
         {bit_sums}
  FROM th
),
sh AS (SELECT doc_id, {val} AS simhash FROM sums)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_T}
"""


def _sql_simhash64_pairs() -> str:
    halves = []
    for name, (c1, c2) in zip(("hi", "lo"), dedup_ops._SIMHASH64_CONSTS):
        bit_sums = ",\n         ".join(
            f"list_aggregate(list_transform(th_{name}, h -> CASE WHEN (h >> {j}) & 1 = 1 "
            f"THEN 1 ELSE -1 END), 'sum') AS s_{name}{j}"
            for j in range(32)
        )
        val = " + ".join(
            f"CASE WHEN s_{name}{j} > 0 THEN {2**j}::BIGINT ELSE 0 END"
            for j in range(32)
        )
        halves.append((name, c1, c2, bit_sums, val))
    th_cols = ",\n         ".join(
        f"list_transform(toks, x -> ((('0x' || substr(md5(x), 1, 7))::BIGINT "
        f"* {c1} + {c2}) % 4294967296)) AS th_{name}"
        for name, c1, c2, _, _ in halves
    )
    all_sums = ",\n         ".join(h[3] for h in halves)
    all_vals = ", ".join(f"{h[4]} AS sim_{h[0]}" for h in halves)
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
th AS (
  SELECT doc_id,
         {th_cols}
  FROM t WHERE len(toks) > 0
),
sums AS (
  SELECT doc_id,
         {all_sums}
  FROM th
),
sh AS (SELECT doc_id, {all_vals} FROM sums)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.sim_hi, b.sim_hi))
            + bit_count(xor(a.sim_lo, b.sim_lo)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo))
      <= {_SIMHASH64_T}
"""


@register("simhash64_pairs", oracle=_sql_simhash64_pairs())
def simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs at hamming <= 3 — the real-corpus
    variant (32 bits saturates once shared-vocabulary collections grow
    past ~2^16 docs; measured here: t=3 admits 50 pairs at sf0.001 vs
    901 for 32-bit t=2). Spark generates candidates with the 16-nibble
    band join (exact for hamming <= 15 by pigeonhole); the oracle
    checks all pairs — identical result sets."""
    return dedup_ops.simhash64_pairs(
        load_table(spark, sf_dir, "documents"), _SIMHASH64_T
    )


@register("simhash_pairs", oracle=_sql_simhash_pairs())
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash near-dup pairs at hamming <= 2. Spark generates
    pairs with the 8-nibble band join (exact for hamming <= 7 by
    pigeonhole); the oracle checks all pairs — identical result sets."""
    return dedup_ops.simhash_pairs(load_table(spark, sf_dir, "documents"), _SIMHASH_T)


@register(
    "embedding_neardup_pairs",
    oracle=f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {_COS_T}
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (cosine == dot on the
    normalized table). Brute-force all-pairs VERIFICATION baseline —
    guarded to verification scale (operator raises beyond 20k rows);
    the default path at scale is embedding_neardup_lsh."""
    return dedup_ops.embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), _COS_T
    )


def _lsh_oracle() -> str:
    """DuckDB replay of the hyperplane-LSH near-dup path: the seeded
    hyperplanes are embedded as literals; sign-band blocking, candidate
    join and exact cosine verify re-run in SQL. This makes the SCALE
    path the oracle-checked one (the brute-force all-pairs sibling is
    the sf-small verification baseline)."""
    import numpy as np
    import pyarrow.parquet as papq

    n_planes, bands, seed = 16, 4, 42
    rpb = n_planes // bands
    tbl = papq.read_table(f"{_ORACLE_SF}/embeddings.parquet", columns=["embedding"])
    dim = len(tbl.column("embedding")[0])
    planes = np.random.default_rng(seed).normal(size=(n_planes, dim))
    values = ",\n    ".join(f"({i}, {_dlist(p)})" for i, p in enumerate(planes))
    return f"""
WITH planes(plane_id, v) AS (VALUES
    {values}),
bits AS (
  SELECT e.vec_id, p.plane_id,
         CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.v) > 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
bands AS (
  SELECT vec_id, plane_id // {rpb} AS band_id,
         string_agg(CAST(bit AS VARCHAR), '' ORDER BY plane_id) AS band_sig
  FROM bits GROUP BY vec_id, plane_id // {rpb}
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
             AND a.vec_id < b.vec_id
)
SELECT c.a_id, c.b_id,
       list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                        CAST(eb.embedding AS DOUBLE[])) AS cos_sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.a_id
JOIN embeddings eb ON eb.vec_id = c.b_id
WHERE list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                       CAST(eb.embedding AS DOUBLE[])) >= {_COS_T}
"""


@register("embedding_neardup_lsh", oracle=_lsh_oracle)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH blocking + exact verify — THE default
    embedding near-dup path at scale (banded candidate join, never
    N^2). Oracle: DuckDB replays blocking + verify against the seeded
    hyperplane literals. Probabilistic recall, exact precision; the
    subset relation vs brute force is tested in tests/test_dedup.py."""
    return dedup_ops.embedding_neardup_lsh(
        load_table(spark, sf_dir, "embeddings"), _COS_T
    )


_QUALITY_T = 0.75


def _sql_corpus_clean() -> str:
    quality = (
        "0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 64.0) "
        "+ 0.3 * (1.0 - stopword_ratio) + 0.2 * (1.0 - punct_ratio)"
    )
    return f"""
WITH t AS ({_SQL_TOKS}),
m AS (
  SELECT doc_id, text,
         CAST(len(toks) AS INT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains([{_SQL_EN_STOP}], x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
         CASE WHEN length(lower(text)) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(lower(text)) AS DOUBLE) END AS punct_ratio,
         {_sql_marker_hits("en")} AS en_hits,
         {_sql_marker_hits("de")} AS de_hits,
         {_sql_marker_hits("es")} AS es_hits,
         {_sql_marker_hits("fr")} AS fr_hits
  FROM t
),
s AS (
  SELECT doc_id, text, n_tokens, {quality} AS quality,
         CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
              WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
              WHEN es_hits >= fr_hits THEN 'es'
              ELSE 'fr' END AS pred_lang
  FROM m
),
f AS (
  SELECT doc_id, text, n_tokens, quality FROM s
  WHERE quality >= {_QUALITY_T} AND pred_lang = 'en'
),
u AS (
  SELECT * FROM f
  WHERE doc_id IN (SELECT min(doc_id) FROM f GROUP BY md5(text))
),
pairs AS ({_sql_minhash_lsh("u")})
SELECT doc_id, n_tokens, quality FROM u
WHERE doc_id NOT IN (SELECT b_id FROM pairs)
ORDER BY doc_id
"""


@register("corpus_clean", oracle=_sql_corpus_clean())
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning — the composition a 100 TB
    pre-training pipeline actually runs: quality filter -> language
    filter -> exact dedup -> MinHash-LSH near-dup removal (drop the
    higher doc_id of each verified pair). Every stage reuses an
    oracle-matched primitive, so the whole pipeline hash-matches.

    Scale shape: the filters are scan-local (no shuffle); exact dedup is
    one shuffle on a 16-byte hash; LSH is the banded shuffle from
    minhash_lsh_pairs; the final removals are a broadcast anti-join."""
    d = _toks_df(spark, sf_dir)
    hits = {
        lang: tx.marker_hits_expr(F.col("toks"), tx.LANG_MARKERS[lang])
        for lang in ("en", "de", "es", "fr")
    }
    scored = d.select(
        "doc_id",
        "text",
        F.size("toks").alias("n_tokens"),
        tx.quality_expr(F.col("toks"), "text").alias("quality"),
        tx.lang_pred_expr(
            hits["en"], hits["de"], hits["es"], hits["fr"]
        ).alias("pred_lang"),
    )
    filt = scored.filter(
        (F.col("quality") >= _QUALITY_T) & (F.col("pred_lang") == "en")
    ).drop("pred_lang")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # uniq feeds BOTH the LSH pair generation and the final anti-join:
    # persist so the filter/dedup pipeline runs once
    uniq = (
        filt.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .persist()
    )
    pairs = dedup_ops.minhash_lsh_pairs(uniq.select("doc_id", "text"), _JACCARD_T)
    removed = pairs.select(F.col("b_id").alias("doc_id")).distinct()
    return (
        uniq.join(F.broadcast(removed), "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "quality")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Metrics aggregation (reference O18/O19) + relational/window coverage
# (SURVEY.md §2.2 categories; events.value stands in for per-query
# latency, as FIXTURES.md F8 specifies)
# --------------------------------------------------------------------------


@register(
    "latency_percentiles",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99,
       round(avg(value), 6) AS avg_ms,
       round(count(*) / (round(avg(value), 6) * count(*) / 1000.0), 6) AS qps
FROM events
GROUP BY event_type
""",
)
def latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency stats per run group (reference O18): exact interpolated
    percentiles, avg, QPS."""
    ev = load_table(spark, sf_dir, "events")
    return metrics_ops.latency_stats(ev, "value", ["event_type"])


@register(
    "doc_length_percentiles",
    oracle="""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n,
       quantile_cont(n_chars, 0.5) AS p50,
       quantile_cont(n_chars, 0.9) AS p90,
       quantile_cont(n_chars, 0.99) AS p99,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang, source
""",
)
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: exact interpolated percentiles of
    document length per (lang, source) — the distribution report a
    curation pass uses to pick length filters. Same O18 percentile
    machinery generalized off the latency column; interpolation is
    (1-f)*a + f*b on sorted integers in both engines, so the doubles
    hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    pct = F.percentile("n_chars", F.lit([0.5, 0.9, 0.99]))
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n"),
            pct.alias("__pct"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "lang",
            "source",
            "n",
            F.col("__pct")[0].alias("p50"),
            F.col("__pct")[1].alias("p90"),
            F.col("__pct")[2].alias("p99"),
            "min_chars",
            "max_chars",
        )
    )


def _sql_view_query(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    from nano_vectordb_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(sql)


# TPC-H Q1 shape: float money is summed in DECIMAL (exact, order-
# independent) and cast to double at the end so both engines emit the
# same doubles regardless of aggregation order.
_SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS count_order,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3))) * (CAST(1.0 AS DECIMAL(18,3)) + CAST(l_tax AS DECIMAL(18,3)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_discount AS DECIMAL(18,3))) AS DOUBLE) AS sum_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_SQL_PRICING_SUMMARY)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational aggregation coverage (TPC-H Q1 shape): multi-key
    groupBy with exact decimal money sums."""
    return _sql_view_query(spark, sf_dir, _SQL_PRICING_SUMMARY)


_SQL_TOP_REVENUE = """
SELECT c.c_custkey, c.c_name,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l.l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


@register("top_revenue_customers", oracle=_SQL_TOP_REVENUE)
def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join coverage (TPC-H Q3 family): 3-way join, grouped exact money
    sum, deterministic top-10. Catalyst broadcasts the dimension side."""
    return _sql_view_query(spark, sf_dir, _SQL_TOP_REVENUE)


_SQL_SHIPPING_PRIORITY = """
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l.l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


@register("shipping_priority", oracle=_SQL_SHIPPING_PRIORITY)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 on the driver tables (o_orderpriority stands in for the
    missing o_shippriority): selective dimension filter -> 3-way join ->
    agg -> top-n, written with the DataFrame API and explicit broadcasts
    — the 100 TB plan: lineitem never shuffles for the join (both other
    sides broadcast after their filters), the date predicates push down
    to the parquet scans, and the top-n is TakeOrderedAndProject over a
    partial agg (asserted in tests/test_plans.py)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0).cast("decimal(18,3)") - F.col("l_discount").cast("decimal(18,3)")
    )
    joined = li.join(
        F.broadcast(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        ),
        li.l_orderkey == orders.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# the running sum accumulates in DECIMAL: windowed float sums are
# engine-order-dependent (DuckDB uses segment trees), decimal is exact
_SQL_EVENTS_RUNNING = """
SELECT user_id, ts, event_type,
       CAST(row_number() OVER w AS INT) AS seq,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("events_running_window", oracle=_SQL_EVENTS_RUNNING)
def events_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: per-user ordered sequence numbers and a
    running sum (sequential accumulation — deterministic)."""
    return _sql_view_query(spark, sf_dir, _SQL_EVENTS_RUNNING)


_SQL_SESSIONIZE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess
GROUP BY user_id, session_id
"""


@register("events_sessionize", oracle=_SQL_SESSIONIZE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gaps via lag + running sum —
    the batch shape of the streaming session-window operator."""
    from nano_vectordb_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN ts - lag(ts) OVER w > INTERVAL '30' MINUTE THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess
GROUP BY user_id, session_id
"""
    )


_SQL_SEMI_ANTI = """
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM customer c
     WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
  (SELECT CAST(count(*) AS BIGINT) FROM customer c
     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders,
  (SELECT CAST(count(*) AS BIGINT) FROM part p
     WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)) AS n_parts_sold
"""


_SQL_ASOF = """
SELECT e.event_id, e.user_id, e.ts, p.ts AS asof_ts, p.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'click') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


@register("events_asof_purchase", oracle=_SQL_ASOF)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click joined to the user's most recent purchase
    at or before it (operators/asof.py — union + per-key window, ONE
    shuffle; the oracle is DuckDB's native ASOF JOIN)."""
    from nano_vectordb_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, on="user_id", right_payload=("value",)
    )


_SQL_RANGE_JOIN = """
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS win_start,
       p.ts + INTERVAL 1 HOUR AS win_end,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND c.ts >= p.ts
 AND c.ts < p.ts + INTERVAL 1 HOUR
"""


@register("events_range_join", oracle=_SQL_RANGE_JOIN)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks inside each purchase's 1-hour attribution
    window (operators/rangejoin.py — bucketed equi-join + residual
    predicate, never a nested-loop; the oracle is the plain inequality
    join)."""
    from nano_vectordb_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
        F.col("value").alias("purchase_value"),
    )
    return range_join(
        clicks, windows, on="user_id", start="win_start", end="win_end"
    )


@register("semi_anti_join", oracle=_SQL_SEMI_ANTI)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join coverage via the DataFrame API (left_semi /
    left_anti), matching EXISTS / NOT EXISTS oracles."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n_with = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).count()
    n_without = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).count()
    n_parts = part.join(lineitem, part.p_partkey == lineitem.l_partkey, "left_semi").count()
    return spark.createDataFrame(
        [(n_with, n_without, n_parts)],
        "n_with_orders bigint, n_without_orders bigint, n_parts_sold bigint",
    )


@register(
    "events_salted_agg",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the two-stage salted shape
    (operators/skew.py): counts and DECIMAL sums per event_type where
    stage 1 fans each key over 16 salt buckets and stage 2 combines the
    partials. The oracle is the plain GROUP BY — salting must never
    change results, only reducer balance."""
    from nano_vectordb_spark.operators.skew import with_salt

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    partial = with_salt(ev, 16).groupBy("event_type", "__salt").agg(
        F.count("*").alias("__n"), F.sum("v").alias("__s")
    )
    return partial.groupBy("event_type").agg(
        F.sum("__n").alias("n"),
        F.sum("__s").cast("double").alias("total_value"),
    )


_SQL_HLL = f"""
WITH r AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 3))::INT AS reg,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 4, 8))::BIGINT AS w
  FROM events
),
regs AS (
  SELECT event_type, reg,
         max(CASE WHEN w = 0 THEN 33
                  ELSE 32 - CAST(floor(log2(CAST(w AS DOUBLE))) AS INT)
             END) AS rho
  FROM r GROUP BY event_type, reg
),
agg AS (
  SELECT event_type,
         count(*) AS present,
         sum(power(2.0, -rho)) AS s_present
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         round(CASE WHEN '{0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096!r}'::DOUBLE
                         / (s_present + (4096.0 - present)) <= 10240.0
                     AND (4096.0 - present) > 0
                    THEN 4096.0 * ln(4096.0 / (4096.0 - present))
                    ELSE '{0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096!r}'::DOUBLE
                         / (s_present + (4096.0 - present)) END, 6) AS approx_distinct
  FROM agg
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT est.event_type, est.approx_distinct, ex.exact_distinct,
       round(abs(est.approx_distinct - ex.exact_distinct) / ex.exact_distinct, 6)
         AS rel_err
FROM est JOIN ex ON ex.event_type = est.event_type
"""


@register("distinct_users_hll", oracle=_SQL_HLL)
def distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-independent HLL (operators/sketch.py): md5-arithmetic
    register updates -> max-mergeable (day -> month in-plan) ->
    harmonic estimator with linear-counting correction. The
    oracle-checkable sibling of distinct_users_sketch: DuckDB replays
    the identical sketch and estimate (the harmonic sum is exact dyadic
    arithmetic, so it is order-independent across engines). Emits the
    exact distinct count and relative error alongside."""
    from nano_vectordb_spark.operators import sketch as sketch_ops

    ev = load_table(spark, sf_dir, "events")
    daily = sketch_ops.hll_registers(
        ev.withColumn("day", F.col("ts").cast("date")),
        "user_id",
        ["day", "event_type"],
    )
    monthly = sketch_ops.hll_merge(daily, ["event_type"])
    est = sketch_ops.hll_estimate(monthly, ["event_type"]).withColumnRenamed(
        "approx_distinct", "approx_distinct"
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "approx_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )


@register("distinct_users_sketch", oracle=None)
def distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (DataSketches HLL via
    hll_sketch_agg): one sketch per (day, event_type), then the monthly
    per-type estimate by UNIONING the daily sketches — the 100 TB
    pattern: sketches pre-aggregate per partition/day and re-aggregate
    without rescanning, unlike exact COUNT(DISTINCT). No SQL oracle
    (estimator internals are library-specific); the error bound vs the
    exact count is asserted in tests/test_metrics_extra.py."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_distinct_users"
            ),
            F.count("*").alias("n_daily_sketches"),
        )
        .orderBy("event_type")
    )


_SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l.l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
"""


@register("local_supplier_volume", oracle=_SQL_LOCAL_SUPPLIER_VOLUME)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-table join with the local-supplier predicate
    (supplier nation == customer nation). The fact table joins against
    a chain of ever-smaller dimensions — at 100 TB every dimension side
    (region -> nation -> supplier, and customer after its region
    restriction) is broadcast, so lineitem is scanned once and never
    shuffled for a join; Catalyst's join reordering gets the SQL form,
    asserted oracle-equal here."""
    return _sql_view_query(spark, sf_dir, _SQL_LOCAL_SUPPLIER_VOLUME)


_SQL_NATION_VOLUME = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders    ON o_orderkey = l_orderkey
JOIN customer  ON c_custkey = o_custkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, l_year
"""


@register("nation_trade_volume", oracle=_SQL_NATION_VOLUME)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border revenue per (supplier nation,
    customer nation, ship year). The year comes from
    year(CAST(l_shipdate AS DATE)) — the cast is wall-clock on NTZ, so
    the bucketing is timezone-free on both engines. Every dimension in
    the six-table chain broadcasts; lineitem scans once."""
    return _sql_view_query(spark, sf_dir, _SQL_NATION_VOLUME)


_SQL_NATION_PRESENCE = """
WITH co AS (
  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY c_nationkey
),
su AS (
  SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT CAST(COALESCE(co.nk, su.nk) AS INT) AS nationkey,
       n_customers, n_suppliers
FROM co FULL OUTER JOIN su ON co.nk = su.nk
"""


@register("nation_presence", oracle=_SQL_NATION_PRESENCE)
def nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join coverage: per-nation customer and supplier
    counts reconciled, preserving nations present on only one side
    (NULL on the other) — the join type the rest of the registry
    doesn't otherwise exercise."""
    return _sql_view_query(spark, sf_dir, _SQL_NATION_PRESENCE)


_SQL_BALANCE_QUARTILES = """
SELECT c_mktsegment, quartile,
       CAST(count(*) AS BIGINT) AS n,
       min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
FROM (SELECT c_mktsegment, c_acctbal,
             CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
      FROM customer)
GROUP BY c_mktsegment, quartile
"""


@register("customer_balance_quartiles", oracle=_SQL_BALANCE_QUARTILES)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window coverage: account-balance quartiles per market
    segment (windows PARTITIONed by segment run in parallel — no
    global sort), with a custkey tie-break making bucket assignment
    deterministic; min/max per bucket are order-independent doubles."""
    return _sql_view_query(spark, sf_dir, _SQL_BALANCE_QUARTILES)


@register(
    "events_partitioned_scan",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
GROUP BY event_type
""",
)
def events_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-partitioned table layout — THE 100 TB fact-table layout:
    events written partitionBy(event_date), then a one-day query reads
    ONLY that day's directory (PartitionFilters, pinned in
    tests/test_plans.py) — the date-range analog of the IVF
    cluster-partitioned layout. The /tmp copy is content-addressed
    against the source parquet's stat so regenerated testdata never
    collides with a stale layout."""
    import hashlib
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "events.parquet"))
    path = "/tmp/nvdb_evpart_" + hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]
    def _write(p: str) -> None:
        ev = load_table(spark, sf_dir, "events")
        ev.withColumn("event_date", F.col("ts").cast("date")).write.mode(
            "overwrite"
        ).partitionBy("event_date").parquet(p)

    _materialize_once(path, _write)
    part = spark.read.parquet(path)
    return (
        part.filter(F.col("event_date") == F.lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


_SQL_GAPFILL_DUCK = """
WITH b AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hb
),
spans AS (
  SELECT event_type, min(hb) AS lo, max(hb) AS hi FROM b GROUP BY event_type
),
grid AS (
  SELECT s.event_type, g.hb
  FROM spans s, LATERAL (SELECT unnest(range(s.lo, s.hi + 1)) AS hb) g
)
SELECT grid.event_type,
       CAST(grid.hb AS BIGINT) AS hour_bucket,
       COALESCE(b.n, 0) AS n_events,
       b.n IS NULL AS gap_filled
FROM grid LEFT JOIN b ON b.event_type = grid.event_type AND b.hb = grid.hb
"""


@register("events_gapfill", oracle=_SQL_GAPFILL_DUCK)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (the timescale time_bucket_gapfill
    analog): per event_type, emit EVERY hour bucket between that type's
    first and last event, zero-filling silent hours and flagging them.
    Buckets are timezone-free epoch-hour integers on both engines.
    Scale shape: the dense grid explodes from one tiny (type, lo, hi)
    row per series — never from the raw events — then left-joins the
    hourly partial counts."""
    ev = load_table(spark, sf_dir, "events")
    # integer `div`, not floor(double /): a double quotient one micro
    # under an hour boundary can round onto the boundary once epoch
    # magnitudes grow, while BIGINT floor-division is exact forever
    # (and matches DuckDB's // exactly)
    hb = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " div 3600000000"
    )
    b = ev.select("event_type", hb.alias("hb")).groupBy(
        "event_type", "hb"
    ).agg(F.count("*").alias("n"))
    spans = b.groupBy("event_type").agg(
        F.min("hb").alias("lo"), F.max("hb").alias("hi")
    )
    grid = spans.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("hb")
    )
    return grid.join(b, ["event_type", "hb"], "left").select(
        "event_type",
        F.col("hb").cast("long").alias("hour_bucket"),
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_events"),
        F.col("n").isNull().alias("gap_filled"),
    )


_SQL_BRAND_MARGIN = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail_value
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_brand
"""


@register("brand_margin", oracle=_SQL_BRAND_MARGIN)
def brand_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand realized revenue vs retail value: the part dimension
    broadcasts against one lineitem scan; exact DECIMAL arithmetic
    keeps both sums order-insensitive before the final double cast."""
    return _sql_view_query(spark, sf_dir, _SQL_BRAND_MARGIN)


_SQL_FULFILLMENT = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(min(delay_days) AS BIGINT) AS min_days,
       quantile_cont(delay_days, 0.5) AS p50_days,
       quantile_cont(delay_days, 0.95) AS p95_days,
       CAST(max(delay_days) AS BIGINT) AS max_days
FROM (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay_days
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
)
GROUP BY o_orderpriority
"""


@register("order_fulfillment_latency", oracle=_SQL_FULFILLMENT)
def order_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority class: the
    orders-lineitem join with a timezone-free whole-day difference
    (both timestamps cast to wall-clock DATE first), then exact
    interpolated percentiles over integer day counts. At scale the
    orders side is date- and column-pruned before a broadcast toward
    the lineitem scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", F.datediff("sd", "od").alias("delay_days")
    )
    pct = F.percentile("delay_days", F.lit([0.5, 0.95]))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.min("delay_days").cast("long").alias("min_days"),
            pct.alias("__pct"),
            F.max("delay_days").cast("long").alias("max_days"),
        )
        .select(
            "o_orderpriority",
            "n_lineitems",
            "min_days",
            F.col("__pct")[0].alias("p50_days"),
            F.col("__pct")[1].alias("p95_days"),
            "max_days",
        )
    )


_SQL_UNPIVOT = """
SELECT l_orderkey, l_linenumber, measure,
       CAST(val AS DOUBLE) AS val
FROM (
  SELECT l_orderkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax
  FROM lineitem WHERE l_orderkey % 1000 = 0
) UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
"""


@register("lineitem_unpivot", oracle=_SQL_UNPIVOT)
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long melt) coverage: the four lineitem measures
    as (measure, val) rows — the inverse of events_pivot. Pure
    projection + generator, zero shuffle; the orderkey filter keeps the
    gate output bounded."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 1000 == 0
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


_SQL_RETURNED_ITEMS = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS revenue,
       c_acctbal
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("returned_items_report", oracle=_SQL_RETURNED_ITEMS)
def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returned
    items in a quarter — a 4-table join where every dimension side
    (customer after the date-restricted orders, nation) broadcasts and
    lineitem is scanned once with the returnflag + date filters pushed
    down. Exact DECIMAL revenue (order-insensitive) cast to double,
    ranked with a deterministic custkey tie-break."""
    return _sql_view_query(spark, sf_dir, _SQL_RETURNED_ITEMS)


_SQL_HYPERTABLE = """
SELECT grouping(bucket_day) + 2 * grouping(bucket_hour) AS grain_id,
       bucket_day, bucket_hour, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM (SELECT event_type, value,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             date_trunc('hour', ts) AS bucket_hour
      FROM events)
GROUP BY GROUPING SETS ((bucket_day, event_type), (bucket_hour, event_type),
                        (event_type))
"""


def _ntz_bucket_sql(col: str, micros: int) -> str:
    """Timezone-free truncation of a TIMESTAMP_NTZ column to a bucket
    width in micros. Spark's date_trunc coerces NTZ to LTZ (boundaries
    then shift with the session timezone); integer epoch-micros math
    against the NTZ epoch does not."""
    e = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    return (
        f"timestampadd(MICROSECOND, (timestampdiff(MICROSECOND, {e}, {col})"
        f" div {micros}) * {micros}, {e})"
    )


_SQL_HYPERTABLE_SPARK = f"""
SELECT grouping(bucket_day) + 2 * grouping(bucket_hour) AS grain_id,
       bucket_day, bucket_hour, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM (SELECT event_type, value,
             {_ntz_bucket_sql('ts', 86_400_000_000)} AS bucket_day,
             {_ntz_bucket_sql('ts', 3_600_000_000)} AS bucket_hour
      FROM events)
GROUP BY GROUPING SETS ((bucket_day, event_type), (bucket_hour, event_type),
                        (event_type))
"""


@register("events_hypertable_rollup", oracle=_SQL_HYPERTABLE)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass produces the
    hourly, daily, and all-time rollups via GROUPING SETS (the
    timescale-style multi-granularity materialization; at scale each
    grain is a partial agg over the same scan — no second read). The
    Spark side buckets with timezone-free NTZ epoch math; the DuckDB
    oracle's date_trunc is naive-timestamp arithmetic, already
    timezone-free."""
    return _sql_view_query(spark, sf_dir, _SQL_HYPERTABLE_SPARK)


_SQL_ROLLUP = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("orders_rollup", oracle=_SQL_ROLLUP)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage: ROLLUP over order status/priority with
    exact decimal totals."""
    return _sql_view_query(spark, sf_dir, _SQL_ROLLUP)


@register(
    "scan_cost_model",
    oracle="""
WITH d AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(max(len(embedding)) AS BIGINT) AS dim
  FROM embeddings
)
SELECT n_rows, dim,
       n_rows * dim * 4 AS bytes_f32,
       n_rows * dim * 2 AS bytes_f16,
       n_rows * dim * 1 + 4 * n_rows AS bytes_i8,
       CAST(n_rows * dim * 4 AS DOUBLE) / (n_rows * dim * 1 + 4 * n_rows) AS f32_over_i8
FROM d
""",
)
def scan_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bytes-per-query cost model (reference O19, vecbin_format.h:45-59):
    payload bytes one full scan reads per dtype, incl. the int8 scale
    rows — the quantity the reference divides by latency to report
    effective bandwidth."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.agg(
        F.count("*").alias("n_rows"), F.max(F.size("embedding")).cast("long").alias("dim")
    )
    return d.select(
        "n_rows",
        "dim",
        (F.col("n_rows") * F.col("dim") * 4).alias("bytes_f32"),
        (F.col("n_rows") * F.col("dim") * 2).alias("bytes_f16"),
        (F.col("n_rows") * F.col("dim") * 1 + 4 * F.col("n_rows")).alias("bytes_i8"),
        (
            (F.col("n_rows") * F.col("dim") * 4).cast("double")
            / (F.col("n_rows") * F.col("dim") * 1 + 4 * F.col("n_rows"))
        ).alias("f32_over_i8"),
    )


_SQL_SET_OPS = """
WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
all_cust AS (SELECT c_custkey AS k FROM customer)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT k FROM all_cust INTERSECT SELECT k FROM buyers)) AS n_intersect,
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT k FROM all_cust EXCEPT SELECT k FROM buyers)) AS n_except,
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT k FROM all_cust UNION SELECT k FROM buyers)) AS n_union
"""


@register("set_ops", oracle=_SQL_SET_OPS)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation-level set operators (INTERSECT / EXCEPT / UNION
    distinct) over customer keys."""
    return _sql_view_query(spark, sf_dir, _SQL_SET_OPS)


# pivot as explicit conditional aggregation — deterministic and
# engine-portable (engine-native PIVOT column ordering differs)
_SQL_EVENTS_PIVOT = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events
GROUP BY 1
"""


@register("events_pivot", oracle=_SQL_EVENTS_PIVOT)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot coverage: daily event-type count matrix via the DataFrame
    pivot operator (oracle expresses the same as FILTER aggregates)."""
    ev = load_table(spark, sf_dir, "events")
    # day as a plain string: DATE-typed outputs render differently across
    # the engines' pandas conversions (datetime.date vs datetime64), which
    # breaks the driver's value hash; strings are representation-stable
    p = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .count()
    )
    return p.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in ("view", "click", "purchase", "signup", "error")
        ],
    )


_SQL_PROPS_JSON = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
"""


@register("events_props_json", oracle=_SQL_PROPS_JSON)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-function coverage: extract a typed field from the props
    JSON column and aggregate it (integer sums — exact in any order)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k.cast("bigint")).alias("sum_k"),
    )


@register("events_props_variant", oracle=_SQL_PROPS_JSON)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured coverage via Spark 4's VARIANT type: parse the
    props JSON ONCE into a variant column, then extract typed fields
    with variant_get. At 100 TB this is the right plan —
    get_json_object re-parses the string per extraction, while variant
    parses once into a binary representation that every later
    extraction and shuffle reuses. Same aggregates (and oracle) as
    events_props_json, so both paths are proven semantically equal."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k.cast("bigint")).alias("sum_k"),
    )


# conversion windows make the funnel discriminative: click within 1 hour
# of first view, purchase within 1 hour of that click
_SQL_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL 1 HOUR
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL 1 HOUR
  GROUP BY e.user_id
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel
"""


@register("events_funnel", oracle=_SQL_FUNNEL)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern (funnel) analysis: users progressing through
    view -> click -> purchase in strict timestamp order with 1-hour
    conversion windows — the behavioral query shape on events."""
    return _sql_view_query(spark, sf_dir, _SQL_FUNNEL)


# --------------------------------------------------------------------------
# Structured Streaming + multimodal plumbing (pipeline extensions)
# --------------------------------------------------------------------------


@register(
    "stream_event_counts",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def stream_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts computed by an ACTUAL Structured
    Streaming query (file source, watermark, Trigger.AvailableNow,
    memory sink) — the oracle checks the same aggregation in batch SQL,
    proving stream/batch result parity."""
    from nano_vectordb_spark.streaming.events import windowed_event_counts_stream

    return windowed_event_counts_stream(spark, sf_dir)


@register(
    "stream_dedup",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_unique_events
FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events
      ORDER BY event_id, ts)
GROUP BY event_type
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark on event_id,
    watermark-bounded state) aggregated per event_type; the oracle is
    the batch DISTINCT-count. event_id is unique in the fixture so the
    stream/batch results coincide regardless of which duplicate wins."""
    from nano_vectordb_spark.streaming.events import dedup_events_stream

    return dedup_events_stream(spark, sf_dir)


@register("stream_click_attribution", oracle=_SQL_RANGE_JOIN)
def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join
    (streaming/events.click_attribution_stream): clicks joined to the
    purchase window they land in, with watermarks on BOTH streams plus
    the event-time range predicate bounding join state — the canonical
    hard Structured-Streaming shape. Oracle: the batch range-join SQL
    (events_range_join's oracle) — stream and batch must agree row for
    row."""
    from nano_vectordb_spark.streaming.events import click_attribution_stream

    return click_attribution_stream(spark, sf_dir)


@register(
    "stream_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM gaps
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
""",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator: sessionization via
    applyInPandasWithState (open session kept in group state, closed on
    30-min event-time gaps). The oracle is the batch semantics — the
    stream's AvailableNow output must equal it exactly."""
    from nano_vectordb_spark.streaming.sessions import sessionize_stream

    return sessionize_stream(spark, sf_dir)


_SQL_DOC_SEARCH = f"""
WITH {_SQL_EMBED_CTES},
corpus AS (
  SELECT doc_id * 10000 + chunk_id AS vec_id, emb FROM embedded
),
dq AS (
  SELECT vec_id AS query_id, emb FROM corpus ORDER BY vec_id ASC LIMIT 5
),
scored AS (
  SELECT dq.query_id, c.vec_id,
         list_dot_product(c.emb, dq.emb) AS score
  FROM corpus c CROSS JOIN dq
)
SELECT query_id, vec_id, score, rank FROM (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= 5
"""


@register("doc_search", oracle=_SQL_DOC_SEARCH)
def doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic search over documents end-to-end: chunk -> deterministic
    hash embedding -> exact top-k of the first 5 chunks against the
    chunk corpus (each query's own chunk must rank first — asserted in
    tests/test_textops.py). Oracle replays the whole chunk->embed->rank
    pipeline in SQL; scores are exact-rescored folds, so they
    hash-match the sequential-fold definition."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text_ops.chunk_words(docs, _CHUNK_CHARS)
    emb = text_ops.hash_embed(chunks, dim=32).select(
        (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("vec_id"), "embedding"
    )
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    two = topk_ops.topk_multi(emb, queries, 5, strategy="two_phase")
    return topk_ops.exact_rescore(emb, queries, two)


def _oracle_doc_centroids():
    """Replay doc_search_ivf's coarse fit: the chunk->embed corpus is
    computed through the PROVEN-bit-identical DuckDB embed CTEs (in
    vec_id order = the Spark DataFrame order of a single-file scan),
    then the identical seeded NumPy Lloyd fit."""
    import duckdb
    import numpy as np

    from nano_vectordb_spark.functions import kmeans as km

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{_ORACLE_SF}/documents.parquet'"
    )
    def fit():
        rows = con.sql(
            f"WITH {_SQL_EMBED_CTES} "
            f"SELECT doc_id * 10000 + chunk_id AS vec_id, emb FROM embedded "
            f"ORDER BY vec_id ASC"
        ).fetchall()
        mat = np.asarray(
            [r[1] for r in rows[: km.train_rows_for(_IVF_NLIST)]], dtype=np.float64
        )
        return km.lloyd_fit(mat, _IVF_NLIST, seed=SEED)

    return _fit_cached("doc_centroids", fit)


def _doc_ivf_oracle() -> str:
    cent = _oracle_doc_centroids()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2_row = _sql_l2("c2.emb", "c.centroid")
    l2_q = _sql_l2("dq.emb", "c.centroid")
    cos = (
        "list_dot_product(a.emb, dq.emb) / "
        "(sqrt(list_dot_product(a.emb, a.emb)) * "
        "sqrt(list_dot_product(dq.emb, dq.emb)))"
    )
    return f"""
WITH {_SQL_EMBED_CTES},
corpus AS (
  SELECT doc_id * 10000 + chunk_id AS vec_id, emb FROM embedded
),
centroids(cluster_id, centroid) AS (VALUES
    {values}),
dq AS (
  SELECT vec_id AS query_id, emb FROM corpus ORDER BY vec_id ASC LIMIT 5
),
assigned AS (
  SELECT vec_id, emb, cluster_id FROM (
    SELECT c2.vec_id, c2.emb, c.cluster_id,
           row_number() OVER (PARTITION BY c2.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM corpus c2 CROSS JOIN centroids c)
  WHERE rn = 1
),
probes AS (
  SELECT query_id, cluster_id FROM (
    SELECT dq.query_id, c.cluster_id,
           row_number() OVER (PARTITION BY dq.query_id
             ORDER BY {l2_q} ASC, c.cluster_id ASC) AS rn
    FROM dq CROSS JOIN centroids c)
  WHERE rn <= {_IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id, {cos} AS score
  FROM probes p
  JOIN assigned a USING (cluster_id)
  JOIN dq ON dq.query_id = p.query_id
)
SELECT query_id, vec_id, score, rank FROM (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= 5
"""


@register("doc_search_ivf", oracle=_doc_ivf_oracle)
def doc_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN scale path of doc_search: the same chunk->embed corpus
    behind an IVF index (driver-side fit + partition-prunable layout)
    probed at nprobe=4 of 16. On a 100 TB chunk corpus this scans
    ~25% of the lists instead of every vector; each query's own chunk
    still ranks first (its cluster is always probed — asserted in
    tests/test_textops.py). Oracle: corpus + centroid literals replayed
    through DuckDB probe/prune/rank."""
    key = ("doc_ivf", sf_dir)
    if key not in _INDEX_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        chunks = text_ops.chunk_words(docs, _CHUNK_CHARS)
        # persist: materializes the corpus once for build+queries+search,
        # and gives the Arrow assign UDF a plain column input (feeding it
        # the raw hash-embed fold expression trips Spark's interpreted
        # eval path with an INTERNAL_ERROR)
        emb = (
            text_ops.hash_embed(chunks, dim=32)
            .select(
                (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("vec_id"),
                "embedding",
            )
            .persist()
        )
        _INDEX_CACHE[key] = (
            ivf_ops.ivf_build(emb, nlist=_IVF_NLIST, seed=SEED),
            emb,
        )
    index, emb = _INDEX_CACHE[key]
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return ivf_ops.ivf_search(index, queries, 5, nprobe=_IVF_NPROBE, metric="cosine")


_MM_DIM = 16
# the fake decoder is pure md5 arithmetic over the blob bytes (== the
# utf-8 text bytes), so DuckDB replays it exactly: width/height from the
# digest's first two bytes, features from an md5 chain, L2-normalized
_SQL_MM_FEAT = f"""
WITH f AS (
  SELECT doc_id,
         CAST(16 + ('0x' || substr(md5(text), 1, 2))::INT % 64 AS INT) AS width,
         CAST(16 + ('0x' || substr(md5(text), 3, 2))::INT % 64 AS INT) AS height,
         CAST(octet_length(encode(text)) AS INT) AS byte_len,
         list_transform(range(0, {_MM_DIM}),
           i -> ('0x' || substr(md5(text || ':' || i), 1, 7))::BIGINT
                / 268435456.0 - 0.5) AS raw
  FROM documents
)
SELECT doc_id, width, height, byte_len,
       {_sql_ser_f32("list_transform(raw, x -> x / sqrt(list_dot_product(raw, raw)))")} AS features
FROM f
"""


@register("multimodal_features", oracle=_SQL_MM_FEAT)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: blob attach -> mapInPandas decode (STUB
    decoder; deterministic md5-chained features) -> typed output.
    Oracle: DuckDB replays the md5 feature arithmetic over the same
    bytes; Arrow/batching invariants in tests/test_multimodal.py."""
    from nano_vectordb_spark.operators.multimodal import attach_blob, extract_features

    docs = attach_blob(load_table(spark, sf_dir, "documents"))
    feats = extract_features(docs, dim=_MM_DIM)
    # canonical string serialization (driver canonicalizer needs hashable cols)
    return feats.withColumn("features", _ser_f32_col("features"))


# DuckDB 1.0 cannot substring a BLOB directly; hex round-trip slices
# byte-exactly (2 hex chars per byte). Output stays hex: binary cells
# arrive as unhashable bytearrays in the driver's canonicalizer.
_SQL_MM_FRAMES = """
WITH f AS (
  SELECT doc_id, encode(text) AS b,
         greatest(octet_length(encode(text)) // 4, 1) AS w
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS frame_id,
       substring(hex(b), CAST(i * w * 2 + 1 AS INT), 128) AS frame_hex
FROM (SELECT doc_id, b, w, unnest(range(0, 4)) AS i FROM f)
WHERE i * w < octet_length(b)
"""


@register(
    "multimodal_frames",
    oracle=_SQL_MM_FRAMES,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (video plumbing analog):
    bounded evenly-spaced slices, pure narrow transform. Oracle: the
    same byte-wise slicing replayed over the blob bytes in DuckDB.
    Frames serialize to hex (canonicalizer-safe; byte-exact)."""
    from nano_vectordb_spark.operators.multimodal import attach_blob, frame_sample

    docs = attach_blob(load_table(spark, sf_dir, "documents"))
    frames = frame_sample(docs, n_frames=4)
    return frames.select(
        "doc_id", "frame_id", F.hex("frame_bytes").alias("frame_hex")
    )


# REAL codec roundtrip: the doc's ASCII bytes become 8-bit PCM mono WAV
# payloads (multimodal.wav_encode), the REAL RIFF parser decodes them
# back (multimodal._wav_decode), and the audio stats are exact dyadic
# rationals — every sample is (byte-128)/128, so sums are exact in
# double no matter the order and DuckDB's ord()-based replay matches
# bit-for-bit with no fold-ordering contract needed.
_SQL_MM_WAV = """
WITH a AS (
  SELECT doc_id, text FROM documents
  WHERE regexp_matches(text, '^[ -~]+$')
),
s AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n,
         list_transform(range(1, len(text) + 1),
           i -> (ord(substr(text, CAST(i AS INT), 1)) - 128) / 128.0) AS smp
  FROM a
)
SELECT doc_id,
       n AS n_samples,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(8 AS INT) AS bits,
       n + 44 AS wav_bytes,
       round(list_aggregate(smp, 'sum') / n, 6) AS mean_amp,
       round(sqrt(list_aggregate(list_transform(smp, x -> x * x), 'sum') / n),
             6) AS rms
FROM s
"""


@register("multimodal_wav_stats", oracle=_SQL_MM_WAV)
def multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec path (retires the round-3 stub finding): each
    ASCII document's bytes are encoded as an 8-bit PCM mono RIFF/WAVE
    payload and decoded back by the real chunk-walking WAV parser
    (operators/multimodal._wav_decode — the same parser behind
    extract_features(decoder="wav")), emitting per-doc audio stats:
    sample count, rate, channels, bit depth, container size, mean
    amplitude and RMS. Scale shape: one narrow Arrow-batched
    mapInPandas, no shuffle, blobs never leave the executors. The
    oracle recomputes the stats from the characters directly — 8-bit
    PCM samples are (byte-128)/128, dyadic rationals whose sums are
    exact in IEEE double, so the decode roundtrip must match
    bit-for-bit."""
    from nano_vectordb_spark.operators.multimodal import (
        _wav_decode,
        wav_encode,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("^[\\x20-\\x7e]+$"))
        .select("doc_id", "text")
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                "doc_id": [], "n_samples": [], "sample_rate": [],
                "n_channels": [], "bits": [], "wav_bytes": [],
                "mean_amp": [], "rms": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                wav = wav_encode(text.encode("ascii"), sample_rate=8000, bits=8)
                n_samp, rate, ch, bits, smp = _wav_decode(wav)
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(n_samp)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(ch)
                rows["bits"].append(bits)
                rows["wav_bytes"].append(len(wav))
                rows["mean_amp"].append(round(float(np.sum(smp)) / n_samp, 6))
                rows["rms"].append(
                    round(float(np.sqrt(np.dot(smp, smp) / n_samp)), 6)
                )
            yield pd.DataFrame(rows)

    schema = (
        "doc_id long, n_samples long, sample_rate int, n_channels int, "
        "bits int, wav_bytes long, mean_amp double, rms double"
    )
    return docs.mapInPandas(run, schema)


# REAL image codec roundtrip, the P6 sibling of multimodal_wav_stats:
# each doc gets a 4x4 RGB image whose pixel bytes come from an md5 chain
# (engine-reproducible), encoded as binary PPM and decoded back by the
# real parser. Channel sums are exact integers, so the per-channel means
# and the luminance dark-pixel fraction are identical IEEE doubles in
# both engines.
_MM_PPM_W = 4
_MM_PPM_H = 4

_SQL_MM_PPM = f"""
WITH px AS (
  SELECT doc_id,
         ('0x' || substr(md5(text || ':px' || i), 1, 2))::INT AS r,
         ('0x' || substr(md5(text || ':px' || i), 3, 2))::INT AS g,
         ('0x' || substr(md5(text || ':px' || i), 5, 2))::INT AS b
  FROM (SELECT doc_id, text, unnest(range(0, {_MM_PPM_W * _MM_PPM_H})) AS i
        FROM documents)
)
SELECT doc_id,
       CAST({_MM_PPM_W} AS INT) AS width,
       CAST({_MM_PPM_H} AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST(count(*) AS BIGINT) AS n_pixels,
       round(CAST(sum(r) AS DOUBLE) / (255.0 * count(*)), 6) AS mean_r,
       round(CAST(sum(g) AS DOUBLE) / (255.0 * count(*)), 6) AS mean_g,
       round(CAST(sum(b) AS DOUBLE) / (255.0 * count(*)), 6) AS mean_b,
       round(CAST(sum(CASE WHEN (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
                                < 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dark_frac
FROM px GROUP BY doc_id
"""


@register("multimodal_ppm_stats", oracle=_SQL_MM_PPM)
def multimodal_ppm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec path: md5-chained RGB pixels per document are
    packed as a binary PPM (P6) payload and decoded back by the real
    comment-tolerant parser (operators/multimodal._ppm_decode — the
    parser behind extract_features(decoder="ppm")), emitting per-image
    stats: dimensions, maxval, pixel count, per-channel mean intensity
    and the Rec.601 dark-pixel fraction (the cheap exposure/quality
    screen an image-filtering pipeline runs before any model). Narrow
    Arrow-batched mapInPandas, no shuffle. The oracle regenerates the
    same md5 pixels and aggregates — integer channel sums make every
    emitted double bit-identical."""
    from nano_vectordb_spark.operators.multimodal import _ppm_decode

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_px = _MM_PPM_W * _MM_PPM_H

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        hdr = b"P6\n%d %d\n255\n" % (_MM_PPM_W, _MM_PPM_H)
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "maxval": [],
                "n_pixels": [], "mean_r": [], "mean_g": [], "mean_b": [],
                "dark_frac": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = b"".join(
                    bytes.fromhex(
                        hashlib.md5(f"{text}:px{i}".encode()).hexdigest()[:6]
                    )
                    for i in range(n_px)
                )
                w, h, maxval, arr = _ppm_decode(hdr + body)
                px = arr.astype(np.float64)
                lum = (
                    0.299 * px[:, 0] + 0.587 * px[:, 1] + 0.114 * px[:, 2]
                ) / 255.0
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["maxval"].append(maxval)
                rows["n_pixels"].append(len(arr))
                for ch, name in ((0, "mean_r"), (1, "mean_g"), (2, "mean_b")):
                    s = int(arr[:, ch].astype(np.int64).sum())
                    rows[name].append(round(s / (255.0 * len(arr)), 6))
                rows["dark_frac"].append(
                    round(float(np.count_nonzero(lum < 0.5)) / len(arr), 6)
                )
            yield pd.DataFrame(rows)

    schema = (
        "doc_id long, width int, height int, maxval int, n_pixels long, "
        "mean_r double, mean_g double, mean_b double, dark_frac double"
    )
    return docs.mapInPandas(run, schema)


# --------------------------------------------------------------------------
# Training-data pipeline: stratified sampling, mixture weighting,
# sequence packing, BM25 lexical search (operators/pipeline.py,
# operators/lexical.py)
# --------------------------------------------------------------------------

_STRAT_N = 20

_SQL_STRATIFIED = f"""
SELECT doc_id, lang, source, n_chars, CAST(rn AS INT) AS sample_rank FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5('{SEED}:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
  FROM documents)
WHERE rn <= {_STRAT_N}
"""


@register("sample_stratified", oracle=_SQL_STRATIFIED)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample: {_STRAT_N} docs per language (the
    per-stratum analog of reference O21 seeded query sampling,
    tools/nvdb_make_query.cpp:56-75). One shuffle on the stratum key."""
    docs = load_table(spark, sf_dir, "documents")
    s = pipe_ops.stratified_sample(docs, "lang", _STRAT_N, seed=SEED)
    return s.select("doc_id", "lang", "source", "n_chars", "sample_rank")


_SHUFFLE_SEED = "epoch0"
_SHUFFLE_SHARDS = 8

_SQL_SHUFFLE = f"""
WITH k AS (
  SELECT doc_id,
         md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS key
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(key, 1, 15))::BIGINT % {_SHUFFLE_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY ('0x' || substr(key, 1, 15))::BIGINT % {_SHUFFLE_SHARDS}
         ORDER BY key, doc_id) AS INT) AS pos
FROM k
"""


@register("corpus_shuffle", oracle=_SQL_SHUFFLE)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle into {_SHUFFLE_SHARDS} training
    shards (operators/pipeline.seeded_shuffle): keyed-md5 shard
    assignment + within-shard position. The scale-correct global
    permutation — per-shard window sorts, never a one-reducer global
    rank."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return pipe_ops.seeded_shuffle(
        docs, seed=_SHUFFLE_SEED, n_shards=_SHUFFLE_SHARDS
    ).select("doc_id", "shard", "pos")


# target mixture shares: source src{i} gets weight i+1 (normalized) — a
# deliberately non-uniform plan so every keep_rate is distinct
_MIX_SHARES = {f"src{i}": float(i + 1) for i in range(20)}
_MIX_TOTAL = sum(_MIX_SHARES.values())

# CAST('…' AS DOUBLE) from a *string*: DuckDB types bare decimal
# literals as DECIMAL and its decimal->double cast double-rounds, both
# off Spark's double literal by 1 ulp; string->double parsing is
# correctly rounded, so the repr round-trips bit-exactly
_SQL_MIX_TGT = ",\n    ".join(
    f"('{s}', CAST('{v / _MIX_TOTAL!r}' AS DOUBLE))"
    for s, v in sorted(_MIX_SHARES.items())
)

_SQL_MIX_WEIGHTS_CTES = f"""
toks_m AS (
  SELECT doc_id, source, lang, n_chars,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM toks_m GROUP BY source
),
tgt(source, target_share) AS (VALUES
    {_SQL_MIX_TGT}),
shares AS (
  SELECT p.source, p.n_docs, p.n_tokens,
         CAST(p.n_tokens AS DOUBLE) / CAST(sum(p.n_tokens) OVER () AS DOUBLE) AS natural_share,
         g.target_share
  FROM per_src p JOIN tgt g USING (source)
),
rated AS (
  SELECT *, target_share / natural_share AS rate_raw FROM shares
),
weights AS (
  SELECT source, n_docs, n_tokens, natural_share, target_share,
         rate_raw / max(rate_raw) OVER () AS keep_rate
  FROM rated
)"""


@register(
    "mixture_weights",
    oracle=f"""
WITH {_SQL_MIX_WEIGHTS_CTES}
SELECT * FROM weights
""",
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixture plan: per-source token counts, natural vs target
    share, downsample-only keep rates. One aggregation shuffle; the
    share math runs over the 20-row per-source aggregate."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tx.tokens_expr("text")).cast("long")
    )
    return pipe_ops.mixture_weights(docs, _MIX_SHARES)


@register(
    "mixture_sample",
    oracle=f"""
WITH {_SQL_MIX_WEIGHTS_CTES}
SELECT d.doc_id, d.source, d.lang, d.n_chars
FROM documents d JOIN weights w USING (source)
WHERE CAST(('0x' || substr(md5('{SEED}:' || CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT AS DOUBLE)
      / 268435456.0 < w.keep_rate
""",
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realize the mixture plan: deterministic keyed-hash Bernoulli
    thinning against the broadcast keep-rate table — map-only over the
    corpus, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tx.tokens_expr("text")).cast("long")
    )
    w = pipe_ops.mixture_weights(docs, _MIX_SHARES)
    s = pipe_ops.mixture_sample(docs, w, seed=SEED)
    return s.select("doc_id", "source", "lang", "n_chars")


_PACK_BUDGET = 256
_PACK_BUCKETS = 8


_SQL_PACK_CTES = f"""WITH RECURSIVE toks_p AS (
  SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT bucket, doc_id, n_tokens,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id ASC) AS rn
  FROM toks_p
),
packed AS (
  SELECT bucket, rn, doc_id, n_tokens, 0 AS pack_id, n_tokens AS acc
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.acc + o.n_tokens > {_PACK_BUDGET} THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.acc + o.n_tokens > {_PACK_BUDGET} THEN o.n_tokens ELSE p.acc + o.n_tokens END
  FROM packed p JOIN o ON o.bucket = p.bucket AND o.rn = p.rn + 1
)"""


@register(
    "pack_sequences",
    oracle=f"""
{_SQL_PACK_CTES}
SELECT bucket, CAST(pack_id AS INT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id ASC), ',') AS doc_ids
FROM packed GROUP BY bucket, pack_id
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into {_PACK_BUDGET}-token packs across
    {_PACK_BUCKETS} parallel hash buckets; the per-bucket fold is a
    native JVM aggregate (no Python). Oracle: the identical greedy
    recurrence as a DuckDB recursive CTE."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tx.tokens_expr("text")).cast("long")
    )
    return pipe_ops.pack_sequences(docs, _PACK_BUDGET, _PACK_BUCKETS)


_BM25_QUERIES = [
    (0, ["hash", "join"]),
    (1, ["window", "sort", "stream"]),
    (2, ["batch", "scan", "merge", "part"]),
]
_BM25_K = 10


def _bm25_oracle(k: int = _BM25_K) -> str:
    from nano_vectordb_spark.operators.lexical import B, K1

    vocab = sorted({t for _, terms in _BM25_QUERIES for t in terms})
    vlist = ", ".join(f"'{t}'" for t in vocab)
    qvals = ",\n    ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         list_filter(toks, x -> list_contains([{vlist}], x)) AS qtoks
  FROM t
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d
),
posting AS (SELECT doc_id, dl, unnest(qtoks) AS term FROM d),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, any_value(dl) AS dl
  FROM posting GROUP BY doc_id, term
),
idf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
qmap(query_id, term) AS (VALUES
    {qvals}),
scored AS (
  SELECT q.query_id, tf.doc_id, tf.term,
         ln(1.0 + (CAST(s.n_docs AS DOUBLE) - i.df + 0.5) / (i.df + 0.5))
         * (tf.tf * {K1 + 1.0!r}
            / (tf.tf + {K1!r} * ({1.0 - B!r} + {B!r}
               * (CAST(tf.dl AS DOUBLE)
                  / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS s
  FROM tf JOIN idf i USING (term) JOIN qmap q USING (term) CROSS JOIN stats s
),
summed AS (
  SELECT query_id, doc_id,
         round(list_aggregate(list(s ORDER BY term ASC), 'sum'), 6) AS score
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, score, rank FROM (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, doc_id ASC) AS INT) AS rank
  FROM summed)
WHERE rank <= {k}
"""


@register("doc_search_bm25", oracle=_bm25_oracle)
def doc_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical top-k over documents — the lexical complement
    of doc_search / doc_search_ivf. The query-vocabulary filter runs
    before the explode, so only query-term postings shuffle; scores sum
    via a term-ordered sequential fold (cross-engine bit contract)."""
    docs = load_table(spark, sf_dir, "documents")
    return lexical_ops.bm25_search(spark, docs, _BM25_QUERIES, k=_BM25_K)


# ---------------------------------------------------------------------------
# Training-corpus hygiene: repetition signals, PII redaction,
# benchmark decontamination. Extensions past the reference's text
# pipeline (scripts/build_vecbin_chunked.py:144-225) toward what an
# LLM training-data pipeline filters on before embedding.
# ---------------------------------------------------------------------------

_SQL_REPETITION = f"""
WITH t AS ({_SQL_TOKS}),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM t WHERE len(toks) >= 2
),
bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bstat AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM bgc GROUP BY doc_id),
tg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
  FROM t WHERE len(toks) >= 3
),
tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g),
tstat AS (
  SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ,
         sum(c) AS n_tg
  FROM tgc GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(t.toks)) AS DOUBLE)
         / CAST(len(t.toks) AS DOUBLE) AS distinct_ratio,
       COALESCE(CAST(b.top_c AS DOUBLE) / CAST(b.n_bg AS DOUBLE), 0.0)
         AS top_bigram_frac,
       COALESCE(CAST(s.dup_occ AS DOUBLE) / CAST(s.n_tg AS DOUBLE), 0.0)
         AS dup_trigram_frac
FROM t
LEFT JOIN bstat b ON t.doc_id = b.doc_id
LEFT JOIN tstat s ON t.doc_id = s.doc_id
"""


@register("repetition_stats", oracle=_SQL_REPETITION)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals: distinct-token
    ratio, share of tokens in the most frequent bigram, share of
    trigram occurrences that are duplicated.

    Scale shape: entirely per-row native folds over sorted n-gram
    arrays (functions/text.py max_run_expr / dup_run_total_expr) —
    zero shuffle, embarrassingly parallel, vs the oracle's
    explode + groupBy formulation which shuffles every n-gram at
    100 TB. The oracle states the semantics; the fold is the plan.
    """
    d = _toks_df(spark, sf_dir)
    n = F.size("toks")
    bg = F.array_sort(tx.ngrams_expr(F.col("toks"), 2))
    tg = F.array_sort(tx.ngrams_expr(F.col("toks"), 3))
    n_bg = F.size(bg)
    n_tg = F.size(tg)
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (F.size(F.array_distinct("toks")).cast("double") / n.cast("double")).alias(
            "distinct_ratio"
        ),
        F.when(
            n_bg > 0, tx.max_run_expr(bg).cast("double") / n_bg.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            n_tg > 0, tx.dup_run_total_expr(tg).cast("double") / n_tg.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )


# PII patterns kept to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, no
# backrefs/lookaround.
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"
_PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

# The synthetic corpus contains no PII, so both engines inject the same
# deterministic doc_id-derived contacts — the oracle then checks real
# match/replace behavior instead of vacuous zeros.
_SQL_PII_AUG = """
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS aug
  FROM documents
"""

_SQL_PII = f"""
WITH a AS ({_SQL_PII_AUG})
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_PII_PHONE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(aug, '{_PII_IP}')) AS INT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(aug,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IP}', '<IP>', 'g')) AS redacted_md5
FROM a
"""


@register("pii_redact", oracle=_SQL_PII)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count and redact emails / phone numbers /
    IPv4 addresses with native regexp expressions (codegen'd, no
    Python). Output carries md5(redacted) so the full redacted text is
    value-checked without shipping long strings through the gate.
    """
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (did % 256).cast("string"),
        F.lit("."),
        ((did * 7) % 256).cast("string"),
    )
    d = docs.select("doc_id", aug.alias("aug"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count("aug", F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count("aug", F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count("aug", F.lit(_PII_IP)).alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


_DECON_N = 8  # shingle width (13-gram is the published norm; 8 fits the corpus)
_DECON_MOD = 10  # doc_id % MOD == 0 -> benchmark split

_SQL_DECON = f"""
WITH t AS ({_SQL_TOKS}),
s AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - {_DECON_N - 2}),
           i -> array_to_string(toks[i:i+{_DECON_N - 1}], ' ')))) AS sh
  FROM t WHERE len(toks) >= {_DECON_N}
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS hh FROM s
),
bench AS (SELECT doc_id AS bench_id, hh FROM h WHERE doc_id % {_DECON_MOD} = 0),
train AS (SELECT doc_id, hh FROM h WHERE doc_id % {_DECON_MOD} <> 0)
SELECT train.doc_id AS doc_id,
       CAST(count(DISTINCT train.hh) AS BIGINT) AS n_shared_shingles,
       CAST(count(DISTINCT bench_id) AS BIGINT) AS n_benchmark_docs
FROM train JOIN bench ON train.hh = bench.hh
GROUP BY train.doc_id
"""


@register("decontaminate", oracle=_SQL_DECON)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    {_DECON_N}-token shingle with the held-out benchmark split
    (doc_id % {_DECON_MOD} == 0 stands in for the eval set). The
    standard contamination check run before training-corpus release.

    Scale shape: distinct shingles per doc, 60-bit md5 hashes, then an
    inverted-index equi-join on the hash — posting-list sized shuffle,
    never doc x doc. Both engines hash identically, so the comparison
    is exact even under (astronomically unlikely) hash collisions.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup_ops.ngram_shingles(docs, n=_DECON_N)
    hashed = sh.select(
        "doc_id", F.explode("shingles").alias("sh")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("hh"),
    )
    bench = hashed.filter(F.col("doc_id") % _DECON_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "hh"
    )
    train = hashed.filter(F.col("doc_id") % _DECON_MOD != 0)
    return (
        train.join(bench, "hh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("hh").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval + corpus-shaping extensions (round 3): RRF fusion of
# the lexical and semantic rankers, quantile-threshold quality
# filtering, and the token-length histogram that sizes sequence
# packing. All native expressions; oracles replay every stage.
# ---------------------------------------------------------------------------

_RRF_POOL = 20
_RRF_K = 10
_RRF_C = 60


def _rrf_oracle() -> str:
    qvals = ",\n    ".join(
        f"({-(qid + 1)}, 0, '{' '.join(terms)}', 0)"
        for qid, terms in _BM25_QUERIES
    )
    return f"""
WITH lex AS (
  SELECT query_id, doc_id, rank FROM ({_bm25_oracle(_RRF_POOL)})
),
units AS (
  SELECT doc_id, 0 AS chunk_id, text AS chunk,
         CAST(length(text) AS INT) AS chunk_chars
  FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {qvals}) v(doc_id, chunk_id, chunk, chunk_chars)
),
{_sql_embed_ctes('units')},
demb AS (SELECT doc_id AS vec_id, emb FROM embedded WHERE doc_id >= 0),
qemb AS (SELECT -doc_id - 1 AS query_id, emb FROM embedded WHERE doc_id < 0),
sem AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT q.query_id, d.vec_id AS doc_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(d.emb, q.emb) DESC, d.vec_id ASC) AS rank
    FROM demb d CROSS JOIN qemb q)
  WHERE rank <= {_RRF_POOL}
),
fused AS (
  SELECT CAST(coalesce(l.query_id, s.query_id) AS BIGINT) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         coalesce(1.0 / ({_RRF_C} + l.rank), 0.0)
           + coalesce(1.0 / ({_RRF_C} + s.rank), 0.0) AS rrf_score
  FROM lex l FULL OUTER JOIN sem s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT query_id, doc_id, rrf_score, rank FROM (
  SELECT query_id, doc_id, rrf_score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
  FROM fused)
WHERE rank <= {_RRF_K}
"""


@register("hybrid_search_rrf", oracle=_rrf_oracle)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with semantic
    embedding ranking by reciprocal-rank fusion (Cormack et al. 2009:
    score = sum over rankers of 1/(C + rank), C=60) — the
    standard hybrid-search surface a vector database exposes next to
    pure ANN. Both rankers are the proven entries (doc_search_bm25 /
    doc_search machinery): lexical top-pool via posting-list
    shuffles, semantic top-pool via the two-phase broadcast
    scan; fusion is one full-outer join on (query, doc) — tiny, Q x
    2*pool rows. RRF needs only ranks, never score calibration, so the
    plan stays join-of-two-topk at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    lex = lexical_ops.bm25_search(spark, docs, _BM25_QUERIES, k=_RRF_POOL).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    units = docs.select(
        "doc_id",
        F.lit(0).alias("chunk_id"),
        F.col("text").alias("chunk"),
        F.length("text").cast("int").alias("chunk_chars"),
    )
    qrows = docs.sparkSession.createDataFrame(
        [(-(qid + 1), 0, " ".join(terms), 0) for qid, terms in _BM25_QUERIES],
        "doc_id long, chunk_id int, chunk string, chunk_chars int",
    )
    emb = text_ops.hash_embed(units.unionByName(qrows), dim=_EMBED_DIM)
    demb = emb.filter(F.col("doc_id") >= 0).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    qemb = emb.filter(F.col("doc_id") < 0).select(
        (-F.col("doc_id") - 1).alias("query_id"), "embedding"
    )
    sem = topk_ops.topk_multi(demb, qemb, _RRF_POOL, strategy="two_phase")
    sem = topk_ops.exact_rescore(demb, qemb, sem).select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("rank").alias("sem_rank")
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
        F.col("query_id").cast("long").alias("query_id"),
        "doc_id",
        (
            F.when(
                F.col("lex_rank").isNotNull(),
                F.lit(1.0) / (F.lit(_RRF_C) + F.col("lex_rank")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("sem_rank").isNotNull(),
                F.lit(1.0) / (F.lit(_RRF_C) + F.col("sem_rank")),
            ).otherwise(F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return fused.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= _RRF_K)


_QF_Q = 0.25


@register(
    "quality_filter_quantile",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS INT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains([{_SQL_EN_STOP}], x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
         CASE WHEN length(lower(text)) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(lower(text)) AS DOUBLE) END AS punct_ratio
  FROM t
),
s AS (
  SELECT doc_id, lang,
         0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 64.0)
           + 0.3 * (1.0 - stopword_ratio)
           + 0.2 * (1.0 - punct_ratio) AS quality
  FROM m
),
thr AS (SELECT lang, quantile_cont(quality, {_QF_Q}) AS q_thr FROM s GROUP BY lang)
SELECT s.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE s.quality >= t.q_thr) AS BIGINT) AS n_kept,
       max(t.q_thr) AS q_threshold
FROM s JOIN thr t ON s.lang = t.lang
GROUP BY s.lang
""",
)
def quality_filter_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-threshold quality filtering — the corpus-shaping form
    of quality_score: per-language P25 threshold
    (exact interpolated percentile, the proven
    F.percentile/quantile_cont cross-engine pair), docs below it
    dropped. Per-lang thresholds avoid one language's score
    distribution starving another. The threshold relation is
    |languages| rows — broadcast back; the corpus sees one scan + one
    group-agg, no self-shuffle."""
    d = _toks_df(spark, sf_dir)
    s = d.select(
        "doc_id",
        "lang",
        tx.quality_expr(F.col("toks"), "text").alias("quality"),
    )
    thr = s.groupBy("lang").agg(
        F.percentile("quality", F.lit(_QF_Q)).alias("q_thr")
    )
    return (
        s.join(F.broadcast(thr), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("quality") >= F.col("q_thr")).alias("n_kept"),
            F.max("q_thr").alias("q_threshold"),
        )
    )


_TLH_WIDTH = 16


@register(
    "token_length_histogram",
    oracle=f"""
WITH t AS ({_SQL_TOKS}),
b AS (
  SELECT CAST(len(toks) // {_TLH_WIDTH} AS INT) AS bucket,
         CAST(len(toks) AS INT) AS n
  FROM t
)
SELECT bucket,
       CAST(bucket * {_TLH_WIDTH} AS INT) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS sum_tokens,
       CAST(min(n) AS INT) AS min_tokens,
       CAST(max(n) AS INT) AS max_tokens
FROM b
GROUP BY bucket
""",
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram in fixed 16-token buckets
    (integer arithmetic — exact cross-engine, unlike log buckets) —
    the distribution pack_sequences' budget is sized from. One scan,
    one map-side-combined agg on a small key space."""
    d = _toks_df(spark, sf_dir)
    n = F.size("toks")
    return (
        d.select((n.cast("long") / F.lit(_TLH_WIDTH)).cast("int").alias("__b"), n.alias("__n"))
        .select(
            F.col("__b").alias("bucket"),
            (F.col("__b") * _TLH_WIDTH).cast("int").alias("bucket_lo"),
            "__n",
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__n").cast("long").alias("sum_tokens"),
            F.min("__n").cast("int").alias("min_tokens"),
            F.max("__n").cast("int").alias("max_tokens"),
        )
    )


_RADIUS_THR = 0.3


@register(
    "radius_search",
    oracle=f"""
WITH q AS ({_SQL_QUERIES})
SELECT query_id, vec_id, score FROM (
  SELECT q.query_id, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))) AS score
  FROM embeddings e CROSS JOIN q)
WHERE score >= {_RADIUS_THR}
""",
)
def radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search (the FAISS range_search contract, the k-less
    sibling of top-k): every (query, vector) pair with cosine
    similarity at or above a radius threshold. The plan is the scan
    shape range search wants at 100 TB: broadcast the query batch,
    score inside whole-stage codegen, filter — map-only, zero
    shuffles, output size bounded by the radius rather than Q x k."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    qb = F.broadcast(q.select("query_id", F.col("embedding").alias("__qvec")))
    return (
        emb.crossJoin(qb)
        .select(
            "query_id",
            "vec_id",
            topk_ops.score_expr("cosine", "embedding", "__qvec").alias("score"),
        )
        .filter(F.col("score") >= _RADIUS_THR)
    )


def _ivf_filtered_oracle() -> str:
    return _ivf_oracle(pred="label = 1")


@register("ivf_search_filtered", oracle=_ivf_filtered_oracle)
def ivf_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ANN over the IVF index — the searched rows are
    restricted by a predicate (label = 1) at probe time, on an index
    that was built before the filter was known (the vector-DB filtered
    -search contract; assignment is unchanged, so no refit). The
    predicate composes with partition pruning: the scan reads only
    probed cluster directories AND pushes the label filter into the
    parquet reader, so selectivity multiplies with the nprobe/nlist
    byte skip. Post-filtering a plain ANN result would under-fill k."""
    idx = _ivf_index(spark, sf_dir)
    filtered = ivf_ops.IvfIndex(
        centroids=idx.centroids,
        assigned=idx.assigned.filter(F.col("label") == 1),
        nlist=idx.nlist,
        centroids_np=idx.centroids_np,
    )
    return ivf_ops.ivf_search(
        filtered, _queries_df(spark, sf_dir), K, nprobe=_IVF_NPROBE
    )


# --------------------------------------------------------------------------
# Binary (1-bit sign) quantization + Hamming candidate search
# --------------------------------------------------------------------------

_BINQ_R = 50

# DuckDB replay of the two-half sign signature (operators/binaryq.py):
# bit j of the lo/hi word is 1 iff dim j / j+32 is strictly positive.
_SQL_BINQ_SIG = """
  SELECT vec_id,
    CAST(list_aggregate(list_transform(range(0,32),
      i -> CASE WHEN embedding[CAST(i AS INT)+1] > 0
                THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS sig_lo,
    CAST(list_aggregate(list_transform(range(32,64),
      i -> CASE WHEN embedding[CAST(i AS INT)+1] > 0
                THEN (CAST(1 AS BIGINT) << CAST(i-32 AS INT))
                ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS sig_hi
  FROM embeddings
"""


@register(
    "topk_binary_rescore",
    oracle=f"""
WITH sig AS ({_SQL_BINQ_SIG}),
qs AS (SELECT sig_lo, sig_hi FROM sig WHERE vec_id = 0),
cand AS (
  SELECT s.vec_id,
         CAST(bit_count(xor(s.sig_lo, (SELECT sig_lo FROM qs)))
            + bit_count(xor(s.sig_hi, (SELECT sig_hi FROM qs))) AS INT) AS hamming
  FROM sig s
  ORDER BY hamming ASC, s.vec_id ASC
  LIMIT {_BINQ_R}
),
scored AS (
  SELECT c.vec_id, c.hamming,
         list_dot_product(CAST(e.embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS score
  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
)
SELECT vec_id, hamming, score, rank FROM (
  SELECT vec_id, hamming, score,
         CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {K}
""",
)
def topk_binary_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign-bit) quantization search: the coarsest rung of the
    reference's precision ladder (O5/O6/O23 codecs + the staged
    candidates->refine pipeline O32). The 8-byte-per-vector signature
    table is materialized once as its own parquet sink (vec_id, sig_lo,
    sig_hi — 32x fewer scan bytes than f32 at D=64); stage 1 ranks it
    by xor+bit_count Hamming distance into a TakeOrderedAndProject
    top-{_BINQ_R}; stage 2 broadcast-joins the {_BINQ_R} survivors back
    to the f32 table for an exact dot rescore. At 100 TB the
    full-precision table is probed by id, never scanned."""
    import hashlib
    import os as _os

    from nano_vectordb_spark.operators import binaryq as binq

    st = _os.stat(_os.path.join(sf_dir, "embeddings.parquet"))
    path = "/tmp/nvdb_binsig_" + hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]

    def _write(p: str) -> None:
        emb_w = load_table(spark, sf_dir, "embeddings")
        binq.with_signature(emb_w).select("vec_id", "sig_lo", "sig_hi").write.mode(
            "overwrite"
        ).parquet(p)

    _materialize_once(path, _write)
    sig = spark.read.parquet(path)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return binq.topk_binary_rescore(sig, emb, qvec, K, rescore_r=_BINQ_R)


# --------------------------------------------------------------------------
# SQ8: per-dimension trained scalar quantization (FAISS QT_8bit family)
# --------------------------------------------------------------------------

_SQ8_TRAIN_CAP = 100_000


def _sq8_fit(spark: SparkSession, sf_dir: str):
    key = ("sq8", sf_dir)
    if key not in _INDEX_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _INDEX_CACHE[key] = qz.sq8_train(emb, train_cap=_SQ8_TRAIN_CAP)
    return _INDEX_CACHE[key]


def _sq8_fit_oracle_np():
    """Reproduce sq8_train's (vmin, vdiff) for the oracle fixture in
    NumPy: min/max are order-independent and exact on float32, so the
    values match the Spark aggregation bit-for-bit."""

    def fit():
        import numpy as np
        import pyarrow.parquet as papq

        tbl = papq.read_table(
            f"{_ORACLE_SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
        rows = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
        rows = rows[ids < _SQ8_TRAIN_CAP]
        vmin = rows.min(axis=0)
        vmax = rows.max(axis=0)
        return (
            [float(v) for v in vmin],
            [float(vmax[j]) - float(vmin[j]) for j in range(len(vmin))],
        )

    return _fit_cached("sq8_ranges", fit)


def _sq8_oracle() -> str:
    vmin, vdiff = _sq8_fit_oracle_np()
    vm, vd = _dlist(vmin), _dlist(vdiff)
    recon = f"""list_transform(range(0, 64), j -> CASE
      WHEN ({vd})[CAST(j AS INT)+1] = 0.0 THEN ({vm})[CAST(j AS INT)+1]
      ELSE ({vm})[CAST(j AS INT)+1]
           + round_even(greatest(0.0, least(255.0,
               (CAST(embedding[CAST(j AS INT)+1] AS DOUBLE) - ({vm})[CAST(j AS INT)+1])
               / ({vd})[CAST(j AS INT)+1] * 255.0)), 0)
             / 255.0 * ({vd})[CAST(j AS INT)+1] END)"""
    return f"""
SELECT vec_id,
       list_dot_product({recon},
         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS score
FROM embeddings
ORDER BY score DESC, vec_id ASC
LIMIT {K}
"""


@register("sq8_search", oracle=_sq8_oracle)
def sq8_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION trained scalar quantization search (the FAISS
    ScalarQuantizer QT_8bit family) — the trained sibling of the
    reference's per-ROW max-abs int8 codec (O6/O23). (vmin_j, vdiff_j)
    ranges are learned on a bounded id prefix (the k-means
    sample-bounded training contract); encode/reconstruct/score is one
    codegen expression over the scan, so ranking runs in the quantized
    space exactly like topk_i8 — same 4x scan-byte reduction, but the
    codebook is global instead of per-row (no per-row scale column)."""
    vmin, vdiff = _sq8_fit(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qlit = F.lit([float(x) for x in qvec]).cast("array<double>")
    from nano_vectordb_spark.functions.vector import dot_expr

    scored = emb.select(
        "vec_id",
        dot_expr(qz.sq8_recon_expr("embedding", vmin, vdiff), qlit).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(K)


# --------------------------------------------------------------------------
# ORC source/sink roundtrip
# --------------------------------------------------------------------------


@register(
    "orc_roundtrip",
    oracle="""
SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars
FROM documents
""",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink coverage (the columnar sibling of the parquet
    path — Spark-native, splittable, predicate-pushdown-capable):
    documents written to ORC once (content-addressed /tmp cache), read
    back with the explicit schema, and proven byte-identical via md5 of
    every text against the parquet original."""
    import hashlib
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "documents.parquet"))
    path = "/tmp/nvdb_orc_" + hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]

    def _write(p: str) -> None:
        load_table(spark, sf_dir, "documents").write.mode("overwrite").orc(p)

    _materialize_once(path, _write)
    docs = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).orc(path)
    return docs.select(
        "doc_id", F.md5("text").alias("text_md5"), "lang", "source", "n_chars"
    )


# --------------------------------------------------------------------------
# TF-IDF keyword extraction
# --------------------------------------------------------------------------

_TFIDF_TOP = 3


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH t AS ({_SQL_TOKS}),
terms AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM terms GROUP BY term
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(CAST(tf.tf AS DOUBLE)
               * ln((SELECT n FROM n) / CAST(df.df AS DOUBLE)), 6) AS score
  FROM tf JOIN df ON tf.term = df.term
)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT doc_id, term, tf, df, score,
         CAST(row_number() OVER (PARTITION BY doc_id
           ORDER BY score DESC, term ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {_TFIDF_TOP}
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-{_TFIDF_TOP} terms by
    tf x ln(N/df) — the classic curation/labeling signal next to BM25
    (which ranks docs for a query; this ranks terms for a doc). Scale
    shape: one explode, two map-side-combined hash aggregations (tf
    keyed by (doc, term), df keyed by term), then a term-keyed shuffle
    join — posting-list economics identical to the BM25 operator.
    ln() is libm-dependent in the last ulp, so the score is rounded to
    6 decimals and ranking uses the rounded score — the same
    cross-engine contract the BM25 entry established."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = float(docs.count())
    terms = docs.select(
        "doc_id", F.explode(tx.tokens_expr("text")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(n_docs) / F.col("df").cast("double")),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TFIDF_TOP)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery (Catalyst decorrelation coverage)
# --------------------------------------------------------------------------

# engine-shared SQL: the customer average is exact (DECIMAL sum / count)
# so the comparison boundary is the same double on both engines
_SQL_ORDERS_ABOVE_AVG = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (
  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@register("orders_above_customer_avg", oracle=_SQL_ORDERS_ABOVE_AVG)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders priced above their own
    customer's average order value — the one relational shape the rest
    of the registry doesn't exercise. Catalyst decorrelates it into an
    aggregate + join (no per-row re-execution), so the plan is one
    orders scan for the per-customer averages hash-aggregated map-side,
    then a key-colocated join back — exactly what you'd hand-write at
    100 TB. The average is an exact DECIMAL sum over count, so the
    comparison boundary is bit-identical cross-engine."""
    return _sql_view_query(spark, sf_dir, _SQL_ORDERS_ABOVE_AVG)


# --------------------------------------------------------------------------
# Statistical outlier detection (z-score anomalies)
# --------------------------------------------------------------------------

_ANOM_K = 20

# mean and variance from EXACT decimal sums (order-independent), then
# per-row z in deterministic double ops — no float aggregation anywhere
_SQL_EVENTS_ANOMALY = f"""
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS svv
  FROM events GROUP BY event_type
),
z AS (
  SELECT e.event_id, e.event_type, e.value,
         round((CAST(CAST(e.value AS DECIMAL(18,6)) AS DOUBLE) - sv / n)
           / sqrt(svv / n - (sv / n) * (sv / n)), 6) AS zscore
  FROM events e JOIN s ON s.event_type = e.event_type
)
SELECT event_id, event_type, value, zscore, rank FROM (
  SELECT event_id, event_type, value, zscore,
         CAST(row_number() OVER (ORDER BY abs(zscore) DESC, event_id ASC) AS INT) AS rank
  FROM z)
WHERE rank <= {_ANOM_K}
"""


@register(
    "latency_quantiles_counting",
    oracle="""
WITH j AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS d
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
counts AS (
  SELECT o_orderpriority, d, CAST(count(*) AS BIGINT) AS c
  FROM j GROUP BY o_orderpriority, d
),
cum AS (
  SELECT o_orderpriority, d, c,
         CAST(sum(c) OVER (PARTITION BY o_orderpriority ORDER BY d
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumc,
         CAST(sum(c) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
  FROM counts
)
SELECT o_orderpriority,
       CAST(max(n) AS BIGINT) AS n_lineitems,
       CAST(min(CASE WHEN cumc >= (n + 1) // 2 THEN d END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN cumc >= (9 * n + 9) // 10 THEN d END) AS BIGINT) AS p90_days,
       CAST(min(CASE WHEN cumc >= (99 * n + 99) // 100 THEN d END) AS BIGINT) AS p99_days
FROM cum
GROUP BY o_orderpriority
""",
)
def latency_quantiles_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles over an integer metric via a mergeable counting
    histogram — the 100 TB alternative to a global sort: exact
    interpolated percentiles (order_fulfillment_latency) need every
    value in one place, while an integer-domain metric (delay days)
    reduces to per-(group, value) counts that partially aggregate
    map-side and merge by cell-wise ADD — the same mergeability
    argument as the HLL/count-min entries. The lower quantile
    (smallest d with cum-count >= ceil(q*n)) is then EXACT, computed
    over a few hundred distinct values per group, all in integer
    arithmetic (ceil via (a+b-1) div b — no float quantile math)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    counts = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_orderpriority", F.datediff("sd", "od").alias("d"))
        .groupBy("o_orderpriority", "d")
        .agg(F.count("*").alias("c"))
    )
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("o_orderpriority")
    cum = counts.select(
        "o_orderpriority",
        "d",
        F.sum("c").over(wcum).cast("long").alias("cumc"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )

    def _q(num: int, den: int, name: str):
        thr = F.expr(f"({num} * n + {num}) div {den}")
        return F.min(F.when(F.col("cumc") >= thr, F.col("d"))).cast("long").alias(name)

    return cum.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_lineitems"),
        _q(1, 2, "p50_days"),
        _q(9, 10, "p90_days"),
        _q(99, 100, "p99_days"),
    )


# --------------------------------------------------------------------------
# Retrieval quality metrics beyond recall: per-query RR + NDCG
# --------------------------------------------------------------------------

# IDCG@10 for binary relevance with a full GT list, embedded as ONE
# literal in both engines so it contributes zero cross-engine variance
_IDCG_10 = sum(1.0 / _math.log2(r + 1.0) for r in range(1, K + 1))


@register(
    "search_quality_i8",
    oracle=f"""
WITH gt AS (SELECT query_id, vec_id FROM ({_SQL_TOPK_MULTI})),
pred AS ({_SQL_TOPK_I8}),
r AS (
  SELECT p.query_id, p.rank,
         CASE WHEN g.vec_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM pred p LEFT JOIN gt g
    ON g.query_id = p.query_id AND g.vec_id = p.vec_id
)
SELECT query_id,
       CAST(sum(hit) AS BIGINT) AS n_hits,
       CASE WHEN min(CASE WHEN hit = 1 THEN rank END) IS NULL THEN 0.0
            ELSE 1.0 / CAST(min(CASE WHEN hit = 1 THEN rank END) AS DOUBLE) END
         AS reciprocal_rank,
       round(list_aggregate(
               list(CAST(hit AS DOUBLE) / log2(CAST(rank AS DOUBLE) + 1.0)
                    ORDER BY rank), 'sum') / {_IDCG_10!r}, 6) AS ndcg_at_10
FROM r GROUP BY query_id
""",
)
def search_quality_i8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality beyond recall (reference O17's metric family
    completed): per-query reciprocal rank of the first relevant hit and
    NDCG@{K} of the int8-space ranking against the exact f32 top-{K}
    ground truth — the judged pair when tuning a quantized scan or ANN
    operating point. DCG sums via an ordered sequential fold (the BM25
    list-fold contract); log2 is libm-dependent in the last ulp, so
    NDCG carries the 6-decimal rounding; IDCG is one shared literal.
    Scale shape: both rankings are the proven top-k plans; the metric
    itself is a broadcast-sized join + one keyed aggregation."""
    emb = load_table(spark, sf_dir, "embeddings")
    gt = topk_ops.topk_multi(emb, _queries_df(spark, sf_dir), K).select(
        "query_id", "vec_id", F.lit(1).alias("__hit")
    )
    pred = _topk_i8_df(spark, sf_dir).select("query_id", "vec_id", "rank")
    r = pred.join(gt, ["query_id", "vec_id"], "left").select(
        "query_id", "rank", F.coalesce("__hit", F.lit(0)).alias("hit")
    )
    gains = F.transform(
        F.array_sort(F.collect_list(F.struct("rank", "hit"))),
        lambda s: s["hit"].cast("double") / F.log2(s["rank"].cast("double") + F.lit(1.0)),
    )
    dcg = F.aggregate(gains, F.lit(0.0), lambda a, b: a + b)
    fr = F.min(F.when(F.col("hit") == 1, F.col("rank")))
    return r.groupBy("query_id").agg(
        F.sum("hit").cast("long").alias("n_hits"),
        F.when(fr.isNull(), F.lit(0.0))
        .otherwise(F.lit(1.0) / fr.cast("double"))
        .alias("reciprocal_rank"),
        F.round(dcg / F.lit(_IDCG_10), 6).alias("ndcg_at_10"),
    )


# --------------------------------------------------------------------------
# Matryoshka (truncated-dimension) staged search
# --------------------------------------------------------------------------

_MRL_DIMS = 16
_MRL_R = 50


@register(
    "topk_matryoshka",
    oracle=f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT vec_id,
         list_dot_product(CAST(embedding[1:{_MRL_DIMS}] AS DOUBLE[]),
                          (SELECT v[1:{_MRL_DIMS}] FROM q)) AS head_score
  FROM embeddings
  ORDER BY head_score DESC, vec_id ASC
  LIMIT {_MRL_R}
),
scored AS (
  SELECT c.vec_id, c.head_score,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), (SELECT v FROM q)) AS score
  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
)
SELECT vec_id, head_score, score, rank FROM (
  SELECT vec_id, head_score, score,
         CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {K}
""",
)
def topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / truncated-dimension staged search (the MRL
    adaptive-retrieval pattern: nested-prefix embeddings rank well at
    a fraction of the dimensions): stage 1 ranks by dot over the FIRST
    {_MRL_DIMS} of 64 dims from a materialized head table (vec_id +
    {_MRL_DIMS}-dim prefix — 4x fewer scan bytes, the same
    separate-sink trick as the binary signature path), stage 2
    broadcast-rescores the top-{_MRL_R} on full vectors. Unlike the
    codecs, the head IS exact arithmetic on a prefix — no
    reconstruction error model, just fewer dimensions scanned."""
    import hashlib
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "embeddings.parquet"))
    path = "/tmp/nvdb_mrlhead_" + hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]

    def _write(p: str) -> None:
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.slice("embedding", 1, _MRL_DIMS).alias("head")
        ).write.mode("overwrite").parquet(p)

    _materialize_once(path, _write)
    head = spark.read.parquet(path)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qhead = F.lit([float(x) for x in qvec[:_MRL_DIMS]]).cast("array<double>")
    qfull = F.lit([float(x) for x in qvec]).cast("array<double>")
    from nano_vectordb_spark.functions.vector import dot_expr

    cand = (
        head.select("vec_id", dot_expr("head", qhead).alias("head_score"))
        .orderBy(F.col("head_score").desc(), F.col("vec_id").asc())
        .limit(_MRL_R)
    )
    scored = F.broadcast(cand).join(
        emb.select("vec_id", F.col("embedding").alias("__full")), "vec_id"
    ).select("vec_id", "head_score", dot_expr("__full", qfull).alias("score"))
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= K)
        .select("vec_id", "head_score", "score", "rank")
    )


# --------------------------------------------------------------------------
# Corpus snapshot diff (release-to-release delta)
# --------------------------------------------------------------------------


@register(
    "corpus_snapshot_diff",
    oracle="""
SELECT status, CAST(count(*) AS BIGINT) AS n_docs FROM (
  SELECT CASE WHEN doc_id % 13 = 1 THEN 'added' END AS status FROM documents
  UNION ALL
  SELECT CASE
           WHEN doc_id % 7 = 3 THEN 'removed'
           WHEN doc_id % 10 = 0 THEN 'changed'
           ELSE 'unchanged' END AS status
  FROM documents
)
WHERE status IS NOT NULL
GROUP BY status
""",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release corpus delta — the data-versioning report a
    pipeline publishes with every snapshot: FULL OUTER join of two
    releases on doc_id comparing content md5s, classifying every doc
    added / removed / changed / unchanged. Release B derives
    deterministically from release A (every 7th doc dropped, every
    10th doc's text revised, a clone batch appended under new ids), so
    the oracle is the closed form of the statuses while the Spark side
    exercises the general mechanism: one doc_id-keyed full-outer join
    with md5 comparison — at 100 TB both releases shuffle once on the
    join key, and the md5s can come precomputed from release manifests
    (corpus_release) instead of rescanning text."""
    a = load_table(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("md5_a"))
    base = load_table(spark, sf_dir, "documents")
    b_kept = base.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("md5_b"),
    )
    b_new = base.filter(F.col("doc_id") % 13 == 1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.md5("text").alias("md5_b")
    )
    b = b_kept.unionAll(b_new)
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("md5_a").isNull(), F.lit("added"))
        .when(F.col("md5_b").isNull(), F.lit("removed"))
        .when(F.col("md5_a") != F.col("md5_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(status.alias("status")).groupBy("status").agg(
        F.count("*").alias("n_docs")
    )


# --------------------------------------------------------------------------
# Fuzzy vocabulary matching (SymSpell deletion-neighborhood blocking)
# --------------------------------------------------------------------------

_TYPO_MIN_LEN = 4


@register(
    "vocab_typo_pairs",
    oracle=f"""
WITH t AS ({_SQL_TOKS}),
corpus_terms AS (SELECT unnest(toks) AS term FROM t),
typo_terms AS (
  SELECT concat(substring(tok, 1, 1), substring(tok, 3)) AS term
  FROM (SELECT doc_id, toks[1] AS tok FROM t)
  WHERE doc_id % 50 = 0 AND len(tok) >= {_TYPO_MIN_LEN + 1}
),
terms AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT term FROM corpus_terms UNION ALL SELECT term FROM typo_terms)
  WHERE len(term) >= {_TYPO_MIN_LEN}
  GROUP BY term
)
SELECT a.term AS term_a, b.term AS term_b, a.n AS n_a, b.n AS n_b
FROM terms a JOIN terms b ON a.term < b.term
WHERE levenshtein(a.term, b.term) = 1
""",
)
def vocab_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary matching: every pair of vocabulary terms at
    edit distance exactly 1 (the typo-clustering / entity-resolution
    primitive), found WITHOUT the quadratic all-pairs scan via SymSpell
    deletion-neighborhood blocking: each term emits itself plus its
    single-character-deletion variants as blocking keys; any lev<=1
    pair provably shares a key (substitutions share the deletion at
    the edited position, insert/delete pairs share the shorter term),
    so an equi-join on the variant followed by a levenshtein verify is
    EXACT. Scale: the blowup is x(len+1) blocking rows — the same
    inverted-index economics as the MinHash/SimHash band joins — and
    the oracle IS the quadratic definition, proving blocked ==
    all-pairs. The synthetic vocabulary is typo-free, so deterministic
    second-character-deletion typos are injected for every 50th doc's
    first token (the pii_redact non-vacuous-oracle precedent, replayed
    identically in SQL)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tx.tokens_expr("text").alias("toks"))
    corpus_terms = toks.select(F.explode("toks").alias("term"))
    typo_terms = (
        toks.select("doc_id", F.element_at("toks", 1).alias("tok"))
        .filter(
            (F.col("doc_id") % 50 == 0) & (F.length("tok") >= _TYPO_MIN_LEN + 1)
        )
        .select(
            F.concat(
                F.substring("tok", 1, 1), F.expr("substring(tok, 3)")
            ).alias("term")
        )
    )
    terms = (
        corpus_terms.unionAll(typo_terms)
        .filter(F.length("term") >= _TYPO_MIN_LEN)
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    variants = terms.select(
        "term",
        "n",
        F.explode(
            F.concat(
                F.array(F.col("term")),
                F.expr(
                    "transform(sequence(1, length(term)), i -> "
                    "concat(substring(term, 1, i - 1), substring(term, i + 1, length(term))))"
                ),
            )
        ).alias("block_key"),
    )
    a = variants.select(
        F.col("term").alias("term_a"), F.col("n").alias("n_a"), "block_key"
    )
    b = variants.select(
        F.col("term").alias("term_b"), F.col("n").alias("n_b"), "block_key"
    )
    cand = (
        a.join(b, "block_key")
        .filter(F.col("term_a") < F.col("term_b"))
        .select("term_a", "term_b", "n_a", "n_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("term_a", "term_b") == 1)


# --------------------------------------------------------------------------
# Cohort retention (event analytics)
# --------------------------------------------------------------------------

_RETENTION_MAX_OFFSET = 7


@register(
    "user_retention_cohorts",
    oracle=f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
firsts AS (SELECT user_id, min(d) AS cohort_date FROM ev GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, d FROM ev)
SELECT f.cohort_date,
       CAST(datediff('day', f.cohort_date, a.d) AS INT) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN firsts f ON f.user_id = a.user_id
WHERE datediff('day', f.cohort_date, a.d) <= {_RETENTION_MAX_OFFSET}
GROUP BY f.cohort_date, day_offset
""",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the event-analytics staple the registry's
    funnel/sessionize/rollup family lacked: users grouped by first-seen
    date, distinct active users per day offset (0..{_RETENTION_MAX_OFFSET}).
    Scale shape: one user-keyed aggregate for cohort dates, one
    distinct-day projection, then a user-keyed join (both sides
    pre-shuffled on the same key) and a small keyed count-distinct.
    Dates are wall-clock casts of NTZ timestamps — timezone-free on
    both engines; everything else is integer-exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    activity = ev.distinct()
    j = activity.join(firsts, "user_id").select(
        "cohort_date",
        F.datediff("d", "cohort_date").cast("int").alias("day_offset"),
        "user_id",
    )
    return (
        j.filter(F.col("day_offset") <= _RETENTION_MAX_OFFSET)
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


# --------------------------------------------------------------------------
# IVF deletion (the FAISS remove_ids contract)
# --------------------------------------------------------------------------

_IVF_DEL_MOD = 17
_IVF_DEL_RES = 3


def _ivf_delete_oracle() -> str:
    return _ivf_oracle(pred=f"vec_id % {_IVF_DEL_MOD} != {_IVF_DEL_RES}")


@register("ivf_search_after_delete", oracle=_ivf_delete_oracle)
def ivf_search_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index deletion — the FAISS remove_ids / IDSelector contract
    completing the lifecycle (build -> add -> DELETE -> persist): a
    tombstone id set (vec_id % {_IVF_DEL_MOD} == {_IVF_DEL_RES})
    broadcast-anti-joins the assignment, and search runs over the
    survivors with centroids frozen — deleting never refits or
    reassigns, exactly like FAISS. At scale the tombstone filter
    composes with cluster partition pruning (only probed directories
    are read, minus tombstones); physical reclamation is a compaction
    that rewrites ONLY the clusters containing deletions, since
    cluster_id is the partition key."""
    idx = _ivf_index(spark, sf_dir)
    tombstones = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _IVF_DEL_MOD == _IVF_DEL_RES)
        .select("vec_id")
    )
    alive = ivf_ops.IvfIndex(
        centroids=idx.centroids,
        assigned=idx.assigned.join(F.broadcast(tombstones), "vec_id", "left_anti"),
        nlist=idx.nlist,
        centroids_np=idx.centroids_np,
    )
    return ivf_ops.ivf_search(
        alive, _queries_df(spark, sf_dir), K, nprobe=_IVF_NPROBE
    )


# --------------------------------------------------------------------------
# IVF compaction (physical reclamation after remove_ids)
# --------------------------------------------------------------------------

_IVF_COMPACT_MOD = 97
_IVF_COMPACT_RES = 13


def _ivf_compact_oracle() -> str:
    """Replay the assignment from the centroid literals and compute the
    closed-form compaction ledger per cluster."""
    cent = _oracle_centroids_np()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2_row = _sql_l2("CAST(e.embedding AS DOUBLE[])", "c.centroid")
    dead = f"vec_id % {_IVF_COMPACT_MOD} = {_IVF_COMPACT_RES}"
    return f"""
WITH centroids(cluster_id, centroid) AS (VALUES
    {values}),
assigned AS (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c)
  WHERE rn = 1
)
SELECT CAST(cluster_id AS INT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_before,
       CAST(sum(CASE WHEN {dead} THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
       CAST(count(*) - sum(CASE WHEN {dead} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after,
       CAST(CASE WHEN sum(CASE WHEN {dead} THEN 1 ELSE 0 END) > 0
            THEN 1 ELSE 0 END AS INT) AS rewritten
FROM assigned
GROUP BY cluster_id
"""


@register("ivf_compact_stats", oracle=_ivf_compact_oracle)
def ivf_compact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index compaction — the physical-reclamation half of the deletion
    lifecycle (build -> add -> delete -> COMPACT): a ~1% tombstone set
    (vec_id % {_IVF_COMPACT_MOD} == {_IVF_COMPACT_RES}) is physically
    removed from the persisted partitioned layout by rewriting ONLY the
    cluster directories that contain tombstones
    (operators/ivf.ivf_compact — staged write + per-partition swap, the
    rewrite-then-commit pattern of every table format). Untouched
    cluster directories keep their files byte-identical
    (tests/test_ivf.py pins this), so compaction cost scales with the
    deleted fraction, never the 100 TB layout.

    The returned ledger is PHYSICAL proof, not bookkeeping: n_after is
    counted from the post-compaction parquet files per partition, while
    n_before/n_deleted come from the logical assignment — the oracle
    recomputes all of it from the centroid literals, so a compaction
    that dropped a survivor or kept a tombstone anywhere fails the
    hash. The layout is content-addressed and materialized
    post-compaction exactly once, so the entry is idempotent across
    gate/bench invocations."""
    import hashlib

    idx = _ivf_index(spark, sf_dir)
    dead = F.col("vec_id") % _IVF_COMPACT_MOD == _IVF_COMPACT_RES
    key = ("ivf_compacted", sf_dir)
    if key not in _INDEX_CACHE:
        cent_rows = idx.centroids.orderBy("cluster_id").collect()
        fp = hashlib.md5(
            repr([tuple(r) for r in cent_rows]).encode()
        ).hexdigest()[:12]
        path = "/tmp/nvdb_ivfc_" + hashlib.md5(
            f"{sf_dir}:{fp}:{_IVF_COMPACT_MOD}:{_IVF_COMPACT_RES}".encode()
        ).hexdigest()[:8]

        def _write(p: str) -> None:
            ivf_ops.ivf_write(idx, p)
            tombs = idx.assigned.filter(dead).select("vec_id")
            ivf_ops.ivf_compact(spark, p, tombs)

        _materialize_once(path, _write, marker="centroids/_SUCCESS")
        _INDEX_CACHE[key] = path
    path = _INDEX_CACHE[key]
    logical = idx.assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_before"),
        F.sum(dead.cast("long")).alias("n_deleted"),
    )
    physical = (
        spark.read.parquet(f"{path}/base")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_after"))
    )
    return (
        logical.join(physical, "cluster_id", "left")
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.col("n_before").cast("long").alias("n_before"),
            F.col("n_deleted").cast("long").alias("n_deleted"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            (F.col("n_deleted") > 0).cast("int").alias("rewritten"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-smoothed mixture weighting (the multilingual alpha knob)
# --------------------------------------------------------------------------


@register(
    "mixture_weights_temperature",
    oracle="""
WITH toks_m AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM toks_m GROUP BY source
),
shares AS (
  SELECT source, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE) AS natural_share
  FROM per_src
),
sq AS (SELECT *, sqrt(natural_share) AS sq_share FROM shares),
denom AS (SELECT list_aggregate(list(sq_share ORDER BY source), 'sum') AS d FROM sq),
tgt AS (
  SELECT source, n_docs, n_tokens, natural_share,
         sq_share / (SELECT d FROM denom) AS target_share
  FROM sq
),
rated AS (SELECT *, target_share / natural_share AS rate_raw FROM tgt)
SELECT source, n_docs, n_tokens, natural_share, target_share,
       rate_raw / max(rate_raw) OVER () AS keep_rate
FROM rated
""",
)
def mixture_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixture (the multilingual alpha
    sampling of XLM-R / mT5, alpha = 0.5): targets derive from the
    corpus itself as natural_share^alpha renormalized, flattening
    head-heavy sources without hand-set shares; realized downsample-only
    like mixture_weights. Cross-engine exactness: token totals are
    integer sums, natural shares one exact division, sqrt is IEEE, and
    the ONLY order-dependent float sum (the renormalizer over sources)
    runs as a source-ordered sequential fold on both engines."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tx.tokens_expr("text")).cast("long")
    )
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    wall = Window.partitionBy()
    shares = per.withColumn(
        "natural_share",
        F.col("n_tokens").cast("double") / F.sum("n_tokens").over(wall).cast("double"),
    ).withColumn("sq_share", F.sqrt("natural_share"))
    denom = shares.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "sq_share"))),
                lambda s: s["sq_share"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("__d")
    )
    rated = (
        shares.crossJoin(F.broadcast(denom))
        .withColumn("target_share", F.col("sq_share") / F.col("__d"))
        .withColumn("rate_raw", F.col("target_share") / F.col("natural_share"))
    )
    return rated.select(
        "source",
        "n_docs",
        "n_tokens",
        "natural_share",
        "target_share",
        (F.col("rate_raw") / F.max("rate_raw").over(wall)).alias("keep_rate"),
    )


# --------------------------------------------------------------------------
# Schema evolution: mergeSchema read over generations of a layout
# --------------------------------------------------------------------------


@register(
    "schema_evolution_read",
    oracle="""
SELECT CAST(v AS INT) AS v, source_tag,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS n_chars_total
FROM (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS v,
         CASE WHEN doc_id % 2 = 0 THEN '<legacy>' ELSE source END AS source_tag,
         CASE WHEN doc_id % 2 = 0 THEN NULL ELSE n_chars END AS nc
  FROM documents
)
GROUP BY v, source_tag
""",
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across layout generations — the long-lived-
    pipeline reality that columns get added later: generation v=1 wrote
    (doc_id, text, lang) only, v=2 added (source, n_chars). One
    mergeSchema read over the partitioned root unions both generations
    with NULLs for pre-existence, and the aggregation proves null
    semantics (count spans both, sum skips the legacy NULLs). At scale
    this is how a reader spans years of a hive-layout table without
    rewriting old partitions."""
    import hashlib
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "documents.parquet"))
    root = "/tmp/nvdb_schemaevo_" + hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]

    def _write(p: str) -> None:
        docs_w = load_table(spark, sf_dir, "documents")
        docs_w.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "text", "lang"
        ).write.mode("overwrite").parquet(f"{p}/v=1")
        docs_w.filter(F.col("doc_id") % 2 == 1).write.mode("overwrite").parquet(
            f"{p}/v=2"
        )

    _materialize_once(root, _write, marker="v=2/_SUCCESS")
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return (
        merged.select(
            F.col("v").cast("int").alias("v"),
            F.coalesce("source", F.lit("<legacy>")).alias("source_tag"),
            "n_chars",
        )
        .groupBy("v", "source_tag")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
    )


# --------------------------------------------------------------------------
# k-NN self-join (neighbor graph construction)
# --------------------------------------------------------------------------

_KNN_JOIN_K = 3


@register(
    "knn_self_join",
    oracle=f"""
WITH scored AS (
  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
)
SELECT src_id, nbr_id, score, rank FROM (
  SELECT src_id, nbr_id, score,
         CAST(row_number() OVER (PARTITION BY src_id
           ORDER BY score DESC, nbr_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {_KNN_JOIN_K}
""",
)
def knn_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN self-join: every vector's top-{_KNN_JOIN_K} nearest OTHER
    vectors — the neighbor-graph constructor behind clustering,
    label-propagation and kNN-graph ANN methods, and the per-row
    sibling of the radius search. Physical shape: the query side runs
    in blocks of at most the two-phase broadcast contract (Q <= 10k),
    each block one two-phase scan + exact rescore — the block-matmul
    economics an exact all-to-all kNN costs at any scale (every block
    rescans the base; the blocking only bounds driver/broadcast
    memory). Results union across blocks; self-pairs drop before
    ranking. When exactness can relax, the IVF-blocked plan
    (doc_search_ivf) replaces the full rescans."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_blocks = max(1, -(-n // topk_ops.MAX_BROADCAST_QUERIES))
    parts = []
    for b in range(n_blocks):
        q = emb.filter(F.col("vec_id") % n_blocks == b).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # k+1 candidates so dropping the self-pair still leaves k
        two = topk_ops.topk_multi(emb, q, _KNN_JOIN_K + 1, strategy="two_phase")
        parts.append(topk_ops.exact_rescore(emb, q, two))
    res = parts[0]
    for p in parts[1:]:
        res = res.unionAll(p)
    filtered = res.filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        filtered.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _KNN_JOIN_K)
        .select(
            F.col("query_id").alias("src_id"),
            F.col("vec_id").alias("nbr_id"),
            "score",
            "rank",
        )
    )


# --------------------------------------------------------------------------
# IVF cluster balance (the FAISS imbalance_factor diagnostic)
# --------------------------------------------------------------------------


def _ivf_balance_oracle() -> str:
    cent = _oracle_centroids_np()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2_row = _sql_l2("CAST(e.embedding AS DOUBLE[])", "c.centroid")
    return f"""
WITH centroids(cluster_id, centroid) AS (VALUES
    {values}),
assigned AS (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c)
  WHERE rn = 1
),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
  FROM assigned GROUP BY cluster_id
)
SELECT CAST({_IVF_NLIST} AS INT) AS nlist,
       CAST(count(*) AS BIGINT) AS n_nonempty,
       CAST(min(sz) AS BIGINT) AS min_size,
       CAST(max(sz) AS BIGINT) AS max_size,
       round({_IVF_NLIST} * CAST(sum(sz * sz) AS DOUBLE)
             / (CAST(sum(sz) AS DOUBLE) * CAST(sum(sz) AS DOUBLE)), 6) AS imbalance
FROM sizes
"""


@register("ivf_cluster_balance", oracle=_ivf_balance_oracle)
def ivf_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF list-size diagnostic — FAISS's imbalance_factor
    (nlist * sum(sz^2) / sum(sz)^2; 1.0 = perfectly balanced): the
    number that predicts probe-cost variance and partition skew of the
    cluster-partitioned layout, checked before shipping an index. One
    keyed count over the assignment (map-side partial) then a scalar
    aggregate — integer-exact until the final division."""
    idx = _ivf_index(spark, sf_dir)
    sizes = idx.assigned.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    aggd = sizes.agg(
        F.count("*").cast("long").alias("n_nonempty"),
        F.min("sz").cast("long").alias("min_size"),
        F.max("sz").cast("long").alias("max_size"),
        F.sum(F.col("sz") * F.col("sz")).alias("__ss"),
        F.sum("sz").alias("__s"),
    )
    return aggd.select(
        F.lit(_IVF_NLIST).cast("int").alias("nlist"),
        "n_nonempty",
        "min_size",
        "max_size",
        F.round(
            F.lit(_IVF_NLIST) * F.col("__ss").cast("double")
            / (F.col("__s").cast("double") * F.col("__s").cast("double")),
            6,
        ).alias("imbalance"),
    )


# --------------------------------------------------------------------------
# BPE merge learning (tokenizer training from the word-frequency table)
# --------------------------------------------------------------------------

_BPE_VOCAB_HEAD = 5_000
_BPE_N_MERGES = 10


def _bpe_fit_oracle():
    """Independently reproduce the merge list for the oracle fixture in
    pure Python from the parquet (pyarrow read + str.split word counts
    + the shared learner) — verifying Spark's distributed word-count
    aggregation end-to-end, the seeded-fit-literal trust model of the
    k-means/PQ oracles."""

    def fit():
        from collections import Counter

        import pyarrow.parquet as papq

        from nano_vectordb_spark.functions import bpe

        texts = (
            papq.read_table(f"{_ORACLE_SF}/documents.parquet", columns=["text"])
            .column("text")
            .to_pylist()
        )
        counts: Counter = Counter()
        for t in texts:
            for w in t.split(" "):
                if w:
                    counts[w] += 1
        head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_VOCAB_HEAD]
        return bpe.learn_merges(head, _BPE_N_MERGES)

    return _fit_cached("bpe_merges", fit)


def _bpe_oracle() -> str:
    def esc(s: str) -> str:
        return s.replace("'", "''")

    vals = ",\n    ".join(
        f"({step}, '{esc(l)}', '{esc(r)}', {c})"
        for step, l, r, c in _bpe_fit_oracle()
    )
    return f"""
SELECT CAST(step AS INT) AS step, left_sym, right_sym,
       CAST(pair_count AS BIGINT) AS pair_count
FROM (VALUES
    {vals}) AS t(step, left_sym, right_sym, pair_count)
"""


def _bpe_merges_spark(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """Shared train step: distributed word counts -> bounded vocabulary
    head -> driver-side merge loop (the k-means train/assign split)."""
    from nano_vectordb_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tx.tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(_BPE_VOCAB_HEAD)
        .collect()
    )
    return bpe.learn_merges(
        [(r["term"], int(r["c"])) for r in vocab], _BPE_N_MERGES
    )


@register("bpe_learn_merges", oracle=_bpe_oracle)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training: learn the first {n} BPE merges from the
    corpus (functions/bpe.py, the Sennrich et al. ACL'16 algorithm).
    Scale shape — the train/assign split again: the distributed work is
    ONE explode -> map-side-combined word-count aggregate ending in a
    TakeOrdered vocabulary head (top-{head} by count; the full corpus
    never re-scans per merge), and the merge loop runs driver-side over
    that bounded table exactly like real tokenizer trainers. The oracle
    re-derives the merges in pure Python straight from the parquet, so
    a Spark-side word-count discrepancy fails the hash."""
    merges = _bpe_merges_spark(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_count long"
    )


def _bpe_encode_oracle() -> str:
    """Fixture-specific encode oracle: the merge list is re-derived in
    pure Python (:func:`_bpe_fit_oracle`), every distinct corpus word is
    segmented with functions/bpe.segment_word, and the word->pieces map
    is embedded as a CASE literal (31 words at sf0.01) — the seeded-fit
    trust model. The ELSE branch is a '?' sentinel: an unseen word
    would hash-mismatch loudly instead of silently passing."""
    import pyarrow.parquet as papq

    from nano_vectordb_spark.functions import bpe

    merges = _bpe_fit_oracle()
    texts = (
        papq.read_table(f"{_ORACLE_SF}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    words = sorted({w for t in texts for w in t.split(" ") if w})

    def esc(s: str) -> str:
        return s.replace("'", "''")

    cases = "\n           ".join(
        f"WHEN '{esc(w)}' THEN '{esc(','.join(bpe.segment_word(w, merges)))}'"
        for w in words
    )
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
enc AS (
  SELECT doc_id, ws,
         coalesce(list_aggregate(list_transform(ws,
           w -> CASE w {cases}
           ELSE '?' END), 'string_agg', ','), '') AS tok
  FROM d
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(list_filter(string_split(tok, ','), x -> x <> ''))
            AS BIGINT) AS n_tokens,
       md5(tok) AS tokens_md5
FROM enc
"""


@register("bpe_encode_stats", oracle=_bpe_encode_oracle)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — encode every document with the learned
    BPE merges (the other half of bpe_learn_merges; together they are
    the full train->encode tokenizer lifecycle a training pipeline
    runs over the corpus; reference text path:
    scripts/build_vecbin_chunked.py's tokenize step).

    Scale shape: merges are learned once from the bounded vocabulary
    head (driver-side, like every fit here), then the ENCODE is a pure
    map-only JVM pass — each merge compiles to one regexp_replace over
    a SEP-joined symbol string (functions/bpe.merge_regex_steps, proven
    identical to the greedy segmenter), applied inside a native
    transform over the token array. Zero Python in the encode path,
    zero shuffles, whole-stage codegen end-to-end; per-doc output is
    token counts plus an md5 of the full piece sequence, so a single
    mis-segmented word anywhere in the corpus fails the hash."""
    from nano_vectordb_spark.functions import bpe

    steps = bpe.merge_regex_steps(_bpe_merges_spark(spark, sf_dir))

    def pieces_csv(w):
        e = F.array_join(F.filter(F.split(w, ""), lambda x: x != ""), bpe.SEP)
        for pat, repl in steps:
            e = F.regexp_replace(e, pat, repl)
        return F.translate(e, bpe.SEP, ",")

    docs = load_table(spark, sf_dir, "documents")
    words = tx.tokens_expr("text")
    tok = F.array_join(F.transform(words, pieces_csv), ",")
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(F.split(tok, ","), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
        F.md5(tok).alias("tokens_md5"),
    )


@register("events_anomaly_topk", oracle=_SQL_EVENTS_ANOMALY)
def events_anomaly_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier detection: the {_ANOM_K} most anomalous
    events by per-event-type z-score — the data-quality triage pass a
    training pipeline runs before trusting a telemetry source. Scale
    shape: per-type mean/variance from one map-side-combined aggregate
    over EXACT decimal sums (sum and sum-of-squares are both
    order-independent), broadcast back to the scan, then a global
    TakeOrdered over |z|. The wide-decimal -> double cast rounds
    differently between engines in the last ulp, so the z-score
    carries the standard 6-decimal rounding contract and ranking uses
    the rounded value."""
    return _sql_view_query(spark, sf_dir, _SQL_EVENTS_ANOMALY)


# --------------------------------------------------------------------------
# Exact-substring duplicate spans (the suffix-array dedup signal)
# --------------------------------------------------------------------------

_SSD_K = 32  # gram width (chars)
_SSD_STRIDE = 8

_SQL_SSD = f"""
WITH ex AS (
  SELECT doc_id, p,
         ('0x' || substr(md5(substr(text, CAST(p AS INT), {_SSD_K})), 1, 15))::BIGINT AS hh
  FROM (SELECT doc_id, text,
               unnest(range(1, length(text) - {_SSD_K - 2}, {_SSD_STRIDE})) AS p
        FROM documents WHERE length(text) >= {_SSD_K})
),
dup AS (SELECT hh FROM ex GROUP BY hh HAVING min(doc_id) <> max(doc_id)),
dp AS (SELECT doc_id, (p - 1) // {_SSD_STRIDE} AS idx FROM ex JOIN dup USING (hh)),
isl AS (
  SELECT doc_id,
         idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS g
  FROM dp
),
runs AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, g),
ds AS (
  SELECT doc_id, max(run) AS max_run, sum(run) AS n_dup
  FROM runs GROUP BY doc_id
),
base AS (SELECT doc_id, count(*) AS n_grams FROM ex GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(base.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(ds.n_dup, 0) AS BIGINT) AS n_dup_grams,
       CAST(CASE WHEN ds.max_run IS NULL THEN 0
                 ELSE (ds.max_run - 1) * {_SSD_STRIDE} + {_SSD_K}
            END AS BIGINT) AS max_dup_span_chars
FROM documents d
LEFT JOIN base USING (doc_id)
LEFT JOIN ds USING (doc_id)
"""


@register("substring_dup_spans", oracle=_SQL_SSD)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile: per document, how many
    {_SSD_K}-char grams (stride {_SSD_STRIDE}) also occur verbatim in
    ANOTHER document, and the longest contiguous duplicated span — the
    character-level exact-dup signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), whose suffix-array
    pass this strided gram inverted index approximates with span
    resolution {_SSD_STRIDE} chars.

    Scale shape: grams are 60-bit md5 hashes (never the raw text) so
    the dup-detection shuffle moves 8-byte keys — an inverted-index
    equi-join like decontaminate, never doc x doc; cross-doc dup test
    is min(doc_id) <> max(doc_id), a map-side-combinable aggregate, not
    countDistinct. Span reconstruction (gaps-and-islands over the
    per-doc dup positions) shuffles only the DUPLICATED positions by
    doc_id — at a healthy dedup rate that is a small fraction of the
    gram table. Both engines hash identically, so comparison stays
    exact even under (astronomically unlikely) hash collisions."""
    docs = load_table(spark, sf_dir, "documents")
    pos = F.when(
        F.length("text") >= _SSD_K,
        F.sequence(
            F.lit(1), F.length("text") - (_SSD_K - 1), F.lit(_SSD_STRIDE)
        ),
    ).otherwise(F.expr("array()").cast("array<int>"))
    gram = F.col("text").substr(F.col("p"), F.lit(_SSD_K))
    ex = docs.select("doc_id", "text", F.explode(pos).alias("p")).select(
        "doc_id",
        "p",
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long").alias("hh"),
    )
    dup = (
        ex.groupBy("hh")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
        .where(F.col("a") != F.col("b"))
        .select("hh")
    )
    dp = ex.join(dup, "hh", "left_semi").select(
        "doc_id", F.floor((F.col("p") - 1) / _SSD_STRIDE).alias("idx")
    )
    w = Window.partitionBy("doc_id").orderBy("idx")
    runs = (
        dp.withColumn("g", F.col("idx") - F.row_number().over(w))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("run"))
    )
    ds = runs.groupBy("doc_id").agg(
        F.max("run").alias("max_run"), F.sum("run").alias("n_dup")
    )
    base = ex.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        docs.select("doc_id")
        .join(base, "doc_id", "left")
        .join(ds, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.when(
                F.col("max_run").isNotNull(),
                (F.col("max_run") - 1) * _SSD_STRIDE + _SSD_K,
            )
            .otherwise(0)
            .cast("long")
            .alias("max_dup_span_chars"),
        )
    )


# --------------------------------------------------------------------------
# Per-key exponentially-weighted moving average (sequential-fold family)
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.25  # exact binary fraction: 0.25/0.75 carry no rounding

_SQL_EWMA = f"""
SELECT user_id,
       CAST(len(vs) AS BIGINT) AS n_events,
       list_reduce(vs, (acc, x) -> {_EWMA_ALPHA} * x
                                   + {1 - _EWMA_ALPHA} * acc) AS ewma_value
FROM (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id)
"""


@register("user_value_ewma", oracle=_SQL_EWMA)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event value
    (y_t = {_EWMA_ALPHA}*x_t + {1 - _EWMA_ALPHA}*y_t-1, seeded y_1 =
    x_1) — the online decayed-average feature every behavioral feature
    store materializes, and the representative of the RECURSIVE
    per-key-sequential operator class that plain window frames cannot
    express (each output depends on the previous OUTPUT, not a frame of
    inputs).

    Plan: one shuffle (groupBy user), per-key time-ordered native JVM
    fold (sort_array + aggregate) — no Python, no second shuffle, no
    driver residency. Exactness: alpha is an exact binary fraction and
    both engines run the identical multiply-add sequence in the same
    order, so the doubles are bit-identical with no rounding contract.
    At 100 TB with unbounded keys the same recurrence merges by
    segments — EWMA is associative under (value, decay^seg_len)
    combination, y = y_R + decay^n_R * contrib_L — so per-day partials
    roll up without re-scanning history; the per-key fold here is the
    bounded-key form."""
    ev = load_table(spark, sf_dir, "events")
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    fold = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * acc
        ),
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        fold.alias("ewma_value"),
    )


# --------------------------------------------------------------------------
# Multimodal payload near-dup (byte-signature blocking, codec-free)
# --------------------------------------------------------------------------

_MMND_L1 = 2      # max L1 distance between 16-bucket byte histograms
_MMND_LEN = 2     # max byte-length difference
_MMND_BUCKET = 64  # length-blocking bucket width (must be >= _MMND_LEN)

_SQL_MMND = f"""
WITH h AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS blen,
         list_transform(range(0, 16),
           n -> CAST(len(list_filter(string_split(text, ''),
                  c -> ascii(c) // 16 = n)) AS BIGINT)) AS hist
  FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(list_sum(list_transform(list_zip(a.hist, b.hist),
              p -> abs(p[1] - p[2]))) AS BIGINT) AS l1_dist,
       CAST(abs(a.blen - b.blen) AS BIGINT) AS len_diff
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE abs(a.blen - b.blen) <= {_MMND_LEN}
  AND list_sum(list_transform(list_zip(a.hist, b.hist),
        p -> abs(p[1] - p[2]))) <= {_MMND_L1}
"""


@register("multimodal_neardup", oracle=_SQL_MMND)
def multimodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection over OPAQUE binary payloads — the
    image/audio dedup pass a multimodal corpus runs before training,
    done codec-free: per-blob byte-histogram signatures (the
    perceptual-hash slot; operators/multimodal.byte_histogram_
    signatures, NumPy over Arrow batches) then pairs within L1 <=
    {_MMND_L1} and byte-length diff <= {_MMND_LEN}.

    Scale shape: signatures are a narrow no-shuffle map; candidate
    generation is a BLOCKED self-join on byte-length buckets (width
    {_MMND_BUCKET}) with +1-bucket probing — provably exact for the
    length bound since bucket width >= the length threshold, so a
    qualifying pair differs by at most one bucket. Verification
    (integer L1 over the 16-long histograms) runs inside the join —
    never doc x doc. The ORACLE is deliberately the quadratic all-pairs
    form, so a blocking scheme that missed any qualifying pair fails
    the row count. At corpus scale further signature dimensions
    (dominant-bucket id, mime type) compose multiplicatively into the
    block key the same way."""
    from nano_vectordb_spark.operators.multimodal import (
        attach_blob,
        byte_histogram_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = byte_histogram_signatures(attach_blob(docs))
    bucket = F.floor(F.col("byte_len") / _MMND_BUCKET)
    probes = sigs.select(
        "doc_id",
        "byte_len",
        "hist",
        F.explode(F.array(bucket, bucket + 1)).alias("bk"),
    )
    home = sigs.select(
        F.col("doc_id").alias("doc_id_y"),
        F.col("byte_len").alias("len_y"),
        F.col("hist").alias("hist_y"),
        F.floor(F.col("byte_len") / _MMND_BUCKET).alias("bk"),
    )
    l1 = F.aggregate(
        F.zip_with("hist", "hist_y", lambda p, q: F.abs(p - q)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        probes.join(home, "bk")
        .filter(F.col("doc_id") != F.col("doc_id_y"))
        .withColumn("l1_dist", l1)
        .withColumn("len_diff", F.abs(F.col("byte_len") - F.col("len_y")))
        .filter(
            (F.col("l1_dist") <= _MMND_L1) & (F.col("len_diff") <= _MMND_LEN)
        )
        .select(
            F.least("doc_id", "doc_id_y").alias("doc_id_a"),
            F.greatest("doc_id", "doc_id_y").alias("doc_id_b"),
            "l1_dist",
            "len_diff",
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Pipeline observability + cross-source diagnostics (round 3 tail):
# filter-funnel attribution, source-overlap containment matrix, and
# quality-aware canonical selection per near-dup cluster.
# --------------------------------------------------------------------------

_FUNNEL_MIN_TOKENS = 15


def _sql_filter_funnel() -> str:
    quality = (
        "0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 64.0) "
        "+ 0.3 * (1.0 - stopword_ratio) + 0.2 * (1.0 - punct_ratio)"
    )
    return f"""
WITH t AS ({_SQL_TOKS}),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains([{_SQL_EN_STOP}], x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
         CASE WHEN length(lower(text)) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(lower(text)) AS DOUBLE) END AS punct_ratio,
         {_sql_marker_hits("en")} AS en_hits,
         {_sql_marker_hits("de")} AS de_hits,
         {_sql_marker_hits("es")} AS es_hits,
         {_sql_marker_hits("fr")} AS fr_hits
  FROM t
),
s AS (
  SELECT CASE
           WHEN n_tokens < {_FUNNEL_MIN_TOKENS} THEN 1
           WHEN NOT (en_hits >= de_hits AND en_hits >= es_hits
                     AND en_hits >= fr_hits) THEN 2
           WHEN {quality} < {_QUALITY_T} THEN 3
           ELSE 4 END AS stage_id
  FROM m
),
c AS (SELECT stage_id, CAST(count(*) AS BIGINT) AS n_docs FROM s GROUP BY stage_id),
st AS (SELECT * FROM (VALUES (1, 'too_short'), (2, 'non_english'),
                             (3, 'low_quality'), (4, 'kept')) v(stage_id, stage)),
f AS (
  SELECT st.stage_id, st.stage, coalesce(c.n_docs, 0) AS n_docs
  FROM st LEFT JOIN c USING (stage_id)
)
SELECT stage_id, stage, n_docs,
       CAST((SELECT sum(n_docs) FROM f)
            - sum(CASE WHEN stage_id <= 3 THEN n_docs ELSE 0 END)
              OVER (ORDER BY stage_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS remaining
FROM f
"""


@register("filter_funnel", oracle=_sql_filter_funnel())
def filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule drop attribution for the corpus-cleaning filter chain —
    the observability report every production pipeline emits alongside
    its output (which rule removed how many docs, and what remains
    after each stage). First-failing-rule-wins attribution over the
    same length / language / quality predicates corpus_clean applies.

    Scale shape: one CASE projection over the scan (no Python, no
    shuffle beyond a 4-group partial agg), then window math over the
    four-row funnel — per-rule accounting is free at any corpus size.
    """
    d = _toks_df(spark, sf_dir)
    hits = {
        lang: tx.marker_hits_expr(F.col("toks"), tx.LANG_MARKERS[lang])
        for lang in ("en", "de", "es", "fr")
    }
    staged = d.select(
        F.when(F.size("toks") < _FUNNEL_MIN_TOKENS, 1)
        .when(
            tx.lang_pred_expr(hits["en"], hits["de"], hits["es"], hits["fr"])
            != "en",
            2,
        )
        .when(tx.quality_expr(F.col("toks"), "text") < _QUALITY_T, 3)
        .otherwise(4)
        .alias("stage_id")
    )
    counts = staged.groupBy("stage_id").agg(F.count("*").alias("n_docs"))
    stages = spark.createDataFrame(
        [(1, "too_short"), (2, "non_english"), (3, "low_quality"), (4, "kept")],
        "stage_id int, stage string",
    )
    funnel = stages.join(counts, "stage_id", "left").select(
        "stage_id",
        "stage",
        F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
    )
    total = F.sum("n_docs").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    dropped = F.sum(
        F.when(F.col("stage_id") <= 3, F.col("n_docs")).otherwise(F.lit(0))
    ).over(Window.orderBy("stage_id").rowsBetween(Window.unboundedPreceding, 0))
    return funnel.withColumn("remaining", (total - dropped).cast("long"))


def _sql_source_overlap() -> str:
    n = _DECON_N
    return f"""
WITH t AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT DISTINCT source, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS hh FROM (
    SELECT source, unnest(list_distinct(list_transform(
             range(1, len(toks) - {n - 2}),
             i -> array_to_string(toks[i:i+{n - 1}], ' ')))) AS sh
    FROM t WHERE len(toks) >= {n})
),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY source),
p AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS shared_shingles
  FROM s a JOIN s b ON a.hh = b.hh AND a.source <> b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, shared_shingles,
       round(CAST(shared_shingles AS DOUBLE) / t.n, 6) AS containment
FROM p JOIN tot t ON p.src_a = t.source
"""


@register("source_overlap", oracle=_sql_source_overlap())
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every ordered source pair
    (A, B), the count of distinct {_DECON_N}-token shingles A shares
    with B and the containment ratio |A∩B| / |A| — the diagnostic that
    decides whether two crawl snapshots / data vendors are near-copies
    before mixture weighting double-counts them.

    Scale shape: distinct (source, shingle-hash) postings (one
    shuffle), then an inverted-index self-equi-join on the 60-bit hash
    — posting-list economics, never doc×doc or source×source scans —
    and a final agg on |sources|² keys with broadcast per-source
    totals."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup_ops.ngram_shingles(docs, n=_DECON_N, extra_cols=("source",))
    # the distinct posting table feeds three plan branches (per-source
    # totals + both sides of the hash self-join): persist it once so
    # the shingle explode+distinct shuffle runs once, not three times
    post = (
        sh.select("source", F.explode("shingles").alias("sh"))
        .select(
            "source",
            F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10)
            .cast("long")
            .alias("hh"),
        )
        .distinct()
        .persist()
    )
    totals = post.groupBy("source").agg(F.count("*").alias("n"))
    a = post.select(F.col("source").alias("src_a"), "hh")
    b = post.select(F.col("source").alias("src_b"), "hh")
    pairs = (
        a.join(b, "hh")
        .filter(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("shared_shingles"))
    )
    return pairs.join(
        F.broadcast(totals.withColumnRenamed("source", "src_a")), "src_a"
    ).select(
        "src_a",
        "src_b",
        "shared_shingles",
        F.round(F.col("shared_shingles") / F.col("n"), 6).alias("containment"),
    )


_SQL_DEDUP_KEEP_LONGEST = f"""
WITH comp AS (
  SELECT id, component FROM ({_SQL_DEDUP_COMPONENTS})
),
j AS (
  SELECT c.component, c.id, d.n_chars
  FROM comp c JOIN documents d ON c.id = d.doc_id
),
r AS (
  SELECT component, id, n_chars,
         row_number() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, id ASC) AS rn,
         count(*) OVER (PARTITION BY component) AS group_size
  FROM j
)
SELECT CAST(component AS BIGINT) AS component,
       CAST(id AS BIGINT) AS keeper_id,
       CAST(group_size AS BIGINT) AS group_size,
       n_chars AS keeper_chars
FROM r WHERE rn = 1
"""


@register("dedup_keep_longest", oracle=_SQL_DEDUP_KEEP_LONGEST)
def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection per near-dup cluster: resolve
    MinHash-LSH pairs into connected components, then keep the LONGEST
    member of each cluster (ties to the lowest doc_id) — the keeper
    rule real corpus pipelines use instead of min-id, because near-dup
    clusters typically contain truncated variants of one full document.

    Scale shape: the component label table is tiny (only docs appearing
    in some pair), so it broadcasts into the join against the corpus;
    the argmax is a per-component window over cluster-sized groups."""
    edges = minhash_lsh_pairs(spark, sf_dir)
    comp = comp_ops.connected_components(edges)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "n_chars"
    )
    j = docs.join(F.broadcast(comp), "id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("id")
    )
    return (
        j.select(
            "component",
            "id",
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("component")).alias("group_size"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("id").alias("keeper_id"),
            "group_size",
            F.col("n_chars").alias("keeper_chars"),
        )
    )


@register(
    "stream_heavy_hitters",
    oracle="""
WITH c AS (
  SELECT date_trunc('hour', ts) AS window_start, user_id,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start, user_id, n_events, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY window_start
              ORDER BY n_events DESC, user_id ASC) AS INT) AS rank
  FROM c)
WHERE rank <= 3
""",
)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: top-3 users per tumbling hour, computed
    as a REAL streaming (window x user) pre-aggregation (file source,
    watermark, Trigger.AvailableNow) ranked batch-side — the
    streaming-rollup-plus-serving-rank split production uses because
    chained aggregations cannot run in one streaming query. Oracle is
    the equivalent batch SQL: stream and batch must agree row for row."""
    from nano_vectordb_spark.streaming.events import heavy_hitters_stream

    return heavy_hitters_stream(spark, sf_dir)


@register(
    "embedding_dim_stats",
    oracle="""
WITH e AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
),
x AS (SELECT CAST(dim AS INT) AS dim, v[CAST(dim AS INT) + 1] AS val FROM e)
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       round(avg(val), 6) AS avg_val,
       round(avg(val * val) - avg(val) * avg(val), 6) AS var_val,
       min(val) AS min_val,
       max(val) AS max_val
FROM x GROUP BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean / variance / range) —
    the drift-and-normalization diagnostic run before quantizer
    training (SQ8's per-dimension ranges, OPQ's rotation) and between
    embedding-model versions (a shifted dimension means re-embedding,
    not re-indexing).

    Scale shape: posexplode is pipelined into a hash aggregate keyed by
    the D dimension ids, so map-side partial aggregation reduces every
    partition to D rows before the one tiny shuffle — no N×D
    materialization ever exists."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        )
    )
    a = ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.avg("val").alias("m"),
        F.avg(F.col("val") * F.col("val")).alias("m2"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    return a.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        F.round("m", 6).alias("avg_val"),
        F.round(F.col("m2") - F.col("m") * F.col("m"), 6).alias("var_val"),
        "min_val",
        "max_val",
    )


def _sql_corpus_report() -> str:
    quality = (
        "0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 64.0) "
        "+ 0.3 * (1.0 - stopword_ratio) + 0.2 * (1.0 - punct_ratio)"
    )
    return f"""
WITH t AS (
  SELECT source, lang, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT source, lang, text,
         CAST(len(toks) AS INT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains([{_SQL_EN_STOP}], x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
         CASE WHEN length(lower(text)) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(lower(text)) AS DOUBLE) END AS punct_ratio
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
       round(avg({quality}), 6) AS avg_quality
FROM m GROUP BY source
"""


@register("corpus_report", oracle=_sql_corpus_report())
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile: doc and language counts, total
    tokens, exact-duplicate count, mean quality — the one-page report a
    data vendor hand-off or crawl snapshot gets before anyone spends
    GPU-hours on it (the companion to filter_funnel's per-rule view).

    Scale shape: every statistic is a map-side-combinable aggregate
    over the scan keyed by |sources| groups; the distinct-counts
    shuffle (source, lang) / (source, md5) pairs, never documents."""
    d = _toks_df(spark, sf_dir)
    q = tx.quality_expr(F.col("toks"), "text")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.size("toks").cast("long")).alias("total_tokens"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_dup_docs"),
        F.round(F.avg(q), 6).alias("avg_quality"),
    )


def _sql_minhash_estimator_error() -> str:
    k = 16
    eq = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return f"""
WITH {_sql_minhash_base()},
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
pair AS (
  SELECT CAST({eq} AS DOUBLE) / {k}.0 AS est_j,
         CAST(len(list_intersect(ha.shingles, hb.shingles)) AS DOUBLE)
           / CAST(len(ha.shingles) + len(hb.shingles)
                  - len(list_intersect(ha.shingles, hb.shingles)) AS DOUBLE) AS jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a_id
  JOIN sig sb ON sb.doc_id = c.b_id
  JOIN sh ha ON ha.doc_id = c.a_id
  JOIN sh hb ON hb.doc_id = c.b_id
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(abs(est_j - jaccard)), 6) AS mean_abs_err,
       round(max(abs(est_j - jaccard)), 6) AS max_abs_err,
       round(avg(est_j - jaccard), 6) AS mean_bias
FROM pair
"""


@register("minhash_estimator_error", oracle=_sql_minhash_estimator_error())
def minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator audit over the LSH candidate pairs: signature
    estimate (equal-slot fraction, k=16) vs exact shingle Jaccard —
    mean/max absolute error and bias. The dedup-family analog of
    quant_error_stats: the evidence that the chosen k is accurate
    enough before the near-dup pass scales to the full corpus."""
    key = ("minhash_est_err", sf_dir)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = dedup_ops.minhash_estimator_error(
            load_table(spark, sf_dir, "documents")
        )
    return _INDEX_CACHE[key]


@register(
    "quantize_error_by_dim",
    oracle=f"""
WITH enc AS (
  SELECT s.vec_id, s.e, s.scale,
         list_transform(s.e, x -> CAST(
           CASE WHEN s.scale = 0 THEN 0
                ELSE greatest(-127.0, least(127.0, round_even(x / CAST(s.scale AS DOUBLE), 0)))
           END AS TINYINT)) AS codes
  FROM ({_SQL_I8_PRE}) s
),
a AS (
  SELECT list_transform(list_zip(codes, e),
           p -> abs(CAST(p[1] AS DOUBLE) * CAST(scale AS DOUBLE) - p[2])) AS errs
  FROM enc
),
x AS (
  SELECT CAST(dim AS INT) AS dim, errs[CAST(dim AS INT) + 1] AS a
  FROM (SELECT errs, unnest(range(0, len(errs))) AS dim FROM a)
)
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       round(sqrt(avg(a * a)), 9) AS rmse,
       max(a) AS max_abs_err
FROM x GROUP BY dim
""",
)
def quantize_error_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION reconstruction error of the per-row max-abs i8
    codec — the diagnostic that shows which dimensions a row-wise scale
    serves worst (dimensions with small dynamic range inherit the
    row's coarse step), i.e. the measured case for SQ8's per-dimension
    trained ranges. Companion to embedding_dim_stats on the quantized
    side of the ladder.

    Scale shape: same single-scan encode as quantize_i8, then
    posexplode pipelined into a D-key hash aggregate with map-side
    combine — one tiny exchange, no N×D shuffle."""
    enc = _i8_base(spark, sf_dir)
    scale_d = F.col("scale").cast("double")
    errs = F.zip_with(
        F.col("embedding_i8").cast("array<double>"),
        F.col("embedding").cast("array<double>"),
        lambda c, x: F.abs(c * scale_d - x),
    )
    ex = enc.select(F.posexplode(errs).alias("dim", "a"))
    return ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.round(F.sqrt(F.avg(F.col("a") * F.col("a"))), 9).alias("rmse"),
        F.max("a").alias("max_abs_err"),
    )


_AUTOTUNE_TARGET = 0.8


def _sql_ivf_autotune() -> str:
    return f"""
WITH sweep AS ({_ivf_sweep_oracle()}),
sel AS (
  SELECT *, row_number() OVER (ORDER BY nprobe ASC) AS rn
  FROM sweep WHERE recall_at_k >= {_AUTOTUNE_TARGET}
)
SELECT nprobe, n_hits, n_queries, recall_at_k,
       round(CAST(nprobe AS DOUBLE) / {_IVF_NLIST}.0, 6) AS probe_fraction
FROM sel WHERE rn = 1
"""


@register("ivf_nprobe_autotune", oracle=_sql_ivf_autotune)
def ivf_nprobe_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection (the FAISS AutoTune contract): the
    MINIMUM nprobe whose measured recall@{K} meets the
    {_AUTOTUNE_TARGET} target, with the probe fraction that nprobe
    implies — i.e. what fraction of base bytes every future query must
    scan to hit the recall SLO. This is the decision the recall sweep
    exists to inform; recall is an exact integer-hit division, so the
    threshold comparison is engine-exact."""
    sweep = ivf_recall_sweep(spark, sf_dir)
    return (
        sweep.filter(F.col("recall_at_k") >= _AUTOTUNE_TARGET)
        .orderBy("nprobe")
        .limit(1)
        .withColumn(
            "probe_fraction",
            F.round(F.col("nprobe").cast("double") / F.lit(float(_IVF_NLIST)), 6),
        )
    )


@register(
    "lang_id_confusion",
    oracle=f"""
WITH t AS (
  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT lang,
         {_sql_marker_hits("en")} AS en_hits,
         {_sql_marker_hits("de")} AS de_hits,
         {_sql_marker_hits("es")} AS es_hits,
         {_sql_marker_hits("fr")} AS fr_hits
  FROM t
),
p AS (
  SELECT lang,
         CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
              WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
              WHEN es_hits >= fr_hits THEN 'es'
              ELSE 'fr' END AS pred_lang
  FROM m
),
c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2)
SELECT lang, pred_lang, n,
       round(CAST(n AS DOUBLE) /
             CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
FROM c
""",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix against the corpus's ground-truth
    labels: per (actual, predicted) pair, the doc count and its share
    of the actual language — the classifier audit that belongs next to
    recall@k and the MinHash estimator error (every approximation in
    the pipeline gets a measured error surface). Deliberately exposes
    that the 4-marker classifier routes zh docs to its tie-break
    default. Map-only CASE projection + a |langs|² aggregate."""
    d = _toks_df(spark, sf_dir)
    hits = {
        lang: tx.marker_hits_expr(F.col("toks"), tx.LANG_MARKERS[lang])
        for lang in ("en", "de", "es", "fr")
    }
    pred = d.select(
        "lang",
        tx.lang_pred_expr(
            hits["en"], hits["de"], hits["es"], hits["fr"]
        ).alias("pred_lang"),
    )
    c = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy("lang"))
    return c.withColumn(
        "share", F.round(F.col("n").cast("double") / total.cast("double"), 6)
    )


@register(
    "neardup_rate_by_source",
    oracle=lambda: f"""
WITH pairs AS ({_sql_minhash_lsh()}),
d AS (
  SELECT DISTINCT doc_id FROM (
    SELECT a_id AS doc_id FROM pairs
    UNION ALL
    SELECT b_id AS doc_id FROM pairs)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(d.doc_id) AS BIGINT) AS n_dup_docs,
       round(CAST(count(d.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
GROUP BY source
""",
)
def neardup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplication rate per source: share of each source's docs
    that appear in at least one verified MinHash-LSH pair — the
    per-vendor dup-rate line every corpus intake report carries (a
    source that is mostly near-dups of itself gets renegotiated, not
    deduped). Reuses the memoized LSH pair plan; the flagged-id set is
    tiny, so it broadcasts into the corpus join."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    dup_ids = (
        pairs.select(F.explode(F.array("a_id", "b_id")).alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    flagged = docs.join(F.broadcast(dup_ids), "doc_id", "left")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count("is_dup").alias("n_dup_docs"),
        F.round(
            F.count("is_dup").cast("double") / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
    )


@register(
    "user_activity_skew",
    oracle="""
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
)
SELECT CAST(length(bin(n)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n) AS BIGINT) AS total_events,
       CAST(max(n) AS BIGINT) AS max_events
FROM c GROUP BY 1
""",
)
def user_activity_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew histogram: users bucketed by the bit length of their
    event count (power-of-two buckets without touching libm — binary
    string length is integer-exact on both engines). This is the query
    you run BEFORE choosing a salt factor for a user-keyed aggregation
    (operators/skew.py): a heavy tail here is the evidence that a
    plain groupBy would hot-spot one reducer at 100 TB.

    Scale shape: per-user partial counts combine map-side; the bucket
    rollup is a second tiny agg over |users| rows."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    return (
        c.select(
            F.length(F.conv(F.col("n").cast("string"), 10, 2))
            .cast("int")
            .alias("bucket"),
            "n",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n").alias("total_events"),
            F.max("n").alias("max_events"),
        )
    )


def _sql_ivf_probe_cost() -> str:
    cent = _oracle_centroids_np()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2_row = _sql_l2("CAST(e.embedding AS DOUBLE[])", "c.centroid")
    l2_q = _sql_l2("CAST(q.embedding AS DOUBLE[])", "c.centroid")
    per_np = "\nUNION ALL\n".join(
        f"""
  SELECT {np} AS nprobe,
         CAST(sum(qsz) AS BIGINT) AS total_rows_scanned,
         CAST(sum(qsz) AS DOUBLE) / (SELECT count(*) FROM q) AS avg_rows_per_query,
         CAST(max(qsz) AS BIGINT) AS max_rows_per_query,
         CAST(sum(qsz) AS DOUBLE)
               / ((SELECT count(*) FROM q) * (SELECT n_rows FROM tot)) AS scan_fraction
  FROM (
    SELECT p.query_id, sum(s.sz) AS qsz
    FROM probe_rank p JOIN sizes s USING (cluster_id)
    WHERE p.rn <= {np}
    GROUP BY p.query_id)"""
        for np in _IVF_SWEEP_NPROBES
    )
    return f"""
WITH centroids(cluster_id, centroid) AS (VALUES
    {values}),
q AS ({_SQL_QUERIES}),
assigned AS (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2_row} ASC, c.cluster_id ASC) AS rn
    FROM embeddings e CROSS JOIN centroids c)
  WHERE rn = 1
),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz FROM assigned GROUP BY cluster_id
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM embeddings),
probe_rank AS (
  SELECT q.query_id, c.cluster_id,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY {l2_q} ASC, c.cluster_id ASC) AS rn
  FROM q CROSS JOIN centroids c
)
SELECT * FROM ({per_np})
"""


@register("ivf_probe_cost", oracle=_sql_ivf_probe_cost)
def ivf_probe_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-cost ladder: for every sweep nprobe, the rows each query's
    probed clusters actually contain (total / avg / per-query max) and
    the corpus scan fraction — the capacity-planning twin of
    ivf_recall_sweep (recall ladder = quality axis, this = bytes axis;
    autotune picks the knee between them). Also surfaces probe-cost
    VARIANCE: with imbalanced lists (ivf_cluster_balance) the max row
    shows the straggler query a mean-only model hides.

    Cluster sizes come from one tiny aggregate over the assignment;
    probing replays stage 1's driver-side NumPy ranking, so the whole
    ladder costs one Spark job."""
    import numpy as np

    index = _ivf_index(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    qrows = q.select("query_id", "embedding").collect()
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
    nq = len(qrows)
    size_rows = index.assigned.groupBy("cluster_id").agg(
        F.count("*").alias("sz")
    ).collect()
    sizes = {int(r["cluster_id"]): int(r["sz"]) for r in size_rows}
    n_rows = sum(sizes.values())
    cent = ivf_ops.centroids_matrix(index)
    out = []
    for nprobe in _IVF_SWEEP_NPROBES:
        qsz = [
            sum(sizes.get(int(c), 0) for c in probed)
            for probed in ivf_ops.probe_ids_np(cent, qmat, nprobe)
        ]
        total = sum(qsz)
        out.append(
            (
                nprobe,
                total,
                total / nq,
                max(qsz),
                total / (nq * n_rows),
            )
        )
    return spark.createDataFrame(
        out,
        "nprobe int, total_rows_scanned bigint, avg_rows_per_query double,"
        " max_rows_per_query bigint, scan_fraction double",
    )


def _sql_rankers_agreement() -> str:
    qvals = ",\n    ".join(
        f"({-(qid + 1)}, 0, '{' '.join(terms)}', 0)"
        for qid, terms in _BM25_QUERIES
    )
    return f"""
WITH lex AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id
  FROM ({_bm25_oracle(_RRF_POOL)})
),
units AS (
  SELECT doc_id, 0 AS chunk_id, text AS chunk,
         CAST(length(text) AS INT) AS chunk_chars
  FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {qvals}) v(doc_id, chunk_id, chunk, chunk_chars)
),
{_sql_embed_ctes('units')},
demb AS (SELECT doc_id AS vec_id, emb FROM embedded WHERE doc_id >= 0),
qemb AS (SELECT -doc_id - 1 AS query_id, emb FROM embedded WHERE doc_id < 0),
sem AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id FROM (
    SELECT q.query_id, d.vec_id AS doc_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(d.emb, q.emb) DESC, d.vec_id ASC) AS rank
    FROM demb d CROSS JOIN qemb q)
  WHERE rank <= {_RRF_POOL}
),
l AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_lex FROM lex GROUP BY 1),
s AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_sem FROM sem GROUP BY 1),
c AS (
  SELECT lex.query_id, CAST(count(*) AS BIGINT) AS n_common
  FROM lex JOIN sem USING (query_id, doc_id) GROUP BY 1
)
SELECT l.query_id, n_lex, n_sem,
       coalesce(n_common, CAST(0 AS BIGINT)) AS n_common,
       CAST(coalesce(n_common, 0) AS DOUBLE)
         / (n_lex + n_sem - coalesce(n_common, 0)) AS jaccard
FROM l JOIN s USING (query_id) LEFT JOIN c ON c.query_id = l.query_id
"""


@register("rankers_agreement", oracle=_sql_rankers_agreement)
def rankers_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-vs-semantic ranker agreement: per query, the Jaccard
    overlap of the two top-{_RRF_POOL} pools — the complementarity
    measurement that justifies (or kills) hybrid RRF fusion: high
    overlap means fusion adds nothing, low overlap means each ranker
    sees docs the other misses. Integer set sizes + one exact IEEE
    division; both pools reuse the proven ranker plans, the overlap is
    a join of two Q x pool row sets."""
    docs = load_table(spark, sf_dir, "documents")
    lex = lexical_ops.bm25_search(
        spark, docs, _BM25_QUERIES, k=_RRF_POOL
    ).select(F.col("query_id").cast("long").alias("query_id"), "doc_id")
    units = docs.select(
        "doc_id",
        F.lit(0).alias("chunk_id"),
        F.col("text").alias("chunk"),
        F.length("text").cast("int").alias("chunk_chars"),
    )
    qrows = spark.createDataFrame(
        [(-(qid + 1), 0, " ".join(terms), 0) for qid, terms in _BM25_QUERIES],
        "doc_id long, chunk_id int, chunk string, chunk_chars int",
    )
    emb = text_ops.hash_embed(units.unionByName(qrows), dim=_EMBED_DIM)
    demb = emb.filter(F.col("doc_id") >= 0).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    qemb = emb.filter(F.col("doc_id") < 0).select(
        (-F.col("doc_id") - 1).alias("query_id"), "embedding"
    )
    sem = topk_ops.topk_multi(demb, qemb, _RRF_POOL, strategy="two_phase")
    sem = topk_ops.exact_rescore(demb, qemb, sem).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
    )
    l = lex.groupBy("query_id").agg(F.count("*").alias("n_lex"))
    s = sem.groupBy("query_id").agg(F.count("*").alias("n_sem"))
    c = (
        lex.join(sem, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        l.join(s, "query_id")
        .join(c, "query_id", "left")
        .select(
            "query_id",
            "n_lex",
            "n_sem",
            F.coalesce("n_common", F.lit(0).cast("long")).alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / (
                    F.col("n_lex")
                    + F.col("n_sem")
                    - F.coalesce("n_common", F.lit(0))
                ).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "pack_efficiency",
    oracle=f"""
{_SQL_PACK_CTES},
packs AS (
  SELECT bucket, pack_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
  FROM packed GROUP BY bucket, pack_id
)
SELECT CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
       CAST(count_if(pack_tokens > {_PACK_BUDGET}) AS BIGINT) AS n_overbudget,
       CAST(sum(pack_tokens) AS DOUBLE) / (count(*) * {_PACK_BUDGET}.0) AS utilization,
       min(CAST(pack_tokens AS DOUBLE) / {_PACK_BUDGET}.0) AS min_fill,
       max(CAST(pack_tokens AS DOUBLE) / {_PACK_BUDGET}.0) AS max_fill
FROM packs
""",
)
def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-quality audit over pack_sequences' output: pack count,
    token utilization (tokens packed / capacity), min/max fill, and
    over-budget packs (oversize single documents) — the wasted-compute
    number a training job reads before committing GPU-hours to a
    packed dataset (utilization 0.9 means 10% of every batch is
    padding). Integer sums + exact IEEE divisions over the pack table;
    same {_PACK_BUCKETS}-bucket parallel fold underneath."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tx.tokens_expr("text")).cast("long")
    )
    packs = pipe_ops.pack_sequences(docs, _PACK_BUDGET, _PACK_BUCKETS)
    budget = F.lit(float(_PACK_BUDGET))
    return packs.agg(
        F.count("*").alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("pack_tokens").alias("total_tokens"),
        F.sum((F.col("pack_tokens") > _PACK_BUDGET).cast("long")).alias(
            "n_overbudget"
        ),
        (
            F.sum("pack_tokens").cast("double") / (F.count("*") * budget)
        ).alias("utilization"),
        F.min(F.col("pack_tokens").cast("double") / budget).alias("min_fill"),
        F.max(F.col("pack_tokens").cast("double") / budget).alias("max_fill"),
    )


_BF_M = 2048
_BF_K = 3
_BF_SEG = "BUILDING"

_SQL_BLOOM_PRUNE = f"""
WITH seeds(s) AS (VALUES (0), (1), (2)),
keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = '{_BF_SEG}'
),
bits AS (
  SELECT DISTINCT CAST(('0x' || substr(md5('bf' || CAST(s.s AS VARCHAR) || ':'
              || CAST(k.k AS VARCHAR)), 1, 15))::BIGINT % {_BF_M} AS INT) AS pos
  FROM keys k, seeds s
),
probe AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
         CAST(count(b.pos) AS INT) AS hits
  FROM orders o
  CROSS JOIN seeds s
  LEFT JOIN bits b
    ON b.pos = CAST(('0x' || substr(md5('bf' || CAST(s.s AS VARCHAR) || ':'
                 || CAST(o.o_custkey AS VARCHAR)), 1, 15))::BIGINT % {_BF_M} AS INT)
  GROUP BY 1, 2, 3
),
flags AS (
  SELECT p.o_totalprice,
         (p.hits = {_BF_K}) AS pass,
         EXISTS (SELECT 1 FROM keys k WHERE k.k = p.o_custkey) AS member
  FROM probe p
)
SELECT CAST(count(*) AS BIGINT) AS n_fact,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       CAST(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
       round(CAST(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) - sum(CASE WHEN member THEN 1 ELSE 0 END) AS DOUBLE),
             6) AS fp_rate,
       CAST(sum(CASE WHEN member THEN CAST(o_totalprice AS DECIMAL(18,2))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS matched_revenue
FROM flags
"""


@register("bloom_join_prune", oracle=_SQL_BLOOM_PRUNE)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast Bloom-filter semi-join prune (operators/bloom.py): the
    scale path for fact-vs-keyset semi-joins when the key set outgrows
    the broadcast budget. The dim side aggregates to AT MOST m=2048
    bit positions (driver state bounded by m, never by |keys|), the
    bits broadcast as an m-int literal, and the orders scan is pruned
    MAP-SIDE by three native md5 bit probes before the exact
    broadcast-semi-join removes the false positives. Emits the audit
    row — fact/pass/match/FP counts, measured FP rate, exact decimal
    revenue of true matches — and the md5 hashing makes every one of
    those numbers (including n_fp) exactly replayable in DuckDB."""
    from nano_vectordb_spark.operators import bloom as bloom_ops

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = cust.where(F.col("c_mktsegment") == _BF_SEG).select(
        F.col("c_custkey").alias("k")
    ).distinct()
    bits = bloom_ops.build_bloom_bits(keys, "k", _BF_M, _BF_K)
    # Audit plan: ONE fact scan — the bloom probe and the exact
    # membership flag (broadcast left join against the key set) are
    # evaluated side by side so pass/match/FP counts come out of a
    # single map-side-combined aggregate. Production pruning uses
    # bloom_ops.bloom_prune(fact, ...) ahead of the exchange.
    flagged = (
        orders.join(
            F.broadcast(keys.withColumn("__member", F.lit(1))),
            orders["o_custkey"] == keys["k"],
            "left",
        )
        .select(
            "o_totalprice",
            bloom_ops.bloom_pass_expr("o_custkey", bits, _BF_K).alias("pass"),
            F.col("__member").isNotNull().alias("member"),
        )
    )
    return flagged.agg(
        F.count("*").alias("n_fact"),
        F.sum(F.col("pass").cast("long")).alias("n_pass"),
        F.sum(F.col("member").cast("long")).alias("n_match"),
        F.sum((F.col("pass") & ~F.col("member")).cast("long")).alias("n_fp"),
        F.round(
            F.sum((F.col("pass") & ~F.col("member")).cast("long")).cast("double")
            / (F.count("*") - F.sum(F.col("member").cast("long"))).cast("double"),
            6,
        ).alias("fp_rate"),
        F.sum(
            F.when(
                F.col("member"), F.col("o_totalprice").cast("decimal(18,2)")
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("matched_revenue"),
    )


_Z_FILES = 32
_Z_BITS = 5
_Z_UB_LO, _Z_UB_HI = 4, 11
_Z_DB_LO, _Z_DB_HI = 8, 15

_SQL_ZORDER = f"""
WITH base AS (
  SELECT CAST(user_id % 32 AS INT) AS ub,
         CAST(EXTRACT(day FROM ts) - 1 AS INT) AS db,
         event_id
  FROM events
),
z AS (
  SELECT ub, db, event_id,
         ( ((ub >> 0) & 1) * 2    + ((db >> 0) & 1) * 1
         + ((ub >> 1) & 1) * 8    + ((db >> 1) & 1) * 4
         + ((ub >> 2) & 1) * 32   + ((db >> 2) & 1) * 16
         + ((ub >> 3) & 1) * 128  + ((db >> 3) & 1) * 64
         + ((ub >> 4) & 1) * 512  + ((db >> 4) & 1) * 256 ) AS zval
  FROM base
),
filed AS (
  SELECT layout, file_id,
         min(ub) AS min_ub, max(ub) AS max_ub,
         min(db) AS min_db, max(db) AS max_db,
         CAST(sum(CASE WHEN ub BETWEEN {_Z_UB_LO} AND {_Z_UB_HI}
                        AND db BETWEEN {_Z_DB_LO} AND {_Z_DB_HI}
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_match
  FROM (
    SELECT 'linear' AS layout,
           ntile({_Z_FILES}) OVER (ORDER BY db, ub, event_id) AS file_id,
           ub, db FROM z
    UNION ALL
    SELECT 'zorder' AS layout,
           ntile({_Z_FILES}) OVER (ORDER BY zval, event_id) AS file_id,
           ub, db FROM z
  ) t
  GROUP BY layout, file_id
)
SELECT
  CAST(sum(CASE WHEN layout = 'linear' THEN 1 ELSE 0 END) AS BIGINT) AS n_files,
  CAST(sum(CASE WHEN layout = 'linear' AND max_ub >= {_Z_UB_LO}
                 AND min_ub <= {_Z_UB_HI} AND max_db >= {_Z_DB_LO}
                 AND min_db <= {_Z_DB_HI} THEN 1 ELSE 0 END) AS BIGINT)
    AS files_scanned_linear,
  CAST(sum(CASE WHEN layout = 'zorder' AND max_ub >= {_Z_UB_LO}
                 AND min_ub <= {_Z_UB_HI} AND max_db >= {_Z_DB_LO}
                 AND min_db <= {_Z_DB_HI} THEN 1 ELSE 0 END) AS BIGINT)
    AS files_scanned_zorder,
  CAST(sum(CASE WHEN layout = 'zorder' THEN n_match ELSE 0 END) AS BIGINT)
    AS rows_matched,
  CAST(sum(CASE WHEN layout = 'linear' AND max_ub >= {_Z_UB_LO}
                 AND min_ub <= {_Z_UB_HI} AND max_db >= {_Z_DB_LO}
                 AND min_db <= {_Z_DB_HI} THEN 1 ELSE 0 END) AS DOUBLE)
    / {_Z_FILES} AS scan_frac_linear,
  CAST(sum(CASE WHEN layout = 'zorder' AND max_ub >= {_Z_UB_LO}
                 AND min_ub <= {_Z_UB_HI} AND max_db >= {_Z_DB_LO}
                 AND min_db <= {_Z_DB_HI} THEN 1 ELSE 0 END) AS DOUBLE)
    / {_Z_FILES} AS scan_frac_zorder
FROM filed
"""


@register("zorder_skipping", oracle=_SQL_ZORDER)
def zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering vs linear sort, measured as data skipping —
    the write-side layout decision behind Delta/Iceberg OPTIMIZE
    ZORDER. Both dims bucket to 5 bits (user_id % 32, day-of-month-1),
    the Morton code interleaves them natively (shift/mask/add — pure
    JVM integer ops), and each candidate layout is cut into
    equal-row "files" whose per-file min/max stats stand in for parquet
    row-group footers. A min/max-pruning reader must scan every file
    whose stat rectangle overlaps the predicate box; the emitted
    files_scanned_{{linear,zorder}} counts are exactly that, showing
    the curve turning a multi-dimensional predicate from
    scan-most-files (linear layout prunes only the leading sort key)
    into a bounded neighborhood. At 100 TB the layout job is a
    repartitionByRange-on-zval rewrite (same cost class as any
    compaction) — and the file assignment here IS that shape: a
    two-phase global rank (range partition + per-partition row_number
    + broadcast offsets, operators/globalrank.py) feeding the
    closed-form ntile bucket formula, never a one-task ntile window
    over the fact table. The skip measurement itself is one tiny stats
    aggregate. Integer-exact throughout; the two scan fractions are
    exact IEEE divisions of small ints."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 32).cast("int").alias("ub"),
        (F.dayofmonth("ts") - 1).cast("int").alias("db"),
        "event_id",
    )
    zval = F.lit(0)
    for i in range(_Z_BITS):
        zval = (
            zval
            + F.shiftright("ub", i).bitwiseAND(F.lit(1)) * (1 << (2 * i + 1))
            + F.shiftright("db", i).bitwiseAND(F.lit(1)) * (1 << (2 * i))
        )
    z = ev.withColumn("zval", zval)
    n_rows = z.count()
    pred = (
        F.col("ub").between(_Z_UB_LO, _Z_UB_HI)
        & F.col("db").between(_Z_DB_LO, _Z_DB_HI)
    )

    def file_stats(order_cols: list, tag: str) -> DataFrame:
        rk = grank.two_phase_rank(
            z, [F.col(c).asc() for c in order_cols], rn_name="_rn"
        )
        return (
            rk.withColumn(
                "file_id",
                grank.ntile_from_rank(F.col("_rn"), F.lit(n_rows), _Z_FILES),
            )
            .groupBy("file_id")
            .agg(
                F.min("ub").alias("min_ub"),
                F.max("ub").alias("max_ub"),
                F.min("db").alias("min_db"),
                F.max("db").alias("max_db"),
                F.sum(pred.cast("long")).alias("n_match"),
            )
            .withColumn("layout", F.lit(tag))
        )

    filed = file_stats(["db", "ub", "event_id"], "linear").unionByName(
        file_stats(["zval", "event_id"], "zorder")
    )
    overlap = (
        (F.col("max_ub") >= _Z_UB_LO)
        & (F.col("min_ub") <= _Z_UB_HI)
        & (F.col("max_db") >= _Z_DB_LO)
        & (F.col("min_db") <= _Z_DB_HI)
    )
    is_lin = F.col("layout") == "linear"
    return filed.agg(
        F.sum(is_lin.cast("long")).alias("n_files"),
        F.sum((is_lin & overlap).cast("long")).alias("files_scanned_linear"),
        F.sum((~is_lin & overlap).cast("long")).alias("files_scanned_zorder"),
        F.sum(F.when(~is_lin, F.col("n_match")).otherwise(F.lit(0))).alias(
            "rows_matched"
        ),
        (
            F.sum((is_lin & overlap).cast("long")).cast("double") / _Z_FILES
        ).alias("scan_frac_linear"),
        (
            F.sum((~is_lin & overlap).cast("long")).cast("double") / _Z_FILES
        ).alias("scan_frac_zorder"),
    )


_LM_REF_LANG = "en"

# shared CTE chain ending in doc(doc_id, n_tokens, bits_per_token) —
# used by lm_perplexity_filter and quality_signal_corr
_SQL_LM_DOC_CTES = f"""t AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
tok AS (SELECT doc_id, lang, unnest(toks) AS w FROM t),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
  WHERE lang = '{_LM_REF_LANG}' GROUP BY w
),
stats AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
lp AS (
  SELECT u.w,
         round(log2((u.c + 1.0) / CAST(s.n + s.v AS DOUBLE)), 6) AS lw
  FROM uni u, stats s
),
scored AS (
  SELECT a.doc_id,
         coalesce(lp.lw,
                  (SELECT round(log2(1.0 / CAST(n + v AS DOUBLE)), 6) FROM stats)
         ) AS lw
  FROM tok a LEFT JOIN lp ON lp.w = a.w
),
doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(-list_aggregate(list(lw ORDER BY lw), 'sum')
               / CAST(count(*) AS DOUBLE), 6) AS bits_per_token
  FROM scored GROUP BY doc_id
)"""

_SQL_LM_PPL = f"""
WITH {_SQL_LM_DOC_CTES}
SELECT doc_id, n_tokens, bits_per_token,
       CAST(row_number() OVER (ORDER BY bits_per_token DESC, doc_id ASC)
            <= (count(*) OVER () + 9) // 10 AS INT) AS flagged
FROM doc
"""


def _lm_bits_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, bits_per_token) under the English-slice
    add-one unigram LM — the shared core of lm_perplexity_filter and
    quality_signal_corr. See lm_perplexity_filter for the contract."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tx.tokens_expr("text")).alias("w")
    )
    uni = (
        tok.where(F.col("lang") == _LM_REF_LANG)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    stats = uni.agg(
        F.sum("c").cast("long").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    nv = float(stats["n"] + stats["v"])
    lp = uni.select(
        "w", F.round(F.log2((F.col("c") + F.lit(1.0)) / F.lit(nv)), 6).alias("lw")
    )
    unseen = F.round(F.log2(F.lit(1.0) / F.lit(nv)), 6)
    scored = tok.join(lp, "w", "left").select(
        "doc_id", F.coalesce("lw", unseen).alias("lw")
    )
    fold = F.aggregate(
        F.array_sort(F.collect_list("lw")), F.lit(0.0), lambda a, b: a + b
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round((-fold) / F.count("*").cast("double"), 6).alias(
            "bits_per_token"
        ),
    )


@register("lm_perplexity_filter", oracle=_SQL_LM_PPL)
def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: an add-one-smoothed unigram LM
    trained on the corpus's English slice scores every document as
    bits-per-token (log2 perplexity); the worst decile is flagged.
    Out-of-domain text — other languages, keyboard mash — surfaces at
    the top exactly as the Wikipedia-LM filter intends. Upgrade of
    bigram_commonness from frequency heuristics to a real probability
    model.  Scale shape: LM "training" is one word-count aggregate
    (map-side combined); the only driver-resident state is the (N, V)
    normalizer pair — two integers, the same bounded-collect contract
    as kmeans centroids — while the per-token scoring is a standard
    vocab posting join, broadcastable when the vocab is small and an
    ordinary shuffle join when it is not.  Determinism: per-token log
    probs round to 6 decimals (the libm log2 contract), per-doc sums
    run as value-ordered sequential folds, and the decile cut is pure
    integer arithmetic over a total order."""
    doc = _lm_bits_df(spark, sf_dir)
    w_rank = Window.orderBy(F.col("bits_per_token").desc(), F.col("doc_id").asc())
    n_docs = F.count("*").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return doc.select(
        "doc_id",
        "n_tokens",
        "bits_per_token",
        (F.row_number().over(w_rank) <= F.floor((n_docs + F.lit(9)) / F.lit(10)))
        .cast("int")
        .alias("flagged"),
    )


_HN_POOL = 30
_HN_POS = 10
_HN_FRAC = 0.6

_SQL_HARD_NEG = f"""
WITH q AS ({_SQL_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored
),
pos AS (SELECT query_id, score AS top_pos FROM ranked WHERE rank = 2)
SELECT r.query_id, r.vec_id, r.score, r.rank AS pool_rank
FROM ranked r JOIN pos p ON p.query_id = r.query_id
WHERE r.rank BETWEEN {_HN_POS + 1} AND {_HN_POOL}
  AND r.score >= {_HN_FRAC} * p.top_pos
"""


@register("hard_negative_mining", oracle=_SQL_HARD_NEG)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data generation: for each query, the
    retrieval pool beyond the top-{_HN_POS} positives supplies hard
    negatives — candidates ranked {_HN_POS + 1}..{_HN_POOL} that still
    score within {_HN_FRAC} of the best non-self positive (rank 2; rank
    1 is the query's own vector). This margin rule is how embedding
    fine-tuning pipelines mine in-batch-beating negatives (DPR/SBERT
    style): too-easy negatives teach nothing, near-dup "negatives"
    would be false labels and sit above the margin's complement, top-k
    keeps only the hard band.  Scale shape: the pool is the proven
    two-phase exact top-k (only Q x P x k rows cross one exchange); the
    margin join is a per-query scalar broadcast. Scores are exact
    sequential-fold dots, so the margin comparison is engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    pool = topk_ops.topk_multi(emb, _queries_df(spark, sf_dir), _HN_POOL)
    pos = pool.where(F.col("rank") == 2).select(
        "query_id", F.col("score").alias("top_pos")
    )
    return (
        pool.join(F.broadcast(pos), "query_id")
        .where(
            (F.col("rank") >= _HN_POS + 1)
            & (F.col("rank") <= _HN_POOL)
            & (F.col("score") >= F.lit(_HN_FRAC) * F.col("top_pos"))
        )
        .select(
            "query_id",
            "vec_id",
            "score",
            F.col("rank").cast("int").alias("pool_rank"),
        )
    )


_PMI_MIN = 5
_PMI_TOP = 25

_SQL_PMI = f"""
WITH t AS ({_SQL_TOKS}),
bgx AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t WHERE len(toks) >= 2
),
bigc AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM bgx GROUP BY bg),
words AS (SELECT unnest(toks) AS w FROM t),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
btot AS (SELECT CAST(sum(c12) AS BIGINT) AS b FROM bigc),
j AS (
  SELECT g.bg, g.c12, u1.c AS c1, u2.c AS c2
  FROM bigc g
  JOIN uni u1 ON u1.w = split_part(g.bg, ' ', 1)
  JOIN uni u2 ON u2.w = split_part(g.bg, ' ', 2)
  WHERE g.c12 >= {_PMI_MIN}
)
SELECT bg AS bigram, c12, c1, c2,
       round(log2((CAST(c12 AS DOUBLE) * n * n)
                  / (CAST(b AS DOUBLE) * c1 * c2)), 6) AS pmi
FROM j, tot, btot
ORDER BY pmi DESC, bigram ASC
LIMIT {_PMI_TOP}
"""


@register("pmi_collocations", oracle=_SQL_PMI)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-{_PMI_TOP} word pairs by pointwise
    mutual information, PMI = log2(P(w1 w2) / (P(w1) P(w2))), with
    min-support {_PMI_MIN} — the corpus-statistics dual of
    bigram_commonness (that entry scores DOCUMENTS by their bigrams;
    this one ranks the BIGRAMS themselves), and the classic phrase /
    multi-word-expression detector (word2vec's phrase pass, NLTK
    collocations).  Scale shape: two map-side-combined counts (bigrams,
    unigrams), a vocab-keyed posting join, and a global top-n; the
    only driver-resident state is the (N, B) normalizer pair of exact
    integers. All count products stay under 2^53 so the PMI argument
    is the same double in both engines; log2 carries the 6-decimal
    contract and the top-n ranks on the ROUNDED value with a bigram
    tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(tx.tokens_expr("text").alias("toks"))
    big = (
        tokd.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(element_at(toks, i), ' ',"
                    " element_at(toks, i + 1)))"
                )
            ).alias("bg")
        )
    )
    bigc = big.groupBy("bg").agg(F.count("*").alias("c12"))
    uni = (
        tokd.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n_total = uni.agg(F.sum("c")).collect()[0][0]
    b_total = bigc.agg(F.sum("c12")).collect()[0][0]
    u1 = uni.select(F.col("w").alias("__w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("__w2"), F.col("c").alias("c2"))
    j = (
        bigc.where(F.col("c12") >= _PMI_MIN)
        .withColumn("__w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .withColumn("__w2", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
        .join(u1, "__w1")
        .join(u2, "__w2")
    )
    pmi = F.round(
        F.log2(
            (F.col("c12").cast("double") * F.lit(float(n_total)) * F.lit(float(n_total)))
            / (F.lit(float(b_total)) * F.col("c1") * F.col("c2"))
        ),
        6,
    )
    return (
        j.select(
            F.col("bg").alias("bigram"), "c12", "c1", "c2", pmi.alias("pmi")
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(_PMI_TOP)
    )


_SQL_QSC = f"""
WITH {_SQL_LM_DOC_CTES},
qual AS ({_SQL_QUALITY}),
xy AS (
  SELECT CAST(round(q.quality, 6) AS DECIMAL(18,6)) AS x,
         CAST(d.bits_per_token AS DECIMAL(18,6)) AS y
  FROM qual q JOIN doc d USING (doc_id)
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM xy
)
SELECT n AS n_docs,
       round(CAST(sx AS DOUBLE) / n, 6) AS mean_quality,
       round(CAST(sy AS DOUBLE) / n, 6) AS mean_bits,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS pearson_r
FROM s
"""


@register("quality_signal_corr", oracle=_SQL_QSC)
def quality_signal_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal agreement: Pearson correlation between the
    heuristic composite quality score and the LM bits-per-token over
    every tokenized document — the calibration check a pipeline runs
    before stacking two filters (redundant signals waste a pass;
    anti-correlated ones mean one is broken; quality should correlate
    NEGATIVELY with perplexity). Joins the two proven per-doc signal
    plans on doc_id and reduces to one row.  Determinism: both inputs
    are 6-decimal-rounded doubles cast to DECIMAL(18,6), so every sum
    and sum-of-products is exact and order-independent (the z-score
    entry's contract); the final r passes through wide-decimal ->
    double casts once and carries the 6-decimal rounding. Scale shape:
    one keyed join plus a single map-side-combinable moment aggregate —
    the same one-pass sufficient-statistics reduction any distributed
    corr/variance uses."""
    d = _toks_df(spark, sf_dir)
    qual = d.select(
        "doc_id", tx.quality_expr(F.col("toks"), "text").alias("quality")
    )
    bits = _lm_bits_df(spark, sf_dir)
    xy = qual.join(bits, "doc_id").select(
        F.round("quality", 6).cast("decimal(18,6)").alias("x"),
        F.col("bits_per_token").cast("decimal(18,6)").alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    return s.select(
        F.col("n").alias("n_docs"),
        F.round(sxd / F.col("n"), 6).alias("mean_quality"),
        F.round(syd / F.col("n"), 6).alias("mean_bits"),
        F.round(
            (F.col("n") * F.col("sxy").cast("double") - sxd * syd)
            / (
                F.sqrt(F.col("n") * F.col("sxx").cast("double") - sxd * sxd)
                * F.sqrt(F.col("n") * F.col("syy").cast("double") - syd * syd)
            ),
            6,
        ).alias("pearson_r"),
    )


_SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS INT) AS grp,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("orders_cube", oracle=_SQL_CUBE)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage completed: CUBE over order
    status/priority (all four grouping sets, vs orders_rollup's
    hierarchy) with the grouping_id disambiguator — written with the
    DataFrame cube() API so the expansion is Catalyst's Expand
    operator, one pass over the fact with map-side partial aggregation
    per set, not four scans. Exact decimal totals as everywhere."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("grp"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


_SQL_SLIDING_DISTINCT = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM daily)
SELECT d.day AS window_end,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS distinct_users,
       CAST(sum(p.c) AS BIGINT) AS n_events
FROM days d JOIN daily p ON p.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""


@register("sliding_distinct_users", oracle=_SQL_SLIDING_DISTINCT)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct counting from a mergeable day-grain
    pre-aggregate: 7-day distinct users + event volume per window-end
    day. COUNT(DISTINCT) does not decompose over overlapping windows,
    so the scale answer is the day-grain (day, user) rollup — orders of
    magnitude smaller than raw events — re-used by every window it
    touches; each rollup row fans out map-side to the <=7 window-ends
    it serves (explode of a date sequence, no range join, no
    BroadcastNestedLoop) and one keyed aggregate finishes. The
    approximate twin at extreme cardinality is per-day HLL sketches
    merged per window (distinct_users_hll's mergeability argument);
    this entry is the exact form and the oracle for that ladder.
    Integer-exact end to end."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .groupBy("day", "user_id")
        .agg(F.count("*").alias("c"))
    )
    days = daily.select("day").distinct().withColumnRenamed("day", "wd")
    contrib = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("wd"),
        "user_id",
        "c",
    )
    return (
        contrib.join(F.broadcast(days), "wd")
        .groupBy("wd")
        .agg(
            F.count_distinct("user_id").alias("distinct_users"),
            F.sum("c").alias("n_events"),
        )
        .withColumnRenamed("wd", "window_end")
    )


_SQL_LABEL_CENTROID = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
ex0 AS (
  SELECT label, v, unnest(range(0, len(v))) AS dim FROM e
),
ex AS (
  SELECT label, CAST(dim AS INT) AS dim, v[CAST(dim AS INT) + 1] AS val FROM ex0
),
cent AS (
  SELECT label, dim, round(avg(val), 6) AS cv FROM ex GROUP BY label, dim
),
cvecs AS (SELECT label, list(cv ORDER BY dim) AS cvec FROM cent GROUP BY label),
dist AS (
  SELECT e.vec_id, e.label AS vlabel, c.label AS clabel,
         list_aggregate(list_transform(range(1, len(e.v) + 1),
            i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i])), 'sum') AS d2
  FROM e CROSS JOIN cvecs c
),
pv AS (
  SELECT vec_id, vlabel,
         max(CASE WHEN clabel = vlabel THEN d2 END) AS own_d2,
         min(CASE WHEN clabel <> vlabel THEN d2 END) AS other_d2
  FROM dist GROUP BY vec_id, vlabel
),
agg AS (
  SELECT vlabel AS label, CAST(count(*) AS BIGINT) AS n_vecs,
         round(avg(own_d2), 6) AS avg_own_d2,
         round(avg(other_d2), 6) AS avg_nearest_other_d2
  FROM pv GROUP BY vlabel
)
SELECT label, n_vecs, avg_own_d2, avg_nearest_other_d2,
       round(avg_nearest_other_d2 / avg_own_d2, 6) AS separation
FROM agg
"""


@register("label_centroid_quality", oracle=_SQL_LABEL_CENTROID)
def label_centroid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labelled-embedding cohesion audit (simplified silhouette): per
    class label, mean squared distance to the OWN class centroid vs the
    NEAREST other centroid, and their ratio — the separability report
    read before trusting labels for stratified eval splits or
    classifier training (separation ~1 means the label carries no
    geometric signal). Scale shape: centroids come from the
    posexplode -> (label, dim)-keyed aggregate (map-side combined, D x
    L rows total — embedding_dim_stats' shape grouped by label); the
    bounded L-row centroid relation then broadcasts against one base
    scan, the same tiny-side pattern as the IVF probe stage.
    Determinism: centroid coordinates are 6-decimal-rounded avgs
    (identical both engines), distances are dim-ordered sequential
    folds over identical doubles, the per-vector min over labels is an
    exact compare, and the final per-label avgs carry the round-6
    contract."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = emb.select("label", F.posexplode("v").alias("dim", "val"))
    cent = ex.groupBy("label", "dim").agg(F.round(F.avg("val"), 6).alias("cv"))
    cvecs = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))),
            lambda s: s["cv"],
        ).alias("cvec")
    )
    cl = cvecs.select(F.col("label").alias("clabel"), "cvec")
    d2 = F.aggregate(
        F.zip_with("v", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    dist = emb.crossJoin(F.broadcast(cl)).select(
        "vec_id", F.col("label").alias("vlabel"), "clabel", d2.alias("d2")
    )
    pv = dist.groupBy("vec_id", "vlabel").agg(
        F.max(F.when(F.col("clabel") == F.col("vlabel"), F.col("d2"))).alias(
            "own_d2"
        ),
        F.min(F.when(F.col("clabel") != F.col("vlabel"), F.col("d2"))).alias(
            "other_d2"
        ),
    )
    agg = pv.groupBy("vlabel").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("own_d2"), 6).alias("avg_own_d2"),
        F.round(F.avg("other_d2"), 6).alias("avg_nearest_other_d2"),
    )
    return agg.select(
        F.col("vlabel").alias("label"),
        "n_vecs",
        "avg_own_d2",
        "avg_nearest_other_d2",
        F.round(
            F.col("avg_nearest_other_d2") / F.col("avg_own_d2"), 6
        ).alias("separation"),
    )


_ISM_MOD = 10  # doc_id % 10 == 0 stands in for the incoming batch

_SQL_STATS_MERGE = f"""
WITH qual AS ({_SQL_QUALITY}),
j AS (
  SELECT d.source, d.n_chars, q.n_tokens,
         CAST(round(q.quality, 6) AS DECIMAL(18,6)) AS q6
  FROM documents d JOIN qual q ON q.doc_id = d.doc_id
),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(min(n_chars) AS BIGINT) AS min_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars,
         sum(q6) AS sq
  FROM j GROUP BY source
)
SELECT source, n_docs, total_tokens, min_chars, max_chars,
       round(CAST(sq AS DOUBLE) / n_docs, 6) AS avg_quality
FROM s
"""


@register("incremental_stats_merge", oracle=_SQL_STATS_MERGE)
def incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental profile maintenance: per-source corpus stats
    computed SEPARATELY over the standing corpus (doc_id % {_ISM_MOD}
    != 0) and an incoming batch (== 0), then combined purely
    algebraically — counts and token totals add, min/max fold, and the
    quality mean merges because what is stored is the exact
    DECIMAL(18,6) SUM of 6-decimal-rounded scores, not the mean. The
    oracle is the FULL-corpus recompute, so the hash match proves the
    merge law itself: a nightly profile never rescans the corpus, it
    folds each ingest's partial into the stored sufficient statistics
    (the same mergeability argument as the HLL/count-min sketches,
    here in exact form).  Scale shape: two map-side-combined
    aggregates over disjoint slices plus a |sources|-row merge."""
    d = _toks_df(spark, sf_dir).select(
        "doc_id",
        "source",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.round(tx.quality_expr(F.col("toks"), "text"), 6)
        .cast("decimal(18,6)")
        .alias("q6"),
    )

    def stats(df: DataFrame) -> DataFrame:
        return df.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("q6").alias("sq"),
        )

    base = stats(d.where(F.col("doc_id") % _ISM_MOD != 0))
    batch = stats(d.where(F.col("doc_id") % _ISM_MOD == 0))
    merged = base.unionByName(batch).groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        F.min("min_chars").alias("min_chars"),
        F.max("max_chars").alias("max_chars"),
        F.sum("sq").alias("sq"),
    )
    return merged.select(
        "source",
        "n_docs",
        "total_tokens",
        "min_chars",
        "max_chars",
        F.round(F.col("sq").cast("double") / F.col("n_docs"), 6).alias(
            "avg_quality"
        ),
    )


_SQL_DQ = """
WITH checks AS (
  SELECT 'orders_orphan_custkey' AS rule,
         CAST((SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS violations,
         CAST((SELECT count(*) FROM orders) AS BIGINT) AS checked
  UNION ALL
  SELECT 'lineitem_orphan_orderkey',
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'orders_pk_unique',
         CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders
               GROUP BY o_orderkey HAVING count(*) > 1) t) AS BIGINT),
         CAST((SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
  UNION ALL
  SELECT 'orders_totalprice_positive',
         CAST((SELECT count(*) FROM orders
               WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT),
         CAST((SELECT count(*) FROM orders) AS BIGINT)
  UNION ALL
  SELECT 'lineitem_discount_range',
         CAST((SELECT count(*) FROM lineitem
               WHERE l_discount < 0 OR l_discount > 1) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'lineitem_ship_after_order',
         CAST((SELECT count(*) FROM lineitem l JOIN orders o
               ON o.o_orderkey = l.l_orderkey
               WHERE l.l_shipdate < o.o_orderdate) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'documents_text_nonnull',
         CAST((SELECT count(*) FROM documents
               WHERE text IS NULL OR length(text) = 0) AS BIGINT),
         CAST((SELECT count(*) FROM documents) AS BIGINT)
)
SELECT rule, violations, checked,
       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
FROM checks
"""


@register("dq_validation_suite", oracle=_SQL_DQ)
def dq_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (the Deequ/dbt-test shape): one
    report row per declared rule — referential integrity (orphan
    foreign keys via broadcast anti-joins), primary-key uniqueness,
    range and non-null checks, and a cross-table temporal sanity rule
    (no lineitem ships before its order) — the contract gate a
    pipeline runs on every ingest before publishing a snapshot.
    Scale shape: every rule is either a map-side predicate count or an
    anti/inner join against a broadcastable dimension, all folded into
    one pass per fact table by conditional aggregation where they
    share a scan (the orphan + temporal rules share the lineitem-
    orders join). Integer-exact throughout."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    def row(rule: str, violations: DataFrame, checked: DataFrame) -> DataFrame:
        v = violations.select(F.count("*").alias("violations"))
        c = checked.select(F.count("*").alias("checked"))
        # 1-row x 1-row combine without a join: union the two scalar
        # aggregates and re-aggregate (keeps every rule BNLJ-free)
        return (
            v.select(F.lit(rule).alias("rule"), "violations", F.lit(None).cast("long").alias("checked"))
            .unionByName(
                c.select(F.lit(rule).alias("rule"), F.lit(None).cast("long").alias("violations"), "checked")
            )
            .groupBy("rule")
            .agg(
                F.max("violations").alias("violations"),
                F.max("checked").alias("checked"),
            )
        )

    orphan_orders = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_anti"
    )
    orphan_li = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"
    )
    dup_pk = orders.groupBy("o_orderkey").count().where(F.col("count") > 1)
    pk_distinct = orders.select("o_orderkey").distinct()
    bad_price = orders.where(
        F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
    )
    bad_disc = li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
    ship_before = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).where(F.col("l_shipdate") < F.col("o_orderdate"))
    bad_text = docs.where(F.col("text").isNull() | (F.length("text") == 0))

    report = (
        row("orders_orphan_custkey", orphan_orders, orders)
        .unionByName(row("lineitem_orphan_orderkey", orphan_li, li))
        .unionByName(row("orders_pk_unique", dup_pk, pk_distinct))
        .unionByName(row("orders_totalprice_positive", bad_price, orders))
        .unionByName(row("lineitem_discount_range", bad_disc, li))
        .unionByName(row("lineitem_ship_after_order", ship_before, li))
        .unionByName(row("documents_text_nonnull", bad_text, docs))
    )
    return report.select(
        "rule",
        "violations",
        "checked",
        (F.col("violations") == 0).cast("int").alias("passed"),
    )


@register(
    "neardup_graph_stats",
    oracle=lambda: f"""
WITH pairs AS ({_sql_minhash_lsh()}),
e AS (SELECT a_id AS a, b_id AS b FROM pairs),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) t GROUP BY node
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
ds AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d) // 2 AS BIGINT) AS n_edges,
         CAST(max(d) AS BIGINT) AS max_degree,
         CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT n_nodes, n_edges, n_triangles, max_degree, n_wedges,
       CASE WHEN n_wedges = 0 THEN 0.0
            ELSE round(3.0 * n_triangles / n_wedges, 6) END AS global_clustering
FROM ds, tri
""",
)
def neardup_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph topology: node/edge/degree profile, exact
    triangle count, and the global clustering coefficient (3*triangles
    / wedges) over the verified MinHash-LSH pair graph — the shape
    report that says whether near-dup clusters are chains (crawl
    drift: low clustering) or cliques (template spam: high), which
    changes the keeper policy dedup_keep_longest applies. Triangle
    counting uses the classic distributed algorithm: edges oriented
    low-id -> high-id (each triangle counted exactly once) and two
    equi-joins e1(a,b) |x| e2(b,c) |x| e3(a,c) — at scale the
    orientation is by DEGREE so every join side stays near-linear
    (Suri-Vassilvitskii); ids stand in for degree rank here. Wedge
    counts are pure integer arithmetic off the degree table; the one
    division carries round-6."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select(
        F.col("a_id").alias("a"), F.col("b_id").alias("b")
    )
    deg = (
        pairs.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    e1 = pairs
    e2 = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = pairs.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")))
        .agg(F.count("*").alias("n_triangles"))
    )
    ds = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.max("d").alias("max_degree"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    )
    a_side = ds.select(
        "n_nodes",
        "n_edges",
        "max_degree",
        "n_wedges",
        F.lit(None).cast("long").alias("n_triangles"),
    )
    b_side = tri.select(
        F.lit(None).cast("long").alias("n_nodes"),
        F.lit(None).cast("long").alias("n_edges"),
        F.lit(None).cast("long").alias("max_degree"),
        F.lit(None).cast("long").alias("n_wedges"),
        "n_triangles",
    )
    merged = a_side.unionByName(b_side).agg(
        F.max("n_nodes").alias("n_nodes"),
        F.max("n_edges").alias("n_edges"),
        F.max("n_triangles").alias("n_triangles"),
        F.max("max_degree").alias("max_degree"),
        F.max("n_wedges").alias("n_wedges"),
    )
    return merged.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "max_degree",
        "n_wedges",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6)
        )
        .alias("global_clustering"),
    )


_PR_D = 0.85
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Replay PageRank over the kNN graph: nested one-CTE-per-iteration
    power method, contributions folded in value order (deterministic
    sum). The (1-d)/n and 1/n constants are embedded as Python-double
    literals on BOTH sides — DuckDB would otherwise fold (1.0 - 0.85)
    in DECIMAL arithmetic and land one ulp away from the double path."""
    import pyarrow.parquet as papq

    n = papq.read_metadata(f"{_ORACLE_SF}/embeddings.parquet").num_rows
    base = (1.0 - _PR_D) / n
    init = 1.0 / n
    knn_sql = REGISTRY["knn_self_join"].oracle
    iters = ""
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        iters += f""",
it{i} AS (
  SELECT nd.node, {base!r} + {_PR_D!r} * coalesce(agg.s, 0.0) AS r
  FROM nodes nd
  LEFT JOIN (
    SELECT e2.dst AS node,
           list_aggregate(list(p.r / e2.c ORDER BY p.r / e2.c), 'sum') AS s
    FROM e2 JOIN {prev} p ON p.node = e2.src GROUP BY e2.dst
  ) agg ON agg.node = nd.node
)"""
        prev = f"it{i}"
    return f"""
WITH knn AS ({knn_sql}),
e AS (SELECT src_id AS src, nbr_id AS dst FROM knn),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY src),
e2 AS (SELECT e.src, e.dst, od.c FROM e JOIN od USING (src)),
nodes AS (SELECT vec_id AS node FROM embeddings),
r0 AS (SELECT node, {init!r} AS r FROM nodes){iters}
SELECT node, round(r, 6) AS pagerank,
       CAST(row_number() OVER (ORDER BY round(r, 6) DESC, node ASC) AS INT)
         AS pr_rank
FROM {prev}
"""


@register("knn_pagerank", oracle=_pagerank_oracle)
def knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the exact kNN graph ({_PR_ITERS}
    power-method rounds, damping {_PR_D}) — density-peak scoring in
    embedding space: vectors many neighbors point AT are corpus
    "representatives" (coreset selection, diversity sampling, the
    centrality sibling of topk_mmr's redundancy penalty). Completes
    the iterative-algorithm family beyond dedup_components' label
    propagation with a numeric fixed point.

    Scale shape: per round, one join of the edge list against the
    rank vector plus one dst-keyed aggregate — the canonical
    distributed PageRank; at depth the rank table would checkpoint per
    round exactly like components' pointer jumping (here the
    {_PR_ITERS}-round plan is bounded and stays lazy). The kNN graph
    guarantees outdegree k, so there are no dangling-mass corrections.
    Determinism: per-node in-sums run as value-ordered sequential
    folds, damping constants are shared Python-double literals, and
    the published ranking orders on the 6-decimal-rounded score."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = knn_self_join(spark, sf_dir)
    e = knn.select(F.col("src_id").alias("src"), F.col("nbr_id").alias("dst"))
    od = e.groupBy("src").agg(F.count("*").alias("odeg"))
    e2 = e.join(od, "src")
    nodes = emb.select(F.col("vec_id").alias("node"))
    n = emb.count()
    base = (1.0 - _PR_D) / n
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(_PR_ITERS):
        contrib = e2.join(ranks, e2["src"] == ranks["node"]).select(
            "dst", (F.col("r") / F.col("odeg")).alias("c")
        )
        agg = contrib.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list("c")), F.lit(0.0), lambda s, x: s + x
            ).alias("s")
        )
        ranks = nodes.join(agg, nodes["node"] == agg["dst"], "left").select(
            "node",
            (F.lit(base) + F.lit(_PR_D) * F.coalesce("s", F.lit(0.0))).alias("r"),
        )
    # two-phase global rank (operators/globalrank.py): the rank vector
    # is |vectors| rows — an unpartitioned row_number window here would
    # funnel the whole table through one task at scale
    ranked = grank.two_phase_rank(
        ranks.select("node", F.round("r", 6).alias("pagerank")),
        [F.col("pagerank").desc(), F.col("node").asc()],
        rn_name="pr_rank",
    )
    return ranked.select(
        "node", "pagerank", F.col("pr_rank").cast("int").alias("pr_rank")
    )


_SQL_EVENT_PATTERN = """
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events, md5(seq) AS seq_md5,
       CAST(len(string_split(seq, 'vcp')) - 1 AS BIGINT) AS n_view_click_buy,
       CAST(len(string_split(seq, 'ce')) - 1 AS BIGINT) AS n_click_error
FROM s
"""


@register("event_pattern_match", oracle=_SQL_EVENT_PATTERN)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching over event streams (the
    MATCH_RECOGNIZE-lite shape): each user's history compresses to an
    event-initial string in strict (ts, event_id) order — initials are
    unique per type here — and patterns become plain substring counts:
    view->click->purchase conversions and click->error rage signals,
    counted non-overlapping by the split(seq, pat) trick in both
    engines. The full sequence is also md5-hashed, so ONE mis-ordered
    event for any user fails the gate — this doubles as the ordering
    oracle for every window/sessionize operator. Scale shape: one
    user-keyed aggregate whose state is bounded by events-per-user
    (the sessionize contract); the pattern scan afterwards is
    map-only string work, no second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.substring("event_type", 1, 1).alias("ini"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "ini"))),
                    lambda s: s["ini"],
                ),
                "",
            ).alias("seq"),
            F.count("*").alias("n_events"),
        )
    )
    return g.select(
        "user_id",
        "n_events",
        F.md5("seq").alias("seq_md5"),
        (F.size(F.split("seq", "vcp", -1)) - 1)
        .cast("long")
        .alias("n_view_click_buy"),
        (F.size(F.split("seq", "ce", -1)) - 1)
        .cast("long")
        .alias("n_click_error"),
    )


_SQL_DIVERSITY = """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY source),
terms AS (
  SELECT c.source, tot.nt,
         -(CAST(c.n AS DOUBLE) / tot.nt) * log2(CAST(c.n AS DOUBLE) / tot.nt) AS h
  FROM c JOIN tot USING (source)
),
e AS (
  SELECT source, max(nt) AS n_docs, CAST(count(*) AS BIGINT) AS n_langs,
         round(list_aggregate(list(h ORDER BY h), 'sum'), 6) AS entropy_bits
  FROM terms GROUP BY source
)
SELECT source, n_docs, n_langs, entropy_bits,
       round(pow(2.0, entropy_bits), 6) AS effective_langs
FROM e
"""


@register("corpus_diversity_entropy", oracle=_SQL_DIVERSITY)
def corpus_diversity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity index: Shannon entropy (bits) of each source's
    language mix and its exponential, the "effective number of
    languages" — the mixture-design number read next to
    mixture_weights (a source with effective_langs ~1 contributes no
    multilingual signal no matter its row count). Scale shape: one
    (source, lang)-keyed count (map-side combined), a |sources|-row
    total join, and a per-source fold over at most |langs| entropy
    terms. Determinism: p = n/nt is an exact IEEE division of exact
    integers, the <=|langs|-term entropy sum folds in value order,
    and log2/pow carry the 6-decimal libm contract (pow applied to
    the already-rounded entropy)."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    tot = c.groupBy("source").agg(F.sum("n").alias("nt"))
    p = F.col("n").cast("double") / F.col("nt")
    terms = c.join(tot, "source").select(
        "source", "nt", (-p * F.log2(p)).alias("h")
    )
    e = terms.groupBy("source").agg(
        F.max("nt").alias("n_docs"),
        F.count("*").alias("n_langs"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("h")), F.lit(0.0), lambda s, x: s + x
            ),
            6,
        ).alias("entropy_bits"),
    )
    return e.select(
        "source",
        "n_docs",
        "n_langs",
        "entropy_bits",
        F.round(F.pow(F.lit(2.0), F.col("entropy_bits")), 6).alias(
            "effective_langs"
        ),
    )


def _sql_lsh_operating_point() -> str:
    return f"""
WITH {_sql_minhash_base()},
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id
),
truth AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / CAST(len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        >= {_JACCARD_T}
),
j AS (
  SELECT coalesce(c.a_id, t.a_id) AS a_id,
         CASE WHEN c.a_id IS NULL THEN 0 ELSE 1 END AS in_cand,
         CASE WHEN t.a_id IS NULL THEN 0 ELSE 1 END AS in_true
  FROM cand c FULL OUTER JOIN truth t
    ON t.a_id = c.a_id AND t.b_id = c.b_id
),
m AS (
  SELECT CAST(sum(in_true) AS BIGINT) AS n_true,
         CAST(sum(in_cand) AS BIGINT) AS n_candidates,
         CAST(sum(in_cand * in_true) AS BIGINT) AS n_cand_true
  FROM j
)
SELECT n_true, n_candidates, n_cand_true,
       round(CAST(n_cand_true AS DOUBLE) / n_true, 6) AS candidate_recall,
       round(CAST(n_cand_true AS DOUBLE) / n_candidates, 6) AS candidate_precision
FROM m
"""


@register("lsh_operating_point", oracle=_sql_lsh_operating_point)
def lsh_operating_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding operating characteristic, MEASURED: candidate
    recall and precision of the 16-slot / 4-band MinHash scheme
    against the exact shingle-Jaccard truth set at threshold
    {_JACCARD_T} — the empirical point on the S-curve
    1-(1-s^r)^b that minhash_estimator_error bounds analytically and
    every banding choice (r, b) is picked from. A recall shortfall
    here means missed dups ship to training; a precision collapse
    means the verify stage pays for junk candidates. Scale shape: the
    candidate side is the production banded inverted-index join; the
    truth side is the shingle-posting exact join (posting-list bound,
    not N^2); the comparison is one full-outer join of two small pair
    sets + a conditional aggregate. Integer-exact but for the two
    round-6 ratios."""
    docs = load_table(spark, sf_dir, "documents")
    cand = (
        dedup_ops.minhash_lsh_pairs(docs, 0.0)
        .select("a_id", "b_id")
        .withColumn("in_cand", F.lit(1))
    )
    truth = (
        dedup_ops.ngram_jaccard_pairs(docs, _JACCARD_T)
        .select("a_id", "b_id")
        .withColumn("in_true", F.lit(1))
    )
    j = cand.join(truth, ["a_id", "b_id"], "full_outer").select(
        F.coalesce("in_cand", F.lit(0)).alias("in_cand"),
        F.coalesce("in_true", F.lit(0)).alias("in_true"),
    )
    m = j.agg(
        F.sum("in_true").cast("long").alias("n_true"),
        F.sum("in_cand").cast("long").alias("n_candidates"),
        F.sum(F.col("in_cand") * F.col("in_true")).cast("long").alias(
            "n_cand_true"
        ),
    )
    return m.select(
        "n_true",
        "n_candidates",
        "n_cand_true",
        F.round(
            F.col("n_cand_true").cast("double") / F.col("n_true"), 6
        ).alias("candidate_recall"),
        F.round(
            F.col("n_cand_true").cast("double") / F.col("n_candidates"), 6
        ).alias("candidate_precision"),
    )


_SQL_TWA = """
WITH b AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
),
g AS (
  SELECT user_id, value,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           - ts_us AS dt
  FROM b
),
a AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(dt) AS BIGINT) AS span_us,
         list_aggregate(list(value * dt ORDER BY value * dt)
                        FILTER (WHERE dt IS NOT NULL), 'sum') AS num
  FROM g GROUP BY user_id
)
SELECT user_id, n_events, span_us,
       CASE WHEN span_us IS NULL OR span_us = 0 THEN NULL
            ELSE round(num / span_us, 6) END AS twa_value
FROM a
"""


@register("user_value_twa", oracle=_SQL_TWA)
def user_value_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted aggregation (the telemetry/finance TWAP
    shape): per user, the time-weighted average of `value`, each
    reading weighted by how long it was current (gap to the next
    event, exact integer microseconds) — the correct summary when
    readings arrive irregularly and a plain AVG over-weights bursts;
    complements user_value_ewma's recency weighting with elapsed-time
    weighting. NTZ-safe: the window orders by timezone-free epoch
    micros (the trailing-window idiom — never unix_micros on NTZ).
    Scale shape: one user-partitioned lead() window + one keyed
    aggregate, state bounded per user. Determinism: gaps are exact
    longs, the weighted numerator folds in value order, and the single
    division carries round-6."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    b = ev.select("user_id", "event_id", "value", ts_us.alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = b.select(
        "user_id", "value", (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dt")
    )
    a = g.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("dt").alias("span_us"),
        F.aggregate(
            F.array_sort(F.collect_list(F.col("value") * F.col("dt"))),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("num"),
    )
    return a.select(
        "user_id",
        "n_events",
        "span_us",
        F.when(
            F.col("span_us").isNull() | (F.col("span_us") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(F.col("num") / F.col("span_us"), 6))
        .alias("twa_value"),
    )


_MP_PLANES = 6
_MP_SEED = 43


def _mp_planes_np() -> "object":
    def fit():
        import numpy as np
        import pyarrow.parquet as papq

        tbl = papq.read_table(
            f"{_ORACLE_SF}/embeddings.parquet", columns=["embedding"]
        )
        dim = len(tbl.column("embedding")[0])
        return np.random.default_rng(_MP_SEED).normal(size=(_MP_PLANES, dim))

    return _fit_cached("mp_planes", fit)


def _mp_oracle() -> str:
    planes = _mp_planes_np()
    values = ",\n    ".join(
        f"({i}, {1 << i}, {_dlist(p)})" for i, p in enumerate(planes)
    )
    return f"""
WITH planes(plane_id, w, v) AS (VALUES
    {values}),
q AS ({_SQL_QUERIES}),
qb AS (
  SELECT q.query_id,
         CAST(sum(CASE WHEN list_dot_product(CAST(q.embedding AS DOUBLE[]), p.v) > 0
                  THEN p.w ELSE 0 END) AS INT) AS qbucket
  FROM q CROSS JOIN planes p GROUP BY q.query_id
),
bb AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.v) > 0
                  THEN p.w ELSE 0 END) AS INT) AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
probes AS (
  SELECT query_id, qbucket AS pb FROM qb
  UNION ALL
  SELECT qb.query_id, xor(qb.qbucket, p.w) AS pb FROM qb CROSS JOIN planes p
),
cand AS (
  SELECT p.query_id, b.vec_id FROM probes p JOIN bb b ON b.bucket = p.pb
),
scored AS (
  SELECT c.query_id, c.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                          CAST(q.embedding AS DOUBLE[])) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q ON q.query_id = c.query_id
)
SELECT query_id, vec_id, score, rank FROM (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {K}
"""


@register("lsh_multiprobe_search", oracle=_mp_oracle)
def lsh_multiprobe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe hyperplane-LSH ANN search (Lv et al., VLDB'07): one
    {_MP_PLANES}-bit sign signature buckets the base; each query
    probes its own bucket PLUS the {_MP_PLANES} single-bit-flip
    perturbations — the buckets its nearest neighbors most likely fell
    into when a sign was marginal — then exact-rescores only those
    candidates. This trades the IVF ladder's centroid fit for a
    fit-free bucketing: no training pass at all, ~(B+1)/2^B of the
    corpus scanned (7/64 here), and recall recovered by probing the
    marginal-sign buckets rather than by more tables.  Scale
    shape: bucket assignment is a map-only native fold; the Qx(B+1)
    probe list broadcasts into an equi-join against the bucket-keyed
    base (bucket-partitioned at rest in production, so probing prunes
    partitions exactly like nprobe); the rescore touches only
    candidates. Scores are exact sequential-fold dots; the seeded
    planes are shared literals with the oracle. Honest operating note:
    on this near-uniform synthetic corpus measured recall@10 is ~0.36
    at ~11% scan (sign-LSH needs CLUSTERED data to shine) — the
    oracle-checked contract here is the multiprobe mechanics; the
    high-recall operating points in this repo belong to the trained
    IVF ladder."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    planes = np.random.default_rng(_MP_SEED).normal(size=(_MP_PLANES, dim))

    def bucket_expr(vec_col: str):
        b = F.lit(0)
        for i in range(_MP_PLANES):
            bit = (
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col).cast("array<double>"),
                        F.lit(planes[i].tolist()).cast("array<double>"),
                        lambda x, h: x * h,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                > 0
            ).cast("int")
            b = b + bit * (1 << i)
        return b

    base_b = emb.select("vec_id", "embedding", bucket_expr("embedding").alias("bucket"))
    q_b = q.select(
        "query_id",
        F.col("embedding").alias("__q"),
        bucket_expr("embedding").alias("qbucket"),
    )
    probe_arr = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(_MP_PLANES)],
    )
    probes = q_b.select(
        "query_id", "__q", F.explode(probe_arr).alias("pb")
    )
    cand = F.broadcast(probes).join(base_b, probes["pb"] == base_b["bucket"])
    from nano_vectordb_spark.functions.vector import dot_expr

    scored = cand.select(
        "query_id", "vec_id", dot_expr("embedding", "__q").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= K)
        .select("query_id", "vec_id", "score", "rank")
    )


_KS_BINS = 20
_KS_SPLIT_DAY = 15

_SQL_VALUE_DRIFT = f"""
WITH s AS (SELECT value, CAST(EXTRACT(day FROM ts) AS INT) AS d FROM events),
mm AS (SELECT min(value) AS mn, max(value) AS mx FROM s),
b AS (
  SELECT least({_KS_BINS - 1}, greatest(0,
           CAST(floor((value - mn) / ((mx - mn) / {_KS_BINS}.0)) AS INT))) AS bin,
         CASE WHEN d <= {_KS_SPLIT_DAY} THEN 1 ELSE 0 END AS ia
  FROM s, mm
),
h AS (
  SELECT bin, CAST(sum(ia) AS BIGINT) AS cnt_a,
         CAST(count(*) - sum(ia) AS BIGINT) AS cnt_b
  FROM b GROUP BY bin
),
c AS (
  SELECT bin, cnt_a, cnt_b,
         sum(cnt_a) OVER (ORDER BY bin) AS cum_a,
         sum(cnt_b) OVER (ORDER BY bin) AS cum_b,
         sum(cnt_a) OVER () AS na, sum(cnt_b) OVER () AS nb
  FROM h
)
SELECT CAST(bin AS INT) AS bin, cnt_a, cnt_b,
       round(CAST(cum_a AS DOUBLE) / na, 6) AS cdf_a,
       round(CAST(cum_b AS DOUBLE) / nb, 6) AS cdf_b,
       round(abs(CAST(cum_a AS DOUBLE) / na - CAST(cum_b AS DOUBLE) / nb), 6)
         AS cdf_gap
FROM c
"""


@register("value_drift_ks", oracle=_SQL_VALUE_DRIFT)
def value_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (the binned Kolmogorov-Smirnov
    shape): the event `value` distribution of the first
    {_KS_SPLIT_DAY} days vs the rest, as a {_KS_BINS}-bin equi-width
    histogram with both empirical CDFs and their per-bin gap — the max
    of cdf_gap IS the binned KS statistic a drift alarm thresholds on
    before a model retrain or a source renegotiation. Scale shape: the
    global [min,max] is one exact 2-double aggregate (the bounded
    driver-state contract); binning + both histograms then fold into
    ONE conditional map-side-combined pass over the scan, and the CDF
    window runs over {_KS_BINS} rows. Determinism: min/max of doubles
    are exact, bin edges derive from them by identical IEEE
    arithmetic in both engines, counts are integers, and the CDF
    ratios carry round-6."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "value", F.dayofmonth("ts").cast("int").alias("d")
    )
    mm = s.agg(F.min("value").alias("mn"), F.max("value").alias("mx")).collect()[0]
    mn, mx = mm["mn"], mm["mx"]
    width = (mx - mn) / float(_KS_BINS)
    bin_col = F.least(
        F.lit(_KS_BINS - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("value") - F.lit(mn)) / F.lit(width)).cast("int"),
        ),
    )
    b = s.select(
        bin_col.alias("bin"),
        (F.col("d") <= _KS_SPLIT_DAY).cast("int").alias("ia"),
    )
    h = b.groupBy("bin").agg(
        F.sum("ia").alias("cnt_a"),
        (F.count("*") - F.sum("ia")).alias("cnt_b"),
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = h.select(
        "bin",
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(w_cum).alias("cum_a"),
        F.sum("cnt_b").over(w_cum).alias("cum_b"),
        F.sum("cnt_a").over(w_all).alias("na"),
        F.sum("cnt_b").over(w_all).alias("nb"),
    )
    cdf_a = F.col("cum_a").cast("double") / F.col("na")
    cdf_b = F.col("cum_b").cast("double") / F.col("nb")
    return c.select(
        F.col("bin").cast("int").alias("bin"),
        "cnt_a",
        "cnt_b",
        F.round(cdf_a, 6).alias("cdf_a"),
        F.round(cdf_b, 6).alias("cdf_b"),
        F.round(F.abs(cdf_a - cdf_b), 6).alias("cdf_gap"),
    )


@register("chunk_words_udtf", oracle=_SQL_CHUNK_WORDS)
def chunk_words_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF escape hatch, demonstrated and pinned: the greedy
    word-boundary chunker as an Arrow-optimized Python table function
    lateral-joined per document — the API a user reaches for when an
    operator truly cannot be expressed natively (SURVEY §2.2's
    UDF/UDAF/UDTF row; mapInPandas/pandas_udf cover the other two).
    It shares chunk_words' oracle, so the UDTF is PROVEN
    output-identical to the native higher-order fold — and the native
    form remains the default because it stays in whole-stage codegen
    while this one pays a Python round trip per batch. Scale shape:
    map-only lateral explode, no shuffle; Arrow batches amortize the
    serialization."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, chunk string, chunk_chars int", useArrow=True)
    class ChunkWordsUdtf:
        def eval(self, text: str, max_chars: int):
            toks = [t for t in (text or "").split(" ") if t]
            done: list[str] = []
            cur = ""
            for t in toks:
                joined = t if not cur else f"{cur} {t}"
                if len(joined) <= max_chars:
                    cur = joined
                else:
                    if cur:
                        done.append(cur)
                    cur = t
            if cur:
                done.append(cur)
            for i, c in enumerate(done):
                yield i, c, len(c)

    from nano_vectordb_spark.sources.tables import register_views

    spark.udtf.register("nvdb_chunk_words", ChunkWordsUdtf)
    register_views(spark, sf_dir)
    return spark.sql(
        f"SELECT d.doc_id, c.chunk_id, c.chunk, c.chunk_chars "
        f"FROM documents d, LATERAL nvdb_chunk_words(d.text, {_CHUNK_CHARS}) c"
    )


_SQL_PARETO = """
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY o_custkey
),
c AS (
  SELECT o_custkey, r,
         sum(r) OVER (ORDER BY r DESC, o_custkey ASC) AS cum_r,
         sum(r) OVER () AS tot_r,
         row_number() OVER (ORDER BY r DESC, o_custkey ASC) AS rn,
         count(*) OVER () AS n
  FROM rev
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(CASE WHEN CAST(cum_r AS DOUBLE) / CAST(tot_r AS DOUBLE) >= 0.8
                THEN rn END) AS BIGINT) AS n_for_80pct,
       round(CAST(min(CASE WHEN CAST(cum_r AS DOUBLE) / CAST(tot_r AS DOUBLE) >= 0.8
                      THEN rn END) AS DOUBLE) / max(n), 6) AS share_for_80pct,
       round(CAST(max(CASE WHEN rn = 1 THEN cum_r END) AS DOUBLE)
             / CAST(max(tot_r) AS DOUBLE), 6) AS top1_share
FROM c
"""


@register("revenue_pareto", oracle=_SQL_PARETO)
def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration / Pareto analysis: how many customers (and what
    fraction of the base) produce 80% of order revenue, plus the top
    customer's share — the 80/20 report behind sales prioritization
    and, in the corpus world, the "does one vendor dominate the
    mixture" check. Scale shape: one keyed exact-DECIMAL aggregate,
    then a TWO-PHASE global rank + running decimal sum (range
    partition, per-partition window, broadcast offsets —
    operators/globalrank.py; decimal addition is associative so the
    offset-split running sum is exactly the window's) instead of the
    one-task unpartitioned window; totals come from a plain aggregate
    cross-joined as one broadcast row. Only the final shares divide
    through doubles with round-6."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    c = grank.two_phase_rank(
        rev,
        [F.col("r").desc(), F.col("o_custkey").asc()],
        cum_sums=[(F.col("r"), "cum_r")],
        rn_name="rn",
    )
    tot = rev.agg(
        F.sum("r").alias("tot_r"), F.count("*").cast("long").alias("n")
    )
    c = c.crossJoin(F.broadcast(tot))
    frac = F.col("cum_r").cast("double") / F.col("tot_r").cast("double")
    return c.agg(
        F.count("*").alias("n_customers"),
        F.min(F.when(frac >= 0.8, F.col("rn"))).cast("long").alias("n_for_80pct"),
        F.round(
            F.min(F.when(frac >= 0.8, F.col("rn"))).cast("double") / F.max("n"),
            6,
        ).alias("share_for_80pct"),
        F.round(
            F.max(F.when(F.col("rn") == 1, F.col("cum_r"))).cast("double")
            / F.max("tot_r").cast("double"),
            6,
        ).alias("top1_share"),
    )


_TOPIC_K = 8
_TOPIC_TOP = 5


def _py_hash_embed(text: str, dim: int) -> list[float]:
    """Pure-Python replica of operators/textops.hash_embed — same md5
    buckets, same 1/(pos+1) weights, same sequential folds, same L2
    normalize — bit-identical doubles (used only to fit the oracle's
    centroid literals)."""
    import hashlib
    import math

    toks = [t for t in (text or "").split(" ") if t]
    raw = [0.0] * dim
    for i, t in enumerate(toks):
        b = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:7], 16) % dim
        raw[b] += 1.0 / (i + 1)
    s = 0.0
    for v in raw:
        s += v * v
    if s == 0.0:
        return raw
    n = math.sqrt(s)
    return [v / n for v in raw]


def _topic_centroids_np() -> "object":
    def fit():
        import numpy as np
        import pyarrow.parquet as papq

        from nano_vectordb_spark.functions import kmeans as km

        tbl = papq.read_table(
            f"{_ORACLE_SF}/documents.parquet", columns=["doc_id", "text"]
        )
        rows = sorted(
            zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
        )
        n_train = km.train_rows_for(_TOPIC_K)
        mat = np.asarray(
            [_py_hash_embed(t, _EMBED_DIM) for _, t in rows[:n_train]],
            dtype=np.float64,
        )
        return km.lloyd_fit(mat, _TOPIC_K, seed=SEED)

    return _fit_cached("topic_centroids", fit)


def _topic_oracle() -> str:
    cent = _topic_centroids_np()
    values = ",\n    ".join(f"({i}, {_dlist(c)})" for i, c in enumerate(cent))
    l2 = _sql_l2("e.emb", "c.centroid")
    return f"""
WITH chunks AS (
  SELECT doc_id, 0 AS chunk_id, text AS chunk, length(text) AS chunk_chars
  FROM documents
),
{_sql_embed_ctes("chunks")},
embx AS MATERIALIZED (SELECT doc_id, emb FROM embedded),
centroids(cluster_id, centroid) AS (VALUES
    {values}),
assigned AS (
  SELECT doc_id, cluster_id FROM (
    SELECT e.doc_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.doc_id
             ORDER BY {l2} ASC, c.cluster_id ASC) AS rn
    FROM embx e CROSS JOIN centroids c)
  WHERE rn = 1
),
toksx AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tc AS (
  SELECT a.cluster_id, t.term, CAST(count(*) AS BIGINT) AS cnt
  FROM toksx t JOIN assigned a USING (doc_id) GROUP BY 1, 2
),
dfc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS dfc
  FROM (SELECT DISTINCT cluster_id, term FROM tc) t GROUP BY term
),
sz AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
  FROM assigned GROUP BY cluster_id
),
scored AS (
  SELECT tc.cluster_id, tc.term, tc.cnt, dfc.dfc,
         round(tc.cnt * log2(CAST({_TOPIC_K} AS DOUBLE) / dfc.dfc), 6) AS score
  FROM tc JOIN dfc USING (term)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
              ORDER BY score DESC, term ASC) AS tr
  FROM scored
)
SELECT CAST(r.cluster_id AS INT) AS cluster_id, sz.n_docs, r.term, r.cnt,
       r.dfc AS df_clusters, r.score, CAST(r.tr AS INT) AS term_rank
FROM ranked r JOIN sz USING (cluster_id)
WHERE r.tr <= {_TOPIC_TOP}
"""


@register("cluster_topics", oracle=_topic_oracle)
def cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus topic discovery, end to end (the BERTopic shape on
    deterministic parts): hash-projection doc embeddings -> seeded
    k-means into {_TOPIC_K} clusters -> top-{_TOPIC_TOP} c-TF-IDF
    terms per cluster (count-in-cluster x log2(K / clusters-containing-
    term)) with cluster sizes — the unsupervised "what is in this
    corpus" report curation teams read before designing mixtures.
    Composes three proven subsystems: the O33 embed pipeline, the IVF
    ladder's driver-side Lloyd fit (bounded training prefix in doc_id
    order, centroid literals in the oracle), and the TF-IDF posting
    machinery. Scale shape: embed is map-only codegen; assignment is a
    K-way broadcast-centroid fold (no UDF — identical to the oracle's
    argmin); topic scoring is two map-side-combined counts + a
    |vocab|-keyed join. Determinism: embeds are bit-identical IEEE in
    Spark / DuckDB / the Python fit replica; assignment ties break on
    cluster_id; the score ranks on its rounded value."""
    import numpy as np

    from nano_vectordb_spark.functions import kmeans as km

    docs = load_table(spark, sf_dir, "documents")
    # persist the embeds: the K-way assignment fold references the
    # embedding column 8x32 times — without a materialization barrier
    # Catalyst inlines the whole hash_embed expression at every
    # reference and the md5 token hashes recompute K x dim times per row.
    # Memoized per fixture (the dedup/IVF _INDEX_CACHE discipline) so
    # repeated gate/bench invocations reuse one cached plan instead of
    # re-persisting blocks every call.
    key = ("topic_emb", sf_dir)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = (
            text_ops.hash_embed(
                docs.select("doc_id", "text"), _EMBED_DIM, text_col="text"
            )
            .select("doc_id", "embedding")
            .persist()
        )
    emb = _INDEX_CACHE[key]
    n_train = km.train_rows_for(_TOPIC_K)
    mat = np.asarray(
        [
            r["embedding"]
            for r in emb.orderBy("doc_id").limit(n_train).collect()
        ],
        dtype=np.float64,
    )
    cent = km.lloyd_fit(mat, _TOPIC_K, seed=SEED)

    def l2_to(c: list) -> Column:
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.lit(c).cast("array<double>"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    choices = F.array(
        *[
            F.struct(l2_to(cent[i].tolist()).alias("d2"), F.lit(i).alias("cid"))
            for i in range(_TOPIC_K)
        ]
    )
    assigned = emb.select(
        "doc_id", F.array_min(choices)["cid"].alias("cluster_id")
    )
    toks = docs.select("doc_id", F.explode(tx.tokens_expr("text")).alias("term"))
    tc = (
        toks.join(assigned, "doc_id")
        .groupBy("cluster_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    dfc = (
        tc.select("cluster_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("dfc"))
    )
    sz = assigned.groupBy("cluster_id").agg(F.count("*").alias("n_docs"))
    scored = tc.join(dfc, "term").select(
        "cluster_id",
        "term",
        "cnt",
        "dfc",
        F.round(
            F.col("cnt") * F.log2(F.lit(float(_TOPIC_K)) / F.col("dfc")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("tr", F.row_number().over(w))
        .filter(F.col("tr") <= _TOPIC_TOP)
        .join(F.broadcast(sz), "cluster_id")
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "n_docs",
            "term",
            "cnt",
            F.col("dfc").alias("df_clusters"),
            "score",
            F.col("tr").cast("int").alias("term_rank"),
        )
    )


_WRS_N = 20
_WRS_DENOM = float((1 << 28) + 1)

_SQL_WRS = f"""
WITH qual AS ({_SQL_QUALITY}),
k AS (
  SELECT doc_id, round(quality, 6) AS w,
         CAST(('0x' || substr(md5('wrs{SEED}:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
              + 1 AS DOUBLE) / {_WRS_DENOM!r} AS u
  FROM qual
),
s AS (SELECT doc_id, w, round(pow(u, 1.0 / w), 6) AS sample_key FROM k),
r AS (
  SELECT doc_id, w, sample_key,
         CAST(row_number() OVER (ORDER BY sample_key DESC, doc_id ASC) AS INT)
           AS sample_rank
  FROM s
)
SELECT doc_id, w, sample_key, sample_rank FROM r WHERE sample_rank <= {_WRS_N}
"""


@register("weighted_sample_docs", oracle=_SQL_WRS)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, distributed (Efraimidis-
    Spirakis A-Res): every doc draws key = u^(1/w) from a seeded
    md5-uniform u and its quality score w, and the global top-{_WRS_N}
    keys ARE the weighted sample — quality-weighted corpus subsampling
    with single-pass, coordination-free semantics (each partition can
    keep a local top-n and merge: the same partial/final top-k
    machinery as the vector scans, which is why this beats sequential
    reservoir algorithms on a cluster). Complements mixture_sample's
    with-replacement rate thinning with exact without-replacement
    draws. Determinism: u is an md5-derived exact rational, w rounds
    to 6, pow carries the libm round-6 contract, and the rank orders
    on the rounded key."""
    d = _toks_df(spark, sf_dir)
    qual = d.select(
        "doc_id", F.round(tx.quality_expr(F.col("toks"), "text"), 6).alias("w")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"wrs{SEED}:"), F.col("doc_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ).cast("double") / F.lit(_WRS_DENOM)
    s = qual.select(
        "doc_id",
        "w",
        F.round(F.pow(u, F.lit(1.0) / F.col("w")), 6).alias("sample_key"),
    )
    w_rank = Window.orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())
    return (
        s.withColumn("sample_rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("sample_rank") <= _WRS_N)
        .select("doc_id", "w", "sample_key", "sample_rank")
    )


_DTK_PER_SOURCE = 10
_DTK_GLOBAL = 50

_SQL_DIVERSE_TOPK = f"""
WITH qual AS ({_SQL_QUALITY}),
j AS (
  SELECT d.doc_id, d.source, round(q.quality, 6) AS quality
  FROM documents d JOIN qual q ON q.doc_id = d.doc_id
),
per_src AS (
  SELECT doc_id, source, quality,
         CAST(row_number() OVER (PARTITION BY source
           ORDER BY quality DESC, doc_id ASC) AS INT) AS source_rank
  FROM j
),
capped AS (SELECT * FROM per_src WHERE source_rank <= {_DTK_PER_SOURCE})
SELECT doc_id, source, quality, source_rank,
       CAST(row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS INT)
         AS global_rank
FROM capped
QUALIFY global_rank <= {_DTK_GLOBAL}
"""


@register("diverse_topk_docs", oracle=_SQL_DIVERSE_TOPK)
def diverse_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-constrained selection: global top-{_DTK_GLOBAL} docs
    by quality, subject to a per-source cap of {_DTK_PER_SOURCE} — the
    curation rule that stops one prolific vendor from monopolizing a
    budgeted high-quality subset (the set-level cousin of topk_mmr's
    per-query diversification). Scale shape: one source-partitioned
    window (per-group top-k, map-side heap-friendly) then a global
    top-n over only sources x cap survivors — the same partial/final
    reduction as every top-k here. Ranks order on the 6-decimal-
    rounded quality with doc_id tie-breaks, so both windows are total
    orders in both engines."""
    d = _toks_df(spark, sf_dir)
    j = d.select(
        "doc_id",
        "source",
        F.round(tx.quality_expr(F.col("toks"), "text"), 6).alias("quality"),
    )
    w_src = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    capped = (
        j.withColumn("source_rank", F.row_number().over(w_src).cast("int"))
        .filter(F.col("source_rank") <= _DTK_PER_SOURCE)
    )
    w_glob = Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return (
        capped.withColumn("global_rank", F.row_number().over(w_glob).cast("int"))
        .filter(F.col("global_rank") <= _DTK_GLOBAL)
        .select("doc_id", "source", "quality", "source_rank", "global_rank")
    )


_SCD2_MOD = 7  # doc_id % 7 == 0 receives a v2 update (corpus_upsert's batch)

_SQL_SCD2 = f"""
WITH hist AS (
  SELECT doc_id, md5(text) AS text_md5, 1 AS version FROM documents
  UNION ALL
  SELECT doc_id, md5(text || ' [v2]') AS text_md5, 2 AS version
  FROM documents WHERE doc_id % {_SCD2_MOD} = 0
)
SELECT doc_id, CAST(version AS INT) AS version, text_md5,
       CAST(version AS INT) AS valid_from,
       CAST(lead(version) OVER (PARTITION BY doc_id ORDER BY version)
            AS INT) AS valid_to,
       CAST(CASE WHEN lead(version) OVER (PARTITION BY doc_id ORDER BY version)
                 IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM hist
"""


@register("corpus_history_scd2", oracle=_SQL_SCD2)
def corpus_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-history corpus versioning (SCD type 2): where
    corpus_upsert keeps only the LATEST row per doc (type 1), this
    derives the validity-interval history table — every version with
    [valid_from, valid_to) bounds and an is_current flag — the layout
    that lets a training run pin "the corpus as of release R" forever
    (reproducibility) while ingests keep appending. Closing the
    previous version is one doc-keyed lead() window over the unioned
    history, no self-join. Integer-exact; text content enters only as
    md5."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select(
        "doc_id", F.md5("text").alias("text_md5"), F.lit(1).alias("version")
    )
    v2 = docs.where(F.col("doc_id") % _SCD2_MOD == 0).select(
        "doc_id",
        F.md5(F.concat("text", F.lit(" [v2]"))).alias("text_md5"),
        F.lit(2).alias("version"),
    )
    hist = v1.unionByName(v2)
    w = Window.partitionBy("doc_id").orderBy("version")
    nxt = F.lead("version").over(w)
    return hist.select(
        "doc_id",
        F.col("version").cast("int").alias("version"),
        "text_md5",
        F.col("version").cast("int").alias("valid_from"),
        nxt.cast("int").alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


# Jaccard threshold over distinct 3-gram shingle sets — the SAME
# semantics as ngram_jaccard_pairs/_JACCARD_T, so the two entries are
# two candidate-generation algorithms for one contract.
# ceil(0.2 * n) == (n + 4) // 5 in exact integer arithmetic.

_SQL_PREFIX_JOIN = f"""
WITH sh AS ({_SQL_SHINGLES}),
dt AS (SELECT doc_id, unnest(shingles) AS w FROM sh),
freq AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY w),
ordered AS (
  SELECT d.doc_id, d.w,
         row_number() OVER (PARTITION BY d.doc_id ORDER BY f.c ASC, d.w ASC) AS rn,
         count(*) OVER (PARTITION BY d.doc_id) AS n
  FROM dt d JOIN freq f USING (w)
),
prefix AS (SELECT doc_id, w FROM ordered WHERE rn <= n - (n + 4) // 5 + 1),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM prefix a JOIN prefix b ON a.w = b.w AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, shingles AS s, len(shingles) AS n FROM sh),
verified AS (
  SELECT c.a_id, c.b_id,
         CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         / CAST(sa.n + sb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.a_id
  JOIN sets sb ON sb.doc_id = c.b_id
)
SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= {_JACCARD_T}
"""


@register("prefix_filter_join", oracle=_SQL_PREFIX_JOIN)
def prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (AllPairs /
    PPJoin, Bayardo et al. WWW'07): the deterministic alternative to
    MinHash-LSH when missed pairs are unacceptable — same contract as
    ngram_jaccard_pairs (3-gram shingle Jaccard >= threshold), third
    algorithm beside the full inverted-index join and the banded LSH.
    Shingles order globally by frequency (rarest first); a qualifying
    pair MUST share a shingle among each side's first
    n - ceil(t*n) + 1 rarest, so the candidate index is built over
    PREFIXES only — rare shingles with short posting lists — and the
    verify step recomputes exact Jaccard on survivors. Any recall bug
    in the filter surfaces as a hash mismatch vs the exact semantics.
    Scale shape: one frequency count, one per-doc window, a posting
    join on prefix shingles, set-lookup verify. Prefix length is pure
    integer arithmetic; the one division is the exact Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    t = dedup_ops.ngram_shingles(docs).select(
        "doc_id", F.col("shingles").alias("s")
    )
    dt = t.select("doc_id", F.explode("s").alias("w"))
    freq = dt.groupBy("w").agg(F.count("*").alias("c"))
    w_doc = Window.partitionBy("doc_id").orderBy(F.col("c").asc(), F.col("w").asc())
    w_n = Window.partitionBy("doc_id")
    ordered = dt.join(freq, "w").select(
        "doc_id",
        "w",
        F.row_number().over(w_doc).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    prefix = ordered.where(
        F.col("rn") <= F.col("n") - F.expr("(n + 4) div 5") + 1
    ).select("doc_id", "w")
    a = prefix.select(F.col("doc_id").alias("a_id"), "w")
    b = prefix.select(F.col("doc_id").alias("b_id"), "w")
    cand = (
        a.join(b, "w")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sets = t.select("doc_id", "s", F.size("s").alias("n"))
    inter = F.size(F.array_intersect("sa", "sb"))
    verified = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("a_id"),
                F.col("s").alias("sa"),
                F.col("n").alias("na"),
            ),
            "a_id",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("b_id"),
                F.col("s").alias("sb"),
                F.col("n").alias("nb"),
            ),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            (
                inter.cast("double")
                / (F.col("na") + F.col("nb") - inter).cast("double")
            ).alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= _JACCARD_T)


_SQL_TREND = """
WITH daily AS (
  SELECT event_type, CAST(EXTRACT(day FROM ts) AS INT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
         CAST(sum(d * d) AS BIGINT) AS sxx, CAST(sum(d * c) AS BIGINT) AS sxy
  FROM daily GROUP BY event_type
)
SELECT event_type, n AS n_days, sy AS total_events,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_per_day,
       round(CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS DOUBLE)
             / CAST(n * (n * sxx - sx * sx) AS DOUBLE), 6) AS intercept
FROM s
"""


@register("event_type_trend", oracle=_SQL_TREND)
def event_type_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend detection: per event type, the OLS slope and intercept of
    its daily volume over the month — the "is this signal growing or
    decaying" line a monitoring dashboard fits before alerting on
    value_drift_ks's distribution shift. Every sufficient statistic
    (n, Σx, Σy, Σx², Σxy) is an exact INTEGER (day indices x counts),
    so the slope is an exact rational and both engines compute the
    identical double before the shared round-6; the whole fit is one
    map-side-combined aggregate over the day-grain rollup — the same
    one-pass moment reduction as the Pearson entry, here with closed-
    form normal equations."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "event_type", F.dayofmonth("ts").cast("int").alias("d")
    ).groupBy("event_type", "d").agg(F.count("*").alias("c"))
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sx"),
        F.sum("c").alias("sy"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
        F.sum(F.col("d") * F.col("c")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sy").alias("total_events"),
        F.round(num.cast("double") / den.cast("double"), 6).alias(
            "slope_per_day"
        ),
        F.round(
            (F.col("sy") * den - num * F.col("sx")).cast("double")
            / (F.col("n") * den).cast("double"),
            6,
        ).alias("intercept"),
    )


_SQL_MAX_CONCURRENT = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
),
s AS (
  SELECT user_id, session_id,
         min(epoch_us(ts)) AS st, max(epoch_us(ts)) AS en
  FROM sess GROUP BY user_id, session_id
),
pts AS (
  SELECT st AS t, 1 AS d, user_id, session_id FROM s
  UNION ALL
  SELECT en AS t, -1 AS d, user_id, session_id FROM s
),
c AS (
  SELECT t,
         sum(d) OVER (ORDER BY t ASC, d DESC, user_id ASC, session_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM pts
),
m AS (SELECT CAST(max(conc) AS BIGINT) AS max_concurrent FROM c)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_sessions,
       m.max_concurrent,
       CAST((SELECT min(t) FROM c WHERE c.conc = m.max_concurrent) AS BIGINT)
         AS peak_t_us
FROM m
"""


@register("max_concurrent_sessions", oracle=_SQL_MAX_CONCURRENT)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the sweep-line algorithm: sessions (the
    30-minute-gap sessionize derivation) become +1/-1 boundary points,
    a single ordered running sum IS the concurrency curve, and its max
    and first-peak time are the capacity-planning numbers (how many
    simultaneous sessions must the serving tier hold). Interval-
    overlap counting without any interval self-join — the sweep
    replaces an O(n^2) overlap join with one sort, exactly like the
    hypertable rollup replaces point lookups. Inclusive semantics:
    starts order before ends at equal timestamps (d DESC tie-break),
    then user/session ids make the sweep a total order. Integer
    microseconds end to end."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        ts_us.alias("ts_us"),
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(
            ts_us - F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))"
            )
            > 1_800_000_000,
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = gaps.select(
        "user_id", "ts_us", F.sum("is_new").over(w_run).alias("session_id")
    )
    s = sess.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("st"), F.max("ts_us").alias("en")
    )
    pts = s.select(
        F.col("st").alias("t"), F.lit(1).alias("d"), "user_id", "session_id"
    ).unionByName(
        s.select(
            F.col("en").alias("t"), F.lit(-1).alias("d"), "user_id", "session_id"
        )
    )
    w_sweep = Window.orderBy(
        F.col("t").asc(), F.col("d").desc(), F.col("user_id").asc(),
        F.col("session_id").asc(),
    ).rowsBetween(Window.unboundedPreceding, 0)
    c = pts.select("t", F.sum("d").over(w_sweep).alias("conc"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    peak = (
        c.select(
            "t", "conc", F.max("conc").over(w_all).alias("mx")
        )
        .where(F.col("conc") == F.col("mx"))
        .agg(
            F.max("mx").cast("long").alias("max_concurrent"),
            F.min("t").cast("long").alias("peak_t_us"),
        )
    )
    n_sess = s.agg(F.count("*").alias("n_sessions"))
    a_side = n_sess.select(
        "n_sessions",
        F.lit(None).cast("long").alias("max_concurrent"),
        F.lit(None).cast("long").alias("peak_t_us"),
    )
    b_side = peak.select(
        F.lit(None).cast("long").alias("n_sessions"),
        "max_concurrent",
        "peak_t_us",
    )
    return (
        a_side.unionByName(b_side)
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("max_concurrent").alias("max_concurrent"),
            F.max("peak_t_us").alias("peak_t_us"),
        )
    )


_SQL_ASSOC = """
WITH b AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
),
nb AS (SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n FROM b),
items AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS ante, c.event_type AS cons,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM b a JOIN b c
    ON a.user_id = c.user_id AND a.day = c.day
   AND a.event_type < c.event_type
  GROUP BY 1, 2
)
SELECT p.ante, p.cons, p.c_ab,
       ia.c AS c_ante, ic.c AS c_cons,
       round(CAST(p.c_ab AS DOUBLE) / nb.n, 6) AS support,
       round(CAST(p.c_ab AS DOUBLE) / ia.c, 6) AS confidence,
       round((CAST(p.c_ab AS DOUBLE) * nb.n) / (CAST(ia.c AS DOUBLE) * ic.c), 6)
         AS lift
FROM pairs p
JOIN items ia ON ia.event_type = p.ante
JOIN items ic ON ic.event_type = p.cons
CROSS JOIN nb
"""


@register("event_assoc_rules", oracle=_SQL_ASSOC)
def event_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (the market-basket shape, Apriori's
    first level): baskets are (user, day) distinct event-type sets;
    for every type pair, support, confidence and lift — lift near 1
    says the behaviors co-occur by volume alone, which is exactly what
    a feature-engineering pass needs to know before crossing features.
    Scale shape: basket dedup is one distinct (map-side combinable),
    pair counts come from a basket-keyed self-join whose per-basket
    fan-out is bounded by the item-type cardinality squared (never
    rows^2), and the rule stats are a broadcast item-count join.
    Counts exact; the three ratios carry round-6."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).distinct()
    n_baskets = b.select("user_id", "day").distinct().count()
    items = b.groupBy("event_type").agg(F.count("*").alias("c"))
    a = b.select("user_id", "day", F.col("event_type").alias("ante"))
    c = b.select("user_id", "day", F.col("event_type").alias("cons"))
    pairs = (
        a.join(c, ["user_id", "day"])
        .where(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").alias("c_ab"))
    )
    ia = items.select(F.col("event_type").alias("ante"), F.col("c").alias("c_ante"))
    ic = items.select(F.col("event_type").alias("cons"), F.col("c").alias("c_cons"))
    return (
        pairs.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .select(
            "ante",
            "cons",
            "c_ab",
            "c_ante",
            "c_cons",
            F.round(F.col("c_ab").cast("double") / F.lit(n_baskets), 6).alias(
                "support"
            ),
            F.round(F.col("c_ab").cast("double") / F.col("c_ante"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("c_ab").cast("double") * F.lit(n_baskets))
                / (F.col("c_ante").cast("double") * F.col("c_cons")),
                6,
            ).alias("lift"),
        )
    )


_PHH_TOP = 10
_PHH_MIN_DAYS = 4

_SQL_PERSISTENT_HH = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT day, user_id, c,
         row_number() OVER (PARTITION BY day ORDER BY c DESC, user_id ASC) AS rn
  FROM daily
),
hh AS (SELECT day, user_id, c FROM ranked WHERE rn <= {_PHH_TOP})
SELECT user_id,
       CAST(count(*) AS BIGINT) AS days_in_top{_PHH_TOP},
       CAST(sum(c) AS BIGINT) AS events_while_top,
       CAST(min(day) AS DATE) AS first_day,
       CAST(max(day) AS DATE) AS last_day
FROM hh
GROUP BY user_id
HAVING count(*) >= {_PHH_MIN_DAYS}
"""


@register("persistent_heavy_hitters", oracle=_SQL_PERSISTENT_HH)
def persistent_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal stability of heavy hitters: users in the daily
    top-{_PHH_TOP} by event volume on at least {_PHH_MIN_DAYS} of the
    month's days — separating persistent power users (or abusers:
    rate-limit candidates, dedup-source suspects) from one-day bursts
    that a single global top-k cannot distinguish. Scale shape: the
    day-grain rollup (the sliding-distinct entry's pre-agg) ranked
    inside each day partition — top-k per window is map-side-heap
    friendly — then one user-keyed aggregate over days x {_PHH_TOP}
    survivor rows. Integer-exact throughout."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .groupBy("day", "user_id")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("day").orderBy(F.col("c").desc(), F.col("user_id").asc())
    hh = daily.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _PHH_TOP
    )
    return (
        hh.groupBy("user_id")
        .agg(
            F.count("*").alias(f"days_in_top{_PHH_TOP}"),
            F.sum("c").alias("events_while_top"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
        .filter(F.col(f"days_in_top{_PHH_TOP}") >= _PHH_MIN_DAYS)
    )


_SQL_FEDERATED = """
WITH chk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(('0x' || substr(md5(
               CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31) || lang
               || chr(31) || source || chr(31) || CAST(n_chars AS VARCHAR)
             ), 1, 12))::BIGINT) AS BIGINT) AS checksum
  FROM documents
)
SELECT f.fmt AS format, chk.n_docs, chk.checksum
FROM (VALUES ('csv'), ('jsonl'), ('parquet')) f(fmt) CROSS JOIN chk
"""


def _row_checksum_expr() -> Column:
    """Order-independent corpus checksum: sum of 48-bit md5 row hashes
    (bounded so a BIGINT sum cannot overflow at any plausible sf)."""
    payload = F.concat_ws(
        "",
        F.col("doc_id").cast("string"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars").cast("string"),
    )
    return F.conv(F.substring(F.md5(payload), 1, 12), 16, 10).cast("long")


@register("federated_format_audit", oracle=_SQL_FEDERATED)
def federated_format_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated-source consistency: the SAME corpus read back through
    all three interchange formats (parquet at rest, RFC-4180 CSV,
    JSON-lines) must agree on an order-independent content checksum —
    the cheap invariant a pipeline checks after every format hop
    (vendor deliveries arrive as CSV/JSONL; one mangled quote or
    dropped row flips the sum). The checksum is a SUM of 48-bit md5
    row digests: commutative (no ordering requirement between
    engines/partitions), mergeable (per-partition partials add), and
    BIGINT-safe by construction. The oracle derives every format's
    expected row from the parquet truth, so a format reader that
    diverges fails the hash even though each roundtrip entry is also
    checked row-by-row elsewhere."""
    import os as _os

    from nano_vectordb_spark.sources import jsonl as jsonl_src

    pq = load_table(spark, sf_dir, "documents")
    csv = _csv_docs(spark, sf_dir)
    path = _jsonl_docs_path(sf_dir)
    _materialize_once(
        path,
        lambda p: jsonl_src.write_documents_jsonl(
            load_table(spark, sf_dir, "documents"), p
        ),
    )
    jl = jsonl_src.read_documents_jsonl(spark, path)

    def audit(df: DataFrame, fmt: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_docs"),
            F.sum(_row_checksum_expr()).alias("checksum"),
        ).select(F.lit(fmt).alias("format"), "n_docs", "checksum")

    return (
        audit(csv, "csv")
        .unionByName(audit(jl, "jsonl"))
        .unionByName(audit(pq, "parquet"))
    )


_SQL_DOW_SEASONALITY = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
d2 AS (SELECT CAST(EXTRACT(isodow FROM day) AS INT) AS dow, c FROM daily),
g AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(c) AS BIGINT) AS s_g, CAST(sum(c * c) AS BIGINT) AS q_g
  FROM d2 GROUP BY dow
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s,
         CAST(sum(q_g) AS BIGINT) AS q,
         list_aggregate(
           list(q_g - CAST(s_g AS DOUBLE) * s_g / n_g
                ORDER BY q_g - CAST(s_g AS DOUBLE) * s_g / n_g), 'sum') AS sse
  FROM g
),
prof AS (
  SELECT dow, n_g, s_g, round(CAST(s_g AS DOUBLE) / n_g, 6) AS mean_daily
  FROM g
),
pk AS (
  SELECT max(mean_daily) AS peak_mean, min(mean_daily) AS trough_mean FROM prof
)
SELECT tot.n AS n_days,
       round(1.0 - tot.sse / (tot.q - CAST(tot.s AS DOUBLE) * tot.s / tot.n), 6)
         AS r2_dow,
       pk.peak_mean, pk.trough_mean,
       round(pk.peak_mean / pk.trough_mean, 6) AS peak_over_trough
FROM tot CROSS JOIN pk
"""


@register("dow_seasonality", oracle=_SQL_DOW_SEASONALITY)
def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength: how much of daily event-volume variance
    the day-of-week explains — R^2 of the seven dow means as a model
    (the ANOVA between/within decomposition), plus the peak/trough
    amplitude. R^2 near 0 says the traffic has no weekly rhythm and a
    capacity plan can ignore weekday; near 1 says dow-aware
    autoscaling pays. Everything reduces over the 30-row day-grain
    rollup: group sums/squares are exact integers, each group's
    within-term pays one exact IEEE division, the 7-term SSE folds in
    value order, and the final ratios carry round-6."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.col("ts").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("c"))
    )
    d2 = daily.select((F.weekday("day") + 1).alias("dow"), "c")
    g = d2.groupBy("dow").agg(
        F.count("*").alias("n_g"),
        F.sum("c").alias("s_g"),
        F.sum(F.col("c") * F.col("c")).alias("q_g"),
    )
    term = F.col("q_g") - F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.aggregate(
            F.array_sort(F.collect_list(term)), F.lit(0.0), lambda a, x: a + x
        ).alias("sse"),
        F.max(F.round(F.col("s_g").cast("double") / F.col("n_g"), 6)).alias(
            "peak_mean"
        ),
        F.min(F.round(F.col("s_g").cast("double") / F.col("n_g"), 6)).alias(
            "trough_mean"
        ),
    )
    sst = F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return tot.select(
        F.col("n").alias("n_days"),
        F.round(F.lit(1.0) - F.col("sse") / sst, 6).alias("r2_dow"),
        "peak_mean",
        "trough_mean",
        F.round(F.col("peak_mean") / F.col("trough_mean"), 6).alias(
            "peak_over_trough"
        ),
    )


_SQL_MARKOV = """
WITH seq AS (
  SELECT user_id, event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events
),
tr AS (
  SELECT f, t, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE t IS NOT NULL GROUP BY f, t
),
fr AS (SELECT f, CAST(sum(c) AS BIGINT) AS c_f FROM tr GROUP BY f),
tto AS (SELECT t, CAST(sum(c) AS BIGINT) AS c_t FROM tr GROUP BY t),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tr)
SELECT tr.f AS from_type, tr.t AS to_type, tr.c AS n_transitions,
       round(CAST(tr.c AS DOUBLE) / fr.c_f, 6) AS prob,
       round(CAST(tr.c AS DOUBLE) * tot.n / (CAST(fr.c_f AS DOUBLE) * tto.c_t), 6)
         AS lift
FROM tr
JOIN fr ON fr.f = tr.f
JOIN tto ON tto.t = tr.t
CROSS JOIN tot
"""


@register("event_markov_transitions", oracle=_SQL_MARKOV)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model of user behavior: the event-type
    transition matrix (row-normalized probabilities) plus each cell's
    lift over the independence baseline — the sequential counterpart
    of event_assoc_rules' co-occurrence view (P(next|current) vs
    P(A,B) per basket) and the statistical layer under
    event_pattern_match's literal patterns. Scale shape: one
    user-partitioned lead() window (no self-join builds the bigrams),
    then a 25-cell aggregate with two broadcast marginal joins.
    Counts exact; prob and lift are exact-integer ratios through one
    round-6 each."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(w).alias("t"),
    ).where(F.col("t").isNotNull())
    tr = seq.groupBy("f", "t").agg(F.count("*").alias("c"))
    fr = tr.groupBy("f").agg(F.sum("c").alias("c_f"))
    tto = tr.groupBy("t").agg(F.sum("c").alias("c_t"))
    n = tr.agg(F.sum("c")).collect()[0][0]
    return (
        tr.join(F.broadcast(fr), "f")
        .join(F.broadcast(tto), "t")
        .select(
            F.col("f").alias("from_type"),
            F.col("t").alias("to_type"),
            F.col("c").alias("n_transitions"),
            F.round(F.col("c").cast("double") / F.col("c_f"), 6).alias("prob"),
            F.round(
                F.col("c").cast("double") * F.lit(int(n))
                / (F.col("c_f").cast("double") * F.col("c_t")),
                6,
            ).alias("lift"),
        )
    )


_RPP_P = 16  # target partition count

_SQL_RANGE_PARTITION = f"""
WITH k AS (SELECT o_custkey AS key FROM orders),
n_(n) AS (SELECT CAST(count(*) AS BIGINT) FROM k),
dist AS (
  SELECT key, CAST(count(*) AS BIGINT) AS c FROM k GROUP BY key
),
cum AS (
  SELECT key, sum(c) OVER (ORDER BY key) AS cum FROM dist
),
bounds AS (
  SELECT i,
         (SELECT min(key) FROM cum, n_
          WHERE cum.cum >= (i * n_.n + {_RPP_P} - 1) // {_RPP_P}) AS b
  FROM (SELECT unnest(range(1, {_RPP_P})) AS i) t
),
blist AS (SELECT list(b ORDER BY b) AS bs FROM bounds),
assigned AS (
  SELECT k.key,
         CAST(len(list_filter(blist.bs, x -> k.key > x)) AS INT) AS pid
  FROM k CROSS JOIN blist
),
per AS (
  SELECT pid, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(min(key) AS BIGINT) AS min_key,
         CAST(max(key) AS BIGINT) AS max_key
  FROM assigned GROUP BY pid
)
SELECT pid AS partition_id, n_rows, min_key, max_key,
       round(CAST(n_rows AS DOUBLE)
             / (CAST(sum(n_rows) OVER () AS DOUBLE) / {_RPP_P}), 6) AS load_factor
FROM per
"""


@register("range_partition_plan", oracle=_SQL_RANGE_PARTITION)
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioning planner, exact: the {_RPP_P - 1} split keys a
    repartitionByRange over orders.o_custkey SHOULD use (true order
    statistics, not Spark's reservoir-sampled approximation), each
    resulting partition's row count and key range, and its load factor
    vs the ideal n/P — the pre-write diagnostic that says whether a
    chosen range layout will stragglerize before a single byte is
    written (the write-side sibling of user_activity_skew's salt
    sizing). Boundaries come from the counting-quantile trick over the
    DISTINCT-key cumulative histogram (never a global row sort), the
    boundary list is bounded driver state (P-1 longs), and assignment
    is a map-side literal-array comparison. Integer-exact except the
    round-6 load factor."""
    orders = load_table(spark, sf_dir, "orders")
    k = orders.select(F.col("o_custkey").alias("key"))
    n = k.count()
    cum = (
        k.groupBy("key")
        .agg(F.count("*").alias("c"))
        .select(
            "key",
            F.sum("c").over(Window.orderBy("key")).alias("cum"),
        )
    )
    targets = [((i * n + _RPP_P - 1) // _RPP_P) for i in range(1, _RPP_P)]
    # one tiny aggregate job: the i-th boundary is the least key whose
    # cumulative count reaches ceil(i*n/P); P-1 conditional mins in a
    # single row, collected as the bounded driver-state boundary list
    brow = cum.agg(
        *[
            F.min(F.when(F.col("cum") >= t, F.col("key"))).alias(f"b{j}")
            for j, t in enumerate(targets)
        ]
    ).collect()[0]
    bounds = sorted(brow[f"b{j}"] for j in range(len(targets)))
    pid = F.size(
        F.filter(F.lit(bounds).cast("array<bigint>"), lambda x: F.col("key") > x)
    ).cast("int")
    per = (
        k.select("key", pid.alias("pid"))
        .groupBy("pid")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        F.col("pid").alias("partition_id"),
        "n_rows",
        "min_key",
        "max_key",
        F.round(
            F.col("n_rows").cast("double")
            / (F.sum("n_rows").over(w_all).cast("double") / _RPP_P),
            6,
        ).alias("load_factor"),
    )


_CHURN_CUTOFF_DAY = 24  # label window = last week of the month

_SQL_CHURN = f"""
WITH e AS (
  SELECT user_id, event_type, value,
         CAST(EXTRACT(day FROM ts) AS INT) AS d, CAST(ts AS DATE) AS day
  FROM events
),
feat AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events_obs,
         CAST(count(DISTINCT day) AS BIGINT) AS active_days_obs,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchase_obs,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_error_obs,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum_obs,
         CAST(max(d) AS INT) AS last_obs_day
  FROM e WHERE d < {_CHURN_CUTOFF_DAY}
  GROUP BY user_id
),
lab AS (
  SELECT user_id, 1 AS active_label
  FROM e WHERE d >= {_CHURN_CUTOFF_DAY} GROUP BY user_id
)
SELECT f.user_id, f.n_events_obs, f.active_days_obs, f.n_purchase_obs,
       f.n_error_obs, f.value_sum_obs, f.last_obs_day,
       CAST({_CHURN_CUTOFF_DAY} - 1 - f.last_obs_day AS INT) AS recency_days,
       CAST(CASE WHEN l.user_id IS NULL THEN 1 ELSE 0 END AS INT) AS churned
FROM feat f LEFT JOIN lab l ON l.user_id = f.user_id
"""


@register("churn_training_set", oracle=_SQL_CHURN)
def churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised training-table builder: per user, behavioral features
    from the observation window (days 1..{_CHURN_CUTOFF_DAY - 1} —
    volume, active days, purchases, errors, exact decimal spend,
    recency) joined to a churn label from the strictly-later holdout
    week — the leakage-safe feature/label temporal split every churn
    model needs, materialized as ONE table a trainer can read
    directly. This is the end product the engine's event operators
    exist to feed. Scale shape: one user-keyed conditional aggregate
    per window + a broadcast label anti-pattern (left join + null
    flag); no row ever crosses the cutoff in both directions. Integer
    counts, exact decimal money, label integer."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        "value",
        F.dayofmonth("ts").cast("int").alias("d"),
        F.col("ts").cast("date").alias("day"),
    )
    feat = (
        e.where(F.col("d") < _CHURN_CUTOFF_DAY)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events_obs"),
            F.count_distinct("day").alias("active_days_obs"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "n_purchase_obs"
            ),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "n_error_obs"
            ),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum_obs"),
            F.max("d").alias("last_obs_day"),
        )
    )
    lab = (
        e.where(F.col("d") >= _CHURN_CUTOFF_DAY)
        .select("user_id")
        .distinct()
        .withColumn("__active", F.lit(1))
    )
    return feat.join(F.broadcast(lab), "user_id", "left").select(
        "user_id",
        "n_events_obs",
        "active_days_obs",
        "n_purchase_obs",
        "n_error_obs",
        "value_sum_obs",
        "last_obs_day",
        (F.lit(_CHURN_CUTOFF_DAY - 1) - F.col("last_obs_day"))
        .cast("int")
        .alias("recency_days"),
        F.col("__active").isNull().cast("int").alias("churned"),
    )


_TRIM_PCT = 5  # percent trimmed from EACH tail

_SQL_TRIMMED = f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
           ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
kept AS (
  SELECT event_type, value, n FROM r
  WHERE rn > (n * {_TRIM_PCT}) // 100 AND rn <= n - (n * {_TRIM_PCT}) // 100
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_total,
       CAST(count(*) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS trimmed_mean
FROM kept GROUP BY event_type
"""


@register("trimmed_mean_value", oracle=_SQL_TRIMMED)
def trimmed_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust aggregation: the {_TRIM_PCT}%-per-tail trimmed mean of
    event value per type — the outlier-resistant center a telemetry
    summary should report when single corrupted readings would drag a
    plain AVG (the estimator between mean and median). Rank-based
    trim over a total order (value, event_id), so the kept set is
    identical in both engines; the kept values round to 6 decimals
    and sum in exact DECIMAL, making the mean order-independent.
    Scale shape: one per-type window rank + one keyed aggregate —
    same cost class as any percentile."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    w_n = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    cut = F.expr(f"(n * {_TRIM_PCT}) div 100")
    kept = r.where((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
    return kept.groupBy("event_type").agg(
        F.max("n").alias("n_total"),
        F.count("*").alias("n_kept"),
        F.round(
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("trimmed_mean"),
    )


_LNS_DRAWS = 5


def _lns_oracle() -> str:
    knn_sql = REGISTRY["knn_self_join"].oracle
    return f"""
WITH knn AS ({knn_sql}),
e AS (SELECT src_id AS a, nbr_id AS b FROM knn),
und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
nodes AS (SELECT vec_id FROM embeddings),
n_(n) AS (SELECT CAST(count(*) AS BIGINT) FROM nodes),
cand AS (
  SELECT nd.vec_id AS src_id, j.j AS draw,
         CAST(('0x' || substr(md5('neg' || CAST(j.j AS VARCHAR) || ':'
                || CAST(nd.vec_id AS VARCHAR)), 1, 15))::BIGINT % n_.n
           AS BIGINT) AS neg_id
  FROM nodes nd
  CROSS JOIN (SELECT unnest(range(1, {_LNS_DRAWS + 1})) AS j) j
  CROSS JOIN n_
),
valid AS (
  SELECT c.src_id, c.neg_id, CAST(c.draw AS INT) AS draw
  FROM cand c
  JOIN nodes v ON v.vec_id = c.neg_id
  WHERE c.neg_id <> c.src_id
)
SELECT v.src_id, v.neg_id, v.draw
FROM valid v
LEFT JOIN und u ON u.a = v.src_id AND u.b = v.neg_id
WHERE u.a IS NULL
"""


@register("link_negative_samples", oracle=_lns_oracle)
def link_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for link prediction over the kNN graph: per
    node, {_LNS_DRAWS} seeded md5-uniform partner draws, kept only if
    the pair is NOT an edge in either direction — the (node, non-
    neighbor) pairs a graph-ML trainer consumes alongside the positive
    edges (hard_negative_mining's counterpart in graph space; here
    negatives are uniform because kNN non-edges carry no ranking).
    Draws that collide with self or a real edge drop out
    deterministically, so corpus-level negative rates stay auditable.
    Scale shape: candidate generation is map-only hashing; validity
    and edge checks are two joins against the node list and the
    (bounded, 2k-per-node) edge set. Integer-exact throughout."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = knn_self_join(spark, sf_dir)
    e = knn.select(F.col("src_id").alias("a"), F.col("nbr_id").alias("b"))
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    nodes = emb.select("vec_id")
    n = nodes.count()
    draws = F.explode(
        F.array(*[F.lit(j) for j in range(1, _LNS_DRAWS + 1)])
    ).alias("draw")
    cand = nodes.select(F.col("vec_id").alias("src_id"), draws).select(
        "src_id",
        "draw",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("neg"),
                            F.col("draw").cast("string"),
                            F.lit(":"),
                            F.col("src_id").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("neg_id"),
    )
    valid = (
        cand.where(F.col("neg_id") != F.col("src_id"))
        .join(
            F.broadcast(nodes.select(F.col("vec_id").alias("neg_id"))),
            "neg_id",
            "left_semi",
        )
    )
    return (
        valid.join(
            und,
            (und["a"] == valid["src_id"]) & (und["b"] == valid["neg_id"]),
            "left_anti",
        )
        .select("src_id", "neg_id", F.col("draw").cast("int").alias("draw"))
    )


_SQL_VOCAB_JS = f"""
WITH ta AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
ca AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ta GROUP BY w),
tb AS (
  SELECT unnest(list_filter(string_split(
           CASE WHEN doc_id % {_UPSERT_MOD} = 0 THEN text || ' [v2]'
                ELSE text END, ' '), x -> x <> '')) AS w
  FROM documents
),
cb AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tb GROUP BY w),
na AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ca),
nb AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cb),
u AS (
  SELECT coalesce(a.w, b.w) AS w,
         coalesce(a.c, 0) AS ka, coalesce(b.c, 0) AS kb
  FROM ca a FULL OUTER JOIN cb b ON b.w = a.w
),
terms AS (
  SELECT w, ka, kb,
         CAST(ka AS DOUBLE) / na.n AS p,
         CAST(kb AS DOUBLE) / nb.n AS q
  FROM u CROSS JOIN na CROSS JOIN nb
),
contrib AS (
  SELECT ka, kb,
         CASE WHEN p > 0
              THEN 0.5 * p * round(log2(p / (0.5 * (p + q))), 6) ELSE 0.0 END
       + CASE WHEN q > 0
              THEN 0.5 * q * round(log2(q / (0.5 * (p + q))), 6) ELSE 0.0 END AS c
  FROM terms
)
SELECT CAST(sum(CASE WHEN ka > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_a,
       CAST(sum(CASE WHEN kb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_b,
       CAST(sum(CASE WHEN ka = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new_terms,
       CAST(sum(CASE WHEN kb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_terms,
       round(list_aggregate(list(c ORDER BY c), 'sum'), 6) AS js_divergence
FROM contrib
"""


@register("vocab_drift_js", oracle=_SQL_VOCAB_JS)
def vocab_drift_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release vocabulary drift: Jensen-Shannon divergence
    (bits) between the term distributions of the standing corpus and
    its upserted successor (corpus_upsert's batch), plus vocab
    added/dropped counts — the language-level companion of
    corpus_snapshot_diff's row-level delta and value_drift_ks's
    numeric drift (JS is symmetric, bounded [0,1], and defined even
    where one side has zero mass — why monitoring prefers it to KL).
    Scale shape: two token counts (map-side combined), one vocab-keyed
    full-outer join, a value-ordered fold over per-term contributions.
    Probabilities are exact-integer ratios; log2 terms carry the
    round-6 libm contract inside the fold."""
    docs = load_table(spark, sf_dir, "documents")
    ta = docs.select(F.explode(tx.tokens_expr("text")).alias("w"))
    text_b = F.when(
        F.col("doc_id") % _UPSERT_MOD == 0, F.concat("text", F.lit(" [v2]"))
    ).otherwise(F.col("text"))
    tb = docs.select(F.explode(tx.tokens_expr(text_b)).alias("w"))
    ca = ta.groupBy("w").agg(F.count("*").alias("ka"))
    cb = tb.groupBy("w").agg(F.count("*").alias("kb"))
    na = ca.agg(F.sum("ka")).collect()[0][0]
    nb = cb.agg(F.sum("kb")).collect()[0][0]
    u = ca.join(cb, "w", "full_outer").select(
        F.coalesce("ka", F.lit(0)).alias("ka"),
        F.coalesce("kb", F.lit(0)).alias("kb"),
    )
    p = F.col("ka").cast("double") / F.lit(int(na))
    q = F.col("kb").cast("double") / F.lit(int(nb))
    m = F.lit(0.5) * (p + q)
    c = F.when(p > 0, F.lit(0.5) * p * F.round(F.log2(p / m), 6)).otherwise(
        F.lit(0.0)
    ) + F.when(q > 0, F.lit(0.5) * q * F.round(F.log2(q / m), 6)).otherwise(
        F.lit(0.0)
    )
    contrib = u.select("ka", "kb", c.alias("c"))
    return contrib.agg(
        F.sum((F.col("ka") > 0).cast("long")).alias("n_terms_a"),
        F.sum((F.col("kb") > 0).cast("long")).alias("n_terms_b"),
        F.sum((F.col("ka") == 0).cast("long")).alias("n_new_terms"),
        F.sum((F.col("kb") == 0).cast("long")).alias("n_dropped_terms"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("c")), F.lit(0.0), lambda s, x: s + x
            ),
            6,
        ).alias("js_divergence"),
    )


_SQL_PCHART = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS errs
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(errs) AS BIGINT) AS te FROM d
)
SELECT d.day, d.n, d.errs,
       round(CAST(d.errs AS DOUBLE) / d.n, 6) AS p_day,
       round(CAST(tot.te AS DOUBLE) / tot.tn, 6) AS p_bar,
       round(CAST(tot.te AS DOUBLE) / tot.tn
             + 3.0 * sqrt((CAST(tot.te AS DOUBLE) / tot.tn)
                          * (1.0 - CAST(tot.te AS DOUBLE) / tot.tn) / d.n),
             6) AS ucl,
       round(greatest(0.0,
             CAST(tot.te AS DOUBLE) / tot.tn
             - 3.0 * sqrt((CAST(tot.te AS DOUBLE) / tot.tn)
                          * (1.0 - CAST(tot.te AS DOUBLE) / tot.tn) / d.n)),
             6) AS lcl,
       CAST(CASE WHEN CAST(d.errs AS DOUBLE) / d.n >
                      CAST(tot.te AS DOUBLE) / tot.tn
                      + 3.0 * sqrt((CAST(tot.te AS DOUBLE) / tot.tn)
                                   * (1.0 - CAST(tot.te AS DOUBLE) / tot.tn)
                                   / d.n)
                 OR CAST(d.errs AS DOUBLE) / d.n <
                      CAST(tot.te AS DOUBLE) / tot.tn
                      - 3.0 * sqrt((CAST(tot.te AS DOUBLE) / tot.tn)
                                   * (1.0 - CAST(tot.te AS DOUBLE) / tot.tn)
                                   / d.n)
            THEN 1 ELSE 0 END AS INT) AS out_of_control
FROM d CROSS JOIN tot
"""


@register("error_rate_control_chart", oracle=_SQL_PCHART)
def error_rate_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control (the p-chart): each day's error
    RATE against 3-sigma binomial control limits around the monthly
    center line — the SPC discipline that separates common-cause
    noise from a day that genuinely broke (z-score flags extreme
    EVENTS; this flags abnormal DAYS with per-day limits that widen
    when the day had less traffic). Scale shape: one day-grain
    conditional aggregate + a 2-value broadcast total; all inputs
    integer-exact, sqrt is correctly-rounded IEEE on identical
    doubles, outputs carry round-6 (the flag compares UNROUNDED
    values identically in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            (F.col("event_type") == "error").cast("long").alias("is_err"),
        )
        .groupBy("day")
        .agg(F.count("*").alias("n"), F.sum("is_err").alias("errs"))
    )
    tot = d.agg(F.sum("n").alias("tn"), F.sum("errs").alias("te")).collect()[0]
    pbar = F.lit(float(tot["te"])) / F.lit(float(tot["tn"]))
    sig = F.sqrt(pbar * (F.lit(1.0) - pbar) / F.col("n"))
    p_day = F.col("errs").cast("double") / F.col("n")
    ucl = pbar + F.lit(3.0) * sig
    lcl = pbar - F.lit(3.0) * sig
    return d.select(
        "day",
        "n",
        "errs",
        F.round(p_day, 6).alias("p_day"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(ucl, 6).alias("ucl"),
        F.round(F.greatest(F.lit(0.0), lcl), 6).alias("lcl"),
        ((p_day > ucl) | (p_day < lcl)).cast("int").alias("out_of_control"),
    )


_SQL_RFM = """
WITH base AS (
  SELECT o_custkey,
         CAST(max(o_orderdate) AS DATE) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, last_order, frequency,
         CAST(monetary AS DOUBLE) AS monetary,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS r,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m
  FROM base
)
SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
       CAST(r * 100 + f * 10 + m AS INT) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
FROM scored
GROUP BY r, f, m
"""


@register("customer_rfm_segments", oracle=_SQL_RFM)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation, the classic CRM partitioning: every customer
    quartile-coded on Recency (latest order), Frequency (order count)
    and Monetary (exact decimal spend), rolled up to segment sizes and
    revenue — champions are 111, at-risk whales 411, etc. Each ntile
    orders on a TOTAL order (metric + custkey tie-break), so quartile
    assignment is deterministic in both engines; the decimal monetary
    passes through a double once for the ntile ordering (exact — same
    value both engines) and stays exact decimal in the revenue sum.
    Scale shape: one keyed aggregate, then each quartile code comes
    from a TWO-PHASE global rank (operators/globalrank.py) plus the
    closed-form ntile bucket formula — three range-partitioned ranks
    joined back on the customer key instead of three one-task
    unpartitioned ntile windows (|customers| is 10^8-10^9 at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    cnt = base.agg(F.count("*").cast("long").alias("n_cust"))
    orders_by = {
        "rn_r": [F.col("last_order").desc(), F.col("o_custkey").asc()],
        "rn_f": [F.col("frequency").desc(), F.col("o_custkey").asc()],
        "rn_m": [
            F.col("monetary").cast("double").desc(),
            F.col("o_custkey").asc(),
        ],
    }
    scored = base.select(
        "o_custkey", F.col("monetary").cast("double").alias("monetary")
    )
    for rn_name, ob in orders_by.items():
        rk = grank.two_phase_rank(base, ob, rn_name=rn_name).select(
            "o_custkey", rn_name
        )
        scored = scored.join(rk, "o_custkey")
    n = F.col("n_cust")
    scored = scored.crossJoin(F.broadcast(cnt)).select(
        "o_custkey",
        "monetary",
        grank.ntile_from_rank(F.col("rn_r"), n, 4).alias("r"),
        grank.ntile_from_rank(F.col("rn_f"), n, 4).alias("f"),
        grank.ntile_from_rank(F.col("rn_m"), n, 4).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(18,2)"))
            .cast("double")
            .alias("segment_revenue"),
        )
        .select(
            F.col("r").cast("int").alias("r"),
            F.col("f").cast("int").alias("f"),
            F.col("m").cast("int").alias("m"),
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
            .cast("int")
            .alias("segment"),
            "n_customers",
            "segment_revenue",
        )
    )


_SQL_BUDGET_CLAMP = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN round(value, 6)
              WHEN event_type = 'error' THEN -round(value, 6)
              ELSE 0.0 END AS delta
  FROM events
),
seq AS (
  SELECT user_id,
         list([delta, 0.0, 0.0] ORDER BY ts, event_id) AS items,
         CAST(count(*) AS BIGINT) AS n_events
  FROM d GROUP BY user_id
),
folded AS (
  SELECT user_id, n_events,
         list_reduce(
           list_prepend([0.0, 0.0, 0.0], items),
           (a, x) -> [
             greatest(0.0, a[1] + x[1]),
             a[2] + CASE WHEN a[1] + x[1] < 0.0 THEN -(a[1] + x[1]) ELSE 0.0 END,
             a[3] + CASE WHEN a[1] + x[1] < 0.0 THEN 1.0 ELSE 0.0 END
           ]) AS st
  FROM seq
)
SELECT user_id, n_events,
       round(st[1], 6) AS final_balance,
       round(st[2], 6) AS total_forfeited,
       CAST(st[3] AS BIGINT) AS n_clamps
FROM folded
"""


@register("user_budget_clamp", oracle=_SQL_BUDGET_CLAMP)
def user_budget_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running ledger — the NONLINEAR sequential aggregate no
    window sum can express: per user, a chronological credit balance
    where purchases add value, errors subtract it, and the balance
    floors at zero (overdraft forfeited, as in prepaid quotas, rate
    limiters, inventory that can't go negative). Because clamping
    makes every step depend on the clamped previous state, the only
    faithful shapes are a stateful pass (streaming:
    applyInPandasWithState) or, in batch, this per-key ordered fold —
    state bounded per user, zero Python. Emits final balance, total
    forfeited, and clamp count from one 3-slot fold state.
    Determinism: deltas round to 6 first; the fold order is the total
    (ts, event_id) order; greatest/+ are exact IEEE on identical
    doubles."""
    ev = load_table(spark, sf_dir, "events")
    delta = (
        F.when(F.col("event_type") == "purchase", F.round("value", 6))
        .when(F.col("event_type") == "error", -F.round("value", 6))
        .otherwise(F.lit(0.0))
    )
    d = ev.select("user_id", "ts", "event_id", delta.alias("delta"))
    items = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "delta"))),
        lambda s: s["delta"],
    )
    st = F.aggregate(
        items,
        F.struct(
            F.lit(0.0).alias("bal"),
            F.lit(0.0).alias("forf"),
            F.lit(0.0).alias("clamps"),
        ),
        lambda a, x: F.struct(
            F.greatest(F.lit(0.0), a["bal"] + x).alias("bal"),
            (
                a["forf"]
                + F.when(a["bal"] + x < 0.0, -(a["bal"] + x)).otherwise(F.lit(0.0))
            ).alias("forf"),
            (
                a["clamps"]
                + F.when(a["bal"] + x < 0.0, F.lit(1.0)).otherwise(F.lit(0.0))
            ).alias("clamps"),
        ),
    )
    g = d.groupBy("user_id").agg(
        F.count("*").alias("n_events"), st.alias("st")
    )
    return g.select(
        "user_id",
        "n_events",
        F.round(F.col("st.bal"), 6).alias("final_balance"),
        F.round(F.col("st.forf"), 6).alias("total_forfeited"),
        F.col("st.clamps").cast("long").alias("n_clamps"),
    )


_BENFORD_PROBS = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}

_SQL_BENFORD = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INT) AS d1
  FROM orders WHERE o_totalprice > 0
),
obs AS (SELECT d1, CAST(count(*) AS BIGINT) AS c FROM digits GROUP BY d1),
exp_(d1, p) AS (VALUES
    {", ".join(f"({d}, CAST({p!r} AS DOUBLE))" for d, p in _BENFORD_PROBS.items())}),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM obs)
SELECT e.d1 AS first_digit,
       coalesce(o.c, 0) AS observed,
       round(e.p * tot.n, 6) AS expected,
       round(CAST(coalesce(o.c, 0) AS DOUBLE) / tot.n, 6) AS observed_share,
       round(e.p, 6) AS benford_share,
       round((coalesce(o.c, 0) - e.p * tot.n)
             * (coalesce(o.c, 0) - e.p * tot.n) / (e.p * tot.n), 6) AS chi2_term
FROM exp_ e LEFT JOIN obs o ON o.d1 = e.d1 CROSS JOIN tot
"""


@register("benford_price_audit", oracle=_SQL_BENFORD)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-forensics audit: first significant digit of order totals
    against Benford's law, with per-digit chi-square terms — the
    fabricated-data / broken-generator detector finance and fraud
    teams run (naturally-growing magnitudes follow log10(1+1/d);
    uniform synthetic generators — like this fixture's — visibly do
    NOT, which the table shows honestly). Digit extraction goes
    through the exact DECIMAL(18,2) string, never float formatting;
    the Benford probabilities are shared Python-double literals in
    both engines; counts are exact and every derived column carries
    round-6. One conditional aggregate over the scan."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d1")
    )
    obs = digits.groupBy("d1").agg(F.count("*").alias("c"))
    n = digits.count()
    exp_rows = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PROBS.items()], "d1 int, p double"
    )
    j = F.broadcast(exp_rows).join(obs, "d1", "left").select(
        F.col("d1").alias("first_digit"),
        F.coalesce("c", F.lit(0)).alias("observed"),
        "p",
    )
    exp_n = F.col("p") * F.lit(int(n))
    return j.select(
        "first_digit",
        "observed",
        F.round(exp_n, 6).alias("expected"),
        F.round(F.col("observed").cast("double") / F.lit(int(n)), 6).alias(
            "observed_share"
        ),
        F.round("p", 6).alias("benford_share"),
        F.round(
            (F.col("observed") - exp_n) * (F.col("observed") - exp_n) / exp_n, 6
        ).alias("chi2_term"),
    )


_SQL_AB_TEST = f"""
WITH assign AS (
  SELECT user_id,
         CASE WHEN ('0x' || substr(md5('ab{SEED}:' || CAST(user_id AS VARCHAR)),
                    1, 7))::BIGINT % 2 = 0 THEN 'A' ELSE 'B' END AS arm
  FROM (SELECT DISTINCT user_id FROM events) u
),
conv AS (
  SELECT user_id, 1 AS converted FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
  HAVING count(*) >= 15
),
arms AS (
  SELECT a.arm,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN c.converted IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_converted
  FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
  GROUP BY a.arm
),
w AS (
  SELECT max(CASE WHEN arm = 'A' THEN n_users END) AS na,
         max(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
         max(CASE WHEN arm = 'B' THEN n_users END) AS nb,
         max(CASE WHEN arm = 'B' THEN n_converted END) AS cb
  FROM arms
)
SELECT na AS n_a, ca AS conv_a, nb AS n_b, cb AS conv_b,
       round(CAST(ca AS DOUBLE) / na, 6) AS rate_a,
       round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b,
       round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
             / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 6) AS z_stat,
       CAST(CASE WHEN abs((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                 / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                        * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                        * (1.0 / na + 1.0 / nb))) > 1.959963984540054
            THEN 1 ELSE 0 END AS INT) AS significant_5pct
FROM w
"""


@register("ab_test_conversion", oracle=_SQL_AB_TEST)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analysis: users deterministically bucketed into
    A/B arms by seeded md5 parity (the hash-based assignment real
    experiment platforms use — stable, uniform, no coordination),
    heavy-buyer (>= 15 purchases) conversion rates compared with the
    pooled two-proportion
    z-test and a 5% two-sided significance flag. On this fixture the
    arms are exchangeable, so the honest expected readout is
    NON-significant — the A/A-test sanity every platform runs first.
    Scale shape: assignment is map-only hashing; conversion is one
    distinct-user aggregate; the test reduces to four integers.
    1.96… is the shared z-critical literal; sqrt/divisions are IEEE
    on exact-integer-derived doubles with round-6 on outputs (the
    flag compares unrounded, identically in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"ab{SEED}:"), F.col("user_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assign = users.select("user_id", arm.alias("arm"))
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("__np"))
        .where(F.col("__np") >= 15)
        .select("user_id")
        .withColumn("__c", F.lit(1))
    )
    arms = (
        assign.join(F.broadcast(conv), "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("__c").isNotNull().cast("long")).alias("n_converted"),
        )
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    pp = (F.col("ca") + F.col("cb")).cast("double") / (F.col("na") + F.col("nb"))
    z = (ra - rb) / F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
    )
    return w.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > F.lit(1.959963984540054)).cast("int").alias(
            "significant_5pct"
        ),
    )


_SQL_KM_SURVIVAL = """
WITH first_purchase AS (
  SELECT user_id, CAST(min(EXTRACT(day FROM ts)) AS INT) AS event_day
  FROM events
  WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 7
  GROUP BY user_id
),
users AS (SELECT DISTINCT user_id FROM events),
subj AS (
  SELECT u.user_id, coalesce(fp.event_day, 8) AS t,
         CASE WHEN fp.user_id IS NULL THEN 0 ELSE 1 END AS observed
  FROM users u LEFT JOIN first_purchase fp ON fp.user_id = u.user_id
),
n_(n) AS (SELECT CAST(count(*) AS BIGINT) FROM subj),
dd AS (
  SELECT t AS day, CAST(sum(observed) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS leaving
  FROM subj GROUP BY t
),
curve AS (
  SELECT day, d,
         n_.n - coalesce(sum(leaving) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
  FROM dd CROSS JOIN n_
),
factors AS (
  SELECT day, d, CAST(at_risk AS BIGINT) AS at_risk,
         1.0 - CAST(d AS DOUBLE) / at_risk AS f
  FROM curve
)
SELECT a.day, a.at_risk, a.d AS n_events,
       round(list_aggregate(list(ln(b.f) ORDER BY b.day), 'sum'), 6)
         AS log_survival
FROM factors a JOIN factors b ON b.day <= a.day
WHERE a.day <= 7
GROUP BY a.day, a.at_risk, a.d
"""


@register("km_survival_curve", oracle=_SQL_KM_SURVIVAL)
def km_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis (Kaplan-Meier): per day, the risk set, the
    users whose FIRST purchase falls that day, and the log survival
    function log S(t) = Σ ln(1 - d_t / n_t) — time-to-conversion with
    RIGHT-CENSORING done correctly (users with no week-1 purchase are
    censored at day 8 instead of polluting the rates), which is
    what separates this from a naive daily conversion share. Working
    in log space makes the KM product a running SUM of per-day
    factors — the ordered-prefix fold both engines replay identically
    (ln carries the round-6 contract on the final sum). Scale shape:
    one first-event aggregate, a 31-row day table, prefix windows over
    it."""
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.where(
            (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 7)
        )
        .groupBy("user_id")
        .agg(F.min(F.dayofmonth("ts")).cast("int").alias("event_day"))
    )
    users = ev.select("user_id").distinct()
    subj = users.join(F.broadcast(fp), "user_id", "left").select(
        F.coalesce("event_day", F.lit(8)).alias("t"),
        F.col("event_day").isNotNull().cast("long").alias("observed"),
    )
    n = subj.count()
    dd = subj.groupBy("t").agg(
        F.sum("observed").alias("d"), F.count("*").alias("leaving")
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = dd.select(
        F.col("t").alias("day"),
        "d",
        (F.lit(int(n)) - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)))
        .cast("long")
        .alias("at_risk"),
    )
    f = F.lit(1.0) - F.col("d").cast("double") / F.col("at_risk")
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    lnf = F.ln(f)
    out = curve.select(
        "day",
        "at_risk",
        F.col("d").alias("n_events"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("day", lnf.alias("lf"))).over(w_cum)
                ),
                F.lit(0.0),
                lambda a, x: a + x["lf"],
            ),
            6,
        ).alias("log_survival"),
    )
    return out.where(F.col("day") <= 7)


_SQL_LTV = """
WITH firsts AS (
  SELECT o_custkey,
         CAST(min(EXTRACT(year FROM o_orderdate)) AS INT) AS cohort
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT f.cohort,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INT) - f.cohort AS age,
         o.o_custkey,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
),
cell AS (
  SELECT cohort, age,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(rev) AS revenue
  FROM j GROUP BY cohort, age
),
sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM firsts GROUP BY cohort)
SELECT c.cohort, CAST(c.age AS INT) AS age, sz.cohort_size,
       c.active_customers, c.n_orders,
       CAST(c.revenue AS DOUBLE) AS revenue,
       CAST(sum(c.revenue) OVER (PARTITION BY c.cohort ORDER BY c.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_revenue,
       round(CAST(c.active_customers AS DOUBLE) / sz.cohort_size, 6)
         AS retention
FROM cell c JOIN sz ON sz.cohort = c.cohort
"""


@register("customer_ltv_cohorts", oracle=_SQL_LTV)
def customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohorted by
    first-order YEAR, each (cohort, age) cell carrying active
    customers, orders, exact decimal revenue, the cohort's cumulative
    LTV-to-date, and retention vs cohort size — the revenue-side
    companion of user_retention_cohorts (which counts event activity)
    and the table a finance model reads payback periods from. The
    cumulative sum runs over EXACT DECIMAL inside the window (order-
    independent), cast to double only on output, so cross-engine
    equality holds regardless of accumulation grouping. Scale shape:
    one first-order aggregate, a customer-keyed join back, a
    years x years cell aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("int")
    firsts = orders.groupBy("o_custkey").agg(F.min(yr).alias("cohort"))
    j = orders.join(F.broadcast(firsts), "o_custkey").select(
        "cohort",
        (yr - F.col("cohort")).alias("age"),
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    cell = j.groupBy("cohort", "age").agg(
        F.count_distinct("o_custkey").alias("active_customers"),
        F.count("*").alias("n_orders"),
        F.sum("rev").alias("revenue"),
    )
    sz = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(F.broadcast(sz), "cohort")
        .select(
            "cohort",
            F.col("age").cast("int").alias("age"),
            "cohort_size",
            "active_customers",
            "n_orders",
            F.col("revenue").cast("double").alias("revenue"),
            F.sum("revenue").over(w_cum).cast("double").alias("cum_revenue"),
            F.round(
                F.col("active_customers").cast("double") / F.col("cohort_size"),
                6,
            ).alias("retention"),
        )
    )


_SQL_LASPEYRES = """
WITH py AS (
  SELECT l_partkey AS part,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS q,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
  FROM lineitem GROUP BY 1, 2
),
pairs AS (
  SELECT b.yr,
         a.part,
         CAST(b.r AS DOUBLE) / CAST(b.q AS DOUBLE) * CAST(a.q AS DOUBLE) AS num_i,
         a.r AS den_i
  FROM py a JOIN py b ON b.part = a.part AND b.yr = a.yr + 1
)
SELECT yr AS year,
       CAST(count(*) AS BIGINT) AS n_common_parts,
       round(list_aggregate(list(num_i ORDER BY num_i), 'sum')
             / CAST(sum(den_i) AS DOUBLE), 6) AS laspeyres_index
FROM pairs GROUP BY yr
"""


@register("price_index_laspeyres", oracle=_SQL_LASPEYRES)
def price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic index numbers: the year-over-year Laspeyres price
    index over lineitem (base-year quantity weights: sum p1*q0 /
    sum p0*q0 across parts sold in both years) — how a business
    answers "did prices rise, holding last year's basket fixed", and
    in the corpus world, how token-cost-per-document drift would be
    indexed across releases. The denominator collapses algebraically
    to last year's EXACT decimal revenue (p0*q0 = r0 — no float ever
    enters it); only the numerator's per-part reweights are doubles,
    folded in value order. Scale shape: one (part, year) aggregate,
    a part-keyed self-join of adjacent years, a per-year fold."""
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.year("l_shipdate").cast("int").alias("yr"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r"),
    )
    a = py.select(
        F.col("part").alias("part0"),
        F.col("yr").alias("yr0"),
        F.col("q").alias("q0"),
        F.col("r").alias("r0"),
    )
    b = py.select(
        F.col("part").alias("part1"),
        F.col("yr").alias("yr1"),
        F.col("q").alias("q1"),
        F.col("r").alias("r1"),
    )
    pairs = a.join(
        b, (F.col("part1") == F.col("part0")) & (F.col("yr1") == F.col("yr0") + 1)
    ).select(
        F.col("yr1").alias("yr"),
        (
            F.col("r1").cast("double") / F.col("q1").cast("double")
            * F.col("q0").cast("double")
        ).alias("num_i"),
        F.col("r0").alias("den_i"),
    )
    return pairs.groupBy("yr").agg(
        F.count("*").alias("n_common_parts"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("num_i")),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            / F.sum("den_i").cast("double"),
            6,
        ).alias("laspeyres_index"),
    ).select(
        F.col("yr").alias("year"), "n_common_parts", "laspeyres_index"
    )


_SQL_LOCF = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         round(avg(value), 6) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
users AS (SELECT DISTINCT user_id FROM events),
cal AS (
  SELECT u.user_id, CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM users u CROSS JOIN bounds b
),
j AS (
  SELECT c.user_id, c.day, d.v
  FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
),
filled AS (
  SELECT user_id, day, v,
         max(CASE WHEN v IS NOT NULL THEN {'d': day, 'val': v} END)
           OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
  FROM j
)
SELECT user_id, day,
       carry.val AS value_filled,
       CAST(CASE WHEN v IS NULL AND carry.val IS NOT NULL THEN 1 ELSE 0 END
            AS INT) AS imputed
FROM filled
"""


@register("locf_imputation", oracle=_SQL_LOCF)
def locf_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series imputation: every (user, calendar day) cell filled
    by last-observation-carried-forward — the standard panel-data
    densification before models that cannot take missing values
    (events_gapfill fills the TIME AXIS with explicit nulls; this
    fills the VALUES). The carry is the struct-max trick — max over
    the preceding frame of (day, value) structs, built only for
    observed days — which both engines order lexicographically, so no
    IGNORE NULLS dialect dependence exists; leading missing days stay
    null honestly. Scale shape: the calendar densification is a
    map-side date-sequence explode per user (users x days rows, the
    gapfill contract), then one user-partitioned window. Daily means
    round to 6 first, so every carried value is engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    ).collect()[0]
    users = ev.select("user_id").distinct()
    cal = users.select(
        "user_id",
        F.explode(F.sequence(F.lit(b["d0"]), F.lit(b["d1"]))).alias("day"),
    )
    j = cal.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = F.max(
        F.when(
            F.col("v").isNotNull(),
            F.struct(F.col("day").alias("d"), F.col("v").alias("val")),
        )
    ).over(w)
    return j.select(
        "user_id",
        "day",
        carry["val"].alias("value_filled"),
        (F.col("v").isNull() & carry["val"].isNotNull())
        .cast("int")
        .alias("imputed"),
    )


_PATH_N = 3
_PATH_TOP = 15

_SQL_EVENT_PATHS = f"""
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
),
grams AS (
  SELECT substr(seq, CAST(i AS INT), {_PATH_N}) AS path
  FROM s, LATERAL (SELECT unnest(range(1, length(seq) - {_PATH_N - 2})) AS i) t
  WHERE length(seq) >= {_PATH_N}
),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY path),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
SELECT c.path, c.n,
       round(CAST(c.n AS DOUBLE) / tot.t, 6) AS share,
       CAST(row_number() OVER (ORDER BY c.n DESC, c.path ASC) AS INT) AS path_rank
FROM c CROSS JOIN tot
QUALIFY path_rank <= {_PATH_TOP}
"""


@register("event_top_paths", oracle=_SQL_EVENT_PATHS)
def event_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the {_PATH_TOP} most common {_PATH_N}-event
    behavioral paths across all user journeys (sliding window over
    each user's event-initial sequence) — the "what do users actually
    do" report between event_pattern_match's fixed patterns and
    event_markov_transitions' one-step probabilities (a 3-gram is the
    empirical check of the Markov assumption: paths over-represented
    vs the chain product are memory effects). Scale shape: sequences
    build in one user-keyed ordered aggregate; the sliding window is
    a native per-row explode of bounded fan-out; counting is
    map-side combined. Integer counts, one round-6 share, rank on
    (count, path)."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.substring("event_type", 1, 1).alias("ini"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "ini"))
                    ),
                    lambda x: x["ini"],
                ),
                "",
            ).alias("seq")
        )
    )
    grams = (
        s.where(F.length("seq") >= _PATH_N)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(seq) - {_PATH_N - 1}),"
                    f" i -> substring(seq, i, {_PATH_N}))"
                )
            ).alias("path")
        )
    )
    c = grams.groupBy("path").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n")).collect()[0][0]
    w = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        c.withColumn("share", F.round(F.col("n").cast("double") / F.lit(int(t)), 6))
        .withColumn("path_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("path_rank") <= _PATH_TOP)
        .select("path", "n", "share", "path_rank")
    )


_ATTR_WINDOW_US = 24 * 3600 * 1000000  # 24h lookback

_SQL_ATTRIBUTION = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
),
purchases AS (
  SELECT user_id, event_id AS p_id, t AS pt FROM e WHERE event_type = 'purchase'
),
touch AS (
  SELECT p.p_id, tch.event_type, tch.t, tch.event_id
  FROM purchases p
  JOIN e tch ON tch.user_id = p.user_id
            AND tch.t >= p.pt - {_ATTR_WINDOW_US} AND tch.t < p.pt
            AND tch.event_type IN ('view', 'click')
),
pick AS (
  SELECT p_id,
         min({{'t': t, 'e': event_id, 'ty': event_type}}).ty AS first_touch,
         max({{'t': t, 'e': event_id, 'ty': event_type}}).ty AS last_touch
  FROM touch GROUP BY p_id
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pick)
SELECT m.model, m.channel, m.n_conversions,
       round(CAST(m.n_conversions AS DOUBLE) / tot.n, 6) AS share
FROM (
  SELECT 'first_touch' AS model, first_touch AS channel,
         CAST(count(*) AS BIGINT) AS n_conversions
  FROM pick GROUP BY first_touch
  UNION ALL
  SELECT 'last_touch', last_touch, CAST(count(*) AS BIGINT)
  FROM pick GROUP BY last_touch
) m CROSS JOIN tot
"""


@register("attribution_model_compare", oracle=_SQL_ATTRIBUTION)
def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution, two models side by side: each purchase
    credited to the FIRST vs the LAST view/click touch in its 24-hour
    lookback, per-channel conversion counts and shares — the
    model-sensitivity table that decides budget shifts (big
    first-vs-last deltas mean the journey has distinct opener and
    closer channels). The touch pick is the struct-min/max trick over
    (time, event_id, type) — a total order, no IGNORE NULLS or
    argmax-tie dialect risk. Scale shape: the purchase x touch join is
    user-keyed with a bounded time predicate (the interval-join
    contract of stream_click_attribution); each purchase then reduces
    map-side to two structs. Integer-exact + one round-6 share."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = ev.select("user_id", "event_id", "event_type", ts_us.alias("t"))
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("t").alias("pt")
    )
    tch = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_eid"),
        F.col("event_type").alias("t_type"),
        F.col("t").alias("tt"),
    )
    touch = purchases.join(
        tch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("tt") >= F.col("pt") - _ATTR_WINDOW_US)
        & (F.col("tt") < F.col("pt")),
    )
    s = F.struct(
        F.col("tt").alias("t"), F.col("t_eid").alias("e"), F.col("t_type").alias("ty")
    )
    pick = touch.groupBy("p_id").agg(
        F.min(s)["ty"].alias("first_touch"),
        F.max(s)["ty"].alias("last_touch"),
    )
    n = pick.count()
    first = pick.groupBy("first_touch").agg(F.count("*").alias("n_conversions"))
    last = pick.groupBy("last_touch").agg(F.count("*").alias("n_conversions"))
    out = first.select(
        F.lit("first_touch").alias("model"),
        F.col("first_touch").alias("channel"),
        "n_conversions",
    ).unionByName(
        last.select(
            F.lit("last_touch").alias("model"),
            F.col("last_touch").alias("channel"),
            "n_conversions",
        )
    )
    return out.select(
        "model",
        "channel",
        "n_conversions",
        F.round(F.col("n_conversions").cast("double") / F.lit(int(n)), 6).alias(
            "share"
        ),
    )


def _bm25_explain_oracle() -> str:
    from nano_vectordb_spark.operators.lexical import B, K1

    vocab = sorted({t for _, terms in _BM25_QUERIES for t in terms})
    vlist = ", ".join(f"'{t}'" for t in vocab)
    qvals = ",\n    ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         list_filter(toks, x -> list_contains([{vlist}], x)) AS qtoks
  FROM t
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d
),
posting AS (SELECT doc_id, dl, unnest(qtoks) AS term FROM d),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, any_value(dl) AS dl
  FROM posting GROUP BY doc_id, term
),
idf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
qmap(query_id, term) AS (VALUES
    {qvals}),
scored AS (
  SELECT q.query_id, tf.doc_id, tf.term, tf.tf, i.df, s.n_docs,
         ln(1.0 + (CAST(s.n_docs AS DOUBLE) - i.df + 0.5) / (i.df + 0.5))
         * (tf.tf * {K1 + 1.0!r}
            / (tf.tf + {K1!r} * ({1.0 - B!r} + {B!r}
               * (CAST(tf.dl AS DOUBLE)
                  / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS s
  FROM tf JOIN idf i USING (term) JOIN qmap q USING (term) CROSS JOIN stats s
),
summed AS (
  SELECT query_id, doc_id,
         round(list_aggregate(list(s ORDER BY term ASC), 'sum'), 6) AS score
  FROM scored GROUP BY query_id, doc_id
),
top1 AS (
  SELECT doc_id, score FROM (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id ASC) AS rank
    FROM summed)
  WHERE query_id = 0 AND rank = 1
)
SELECT sc.doc_id, sc.term,
       CAST(sc.tf AS BIGINT) AS tf,
       CAST(sc.df AS BIGINT) AS df,
       round(ln(1.0 + (CAST(sc.n_docs AS DOUBLE) - sc.df + 0.5)
                / (sc.df + 0.5)), 6) AS idf,
       round(sc.s, 6) AS contribution,
       t1.score AS total_score
FROM scored sc JOIN top1 t1 ON t1.doc_id = sc.doc_id
WHERE sc.query_id = 0
"""


@register("bm25_score_explain", oracle=_bm25_explain_oracle)
def bm25_score_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search explainability: the per-term decomposition of the
    winning BM25 score — for query 0's top document, each query
    term's tf, df, idf and contribution next to the total — the
    "why did this doc rank first" breakdown a relevance engineer (or
    a user-facing 'matched because') reads, made possible because
    bm25_term_scores is now the shared core under both the ranker
    and this explainer (same plan, same numbers, no drift between
    what's served and what's explained). Scale shape: identical to
    doc_search_bm25 plus one broadcast top-1 join. Contributions and
    idf carry round-6; tf/df are exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    scored = lexical_ops.bm25_term_scores(spark, docs, _BM25_QUERIES)
    top1 = (
        lexical_ops.bm25_search(spark, docs, _BM25_QUERIES, k=1)
        .where(F.col("query_id") == 0)
        .select(F.col("doc_id").alias("__d"), F.col("score").alias("total_score"))
    )
    expl = scored.where(F.col("query_id") == 0).join(
        F.broadcast(top1), F.col("doc_id") == F.col("__d")
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        6,
    )
    return expl.select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        idf.alias("idf"),
        F.round("s", 6).alias("contribution"),
        "total_score",
    )


_LATE_SPLIT_DAY = 8

_SQL_LATE_DROP = f"""
WITH ontime AS (
  SELECT * FROM events WHERE EXTRACT(day FROM ts) >= {_LATE_SPLIT_DAY}
),
wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM ontime),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         CAST(count(*) AS BIGINT) AS n_events
  FROM ontime GROUP BY 1
)
SELECT d.window_start, d.n_events
FROM daily d CROSS JOIN wm
WHERE d.window_start + INTERVAL 1 DAY <= wm.w
"""


@register("stream_late_drop", oracle=_SQL_LATE_DROP)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting, proven end to end: a REAL
    three-microbatch streaming run (file source ordered by mtime,
    maxFilesPerTrigger=1; bulk -> tail -> late) where the final batch
    delivers days 1..{_LATE_SPLIT_DAY - 1} AFTER the watermark has
    advanced past them — the engine must DROP every late row, and the append-mode
    output must contain exactly the on-time daily windows whose end
    cleared the final watermark. The oracle states that closed form;
    if late rows leaked into state their long-past windows would
    finalize instantly and surface as extra rows, failing the hash.
    This is the semantics that bounds streaming state at scale:
    state follows the watermark horizon, not stream history (the
    sixth streaming entry, completing window/dedup/join/sessionize/
    rank with the late-data contract)."""
    from nano_vectordb_spark.streaming.events import late_drop_stream

    return late_drop_stream(spark, sf_dir, split_day=_LATE_SPLIT_DAY)


_GDPR_MOD = 37  # user_id % 37 == 0 stands in for the erasure request list

_SQL_GDPR = f"""
WITH req AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {_GDPR_MOD} = 0
),
ev AS (
  SELECT CAST(count(*) AS BIGINT) AS n_before,
         CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deleted
  FROM events e LEFT JOIN req r ON r.user_id = e.user_id
),
sess AS (
  SELECT CAST(count(*) AS BIGINT) AS n_before,
         CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deleted
  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) s
  LEFT JOIN req r ON r.user_id = s.user_id
)
SELECT t.tbl, t.n_before, t.n_deleted,
       CAST(t.n_before - t.n_deleted AS BIGINT) AS n_after,
       CAST(0 AS BIGINT) AS n_residual
FROM (
  SELECT 'events' AS tbl, n_before, n_deleted FROM ev
  UNION ALL
  SELECT 'user_days' AS tbl, n_before, n_deleted FROM sess
) t
"""


@register("gdpr_erasure_audit", oracle=_SQL_GDPR)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade, audited: for a deterministic
    erasure-request list (user_id % {_GDPR_MOD} == 0), delete the
    users from the raw events AND from a derived user-day rollup, and
    report per table: rows before, rows deleted, rows after, and —
    the line compliance actually signs off on — the RESIDUAL count of
    surviving rows that still reference a requested user, re-measured
    from the post-delete tables by anti-join (provably 0, not assumed
    0). Scale shape: the request list broadcasts into anti-joins on
    every table (the tombstone pattern ivf_search_after_delete uses
    for vectors); the audit is one conditional aggregate per table.
    Integer-exact throughout."""
    ev = load_table(spark, sf_dir, "events")
    req = (
        ev.where(F.col("user_id") % _GDPR_MOD == 0)
        .select("user_id")
        .distinct()
    )
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()

    def audit(df: DataFrame, tbl: str) -> DataFrame:
        kept = df.join(F.broadcast(req), "user_id", "left_anti")
        residual = kept.join(F.broadcast(req), "user_id", "left_semi")
        n_before = df.count()
        n_after = kept.count()
        n_residual = residual.count()
        return spark.createDataFrame(
            [(tbl, n_before, n_before - n_after, n_after, n_residual)],
            "tbl string, n_before long, n_deleted long, n_after long, n_residual long",
        )

    return audit(ev, "events").unionByName(audit(user_days, "user_days"))


def _frontier_oracle() -> str:
    sweep = resolve_oracle(REGISTRY["ivf_recall_sweep"])
    cost = resolve_oracle(REGISTRY["ivf_probe_cost"])
    return f"""
WITH s AS ({sweep}),
c AS ({cost}),
dim_(d) AS (SELECT CAST(max(len(embedding)) AS BIGINT) FROM embeddings),
j AS (
  SELECT s.nprobe, s.recall_at_k, c.scan_fraction,
         c.total_rows_scanned * dim_.d * 4 AS bytes_f32
  FROM s JOIN c ON c.nprobe = s.nprobe CROSS JOIN dim_
)
SELECT nprobe, recall_at_k, scan_fraction,
       CAST(bytes_f32 AS BIGINT) AS bytes_f32,
       round(recall_at_k / scan_fraction, 6) AS recall_per_scan,
       round((recall_at_k - lag(recall_at_k) OVER w)
             / (scan_fraction - lag(scan_fraction) OVER w), 6)
         AS marginal_recall_per_scan
FROM j
WINDOW w AS (ORDER BY nprobe)
"""


@register("ann_cost_frontier", oracle=_frontier_oracle)
def ann_cost_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN operating-point decision table, composed: recall@k
    (ivf_recall_sweep) joined to scan cost (ivf_probe_cost) per
    nprobe, with f32 bytes per query batch, recall-per-scan
    efficiency, and the MARGINAL recall bought by each extra unit of
    scan fraction — the declining-marginal column IS the knee the
    autotuner and the reference's Performance.md tables eyeball; a
    capacity planner multiplies bytes_f32 by QPS and reads the
    memory-bandwidth budget straight off this table. Pure composition
    of two proven entries plus one lag window over 5 rows; recall and
    fractions are exact-integer ratios, divisions carry round-6."""
    sweep = REGISTRY["ivf_recall_sweep"].fn(spark, sf_dir)
    cost = REGISTRY["ivf_probe_cost"].fn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.agg(F.max(F.size("embedding"))).collect()[0][0]
    j = sweep.select("nprobe", "recall_at_k").join(
        cost.select("nprobe", "scan_fraction", "total_rows_scanned"), "nprobe"
    )
    w = Window.orderBy("nprobe")
    return j.select(
        "nprobe",
        "recall_at_k",
        "scan_fraction",
        (F.col("total_rows_scanned") * F.lit(int(dim)) * 4)
        .cast("long")
        .alias("bytes_f32"),
        F.round(F.col("recall_at_k") / F.col("scan_fraction"), 6).alias(
            "recall_per_scan"
        ),
        F.round(
            (F.col("recall_at_k") - F.lag("recall_at_k").over(w))
            / (F.col("scan_fraction") - F.lag("scan_fraction").over(w)),
            6,
        ).alias("marginal_recall_per_scan"),
    )


_SQL_GINI = """
WITH rev AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT r, CAST(row_number() OVER (ORDER BY r ASC, o_custkey ASC) AS BIGINT) AS i
  FROM rev
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(r) AS tot,
         sum(r * i) AS weighted
  FROM ranked
)
SELECT n AS n_customers,
       CAST(tot AS DOUBLE) AS total_revenue,
       round((2.0 * CAST(weighted AS DOUBLE)) / (n * CAST(tot AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / n, 6) AS gini
FROM s
"""


@register("revenue_gini", oracle=_SQL_GINI)
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality measurement: the Gini coefficient of per-customer
    revenue, G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending-sorted x — the single-number concentration summary next
    to revenue_pareto's 80/20 cut (and, for a corpus, the mixture-
    imbalance score of per-source token counts). Every sum is EXACT
    DECIMAL weighted by exact integer ranks over a total order; only
    the final closed form touches doubles, with round-6. Scale shape:
    one keyed aggregate + a TWO-PHASE global rank (range partition +
    per-partition row_number + broadcast offsets,
    operators/globalrank.py) — at 100 TB |customers| is 10^8-10^9 and
    an unpartitioned rank window would be a one-task straggler."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    ranked = grank.two_phase_rank(
        rev, [F.col("r").asc(), F.col("o_custkey").asc()], rn_name="i"
    ).select("r", "i")
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("r").alias("tot"),
        F.sum(F.col("r") * F.col("i")).alias("weighted"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("tot").cast("double").alias("total_revenue"),
        F.round(
            (F.lit(2.0) * F.col("weighted").cast("double"))
            / (F.col("n") * F.col("tot").cast("double"))
            - (F.col("n").cast("double") + F.lit(1.0)) / F.col("n"),
            6,
        ).alias("gini"),
    )


_SQL_SIMPSON = f"""
WITH assign AS (
  SELECT e.user_id, d.lang,
         CASE WHEN ('0x' || substr(md5('ab{SEED}:' || CAST(e.user_id AS VARCHAR)),
                    1, 7))::BIGINT % 2 = 0 THEN 'A' ELSE 'B' END AS arm
  FROM (SELECT DISTINCT user_id FROM events) e
  JOIN documents d ON d.doc_id = e.user_id % 500
),
conv AS (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  GROUP BY user_id HAVING count(*) >= 15
),
cells AS (
  SELECT a.lang, a.arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS conv
  FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
  GROUP BY a.lang, a.arm
),
strata AS (
  SELECT lang,
         max(CASE WHEN arm = 'A' THEN n END) AS na,
         max(CASE WHEN arm = 'A' THEN conv END) AS ca,
         max(CASE WHEN arm = 'B' THEN n END) AS nb,
         max(CASE WHEN arm = 'B' THEN conv END) AS cb
  FROM cells GROUP BY lang
),
overall AS (
  SELECT sum(na) AS na, sum(ca) AS ca, sum(nb) AS nb, sum(cb) AS cb FROM strata
)
SELECT s.lang AS stratum,
       CAST(s.na AS BIGINT) AS n_a, CAST(s.ca AS BIGINT) AS conv_a,
       CAST(s.nb AS BIGINT) AS n_b, CAST(s.cb AS BIGINT) AS conv_b,
       round(CAST(s.ca AS DOUBLE) / s.na - CAST(s.cb AS DOUBLE) / s.nb, 6)
         AS rate_diff,
       round(CAST(o.ca AS DOUBLE) / o.na - CAST(o.cb AS DOUBLE) / o.nb, 6)
         AS overall_rate_diff,
       CAST(CASE WHEN (CAST(s.ca AS DOUBLE) / s.na - CAST(s.cb AS DOUBLE) / s.nb)
                      * (CAST(o.ca AS DOUBLE) / o.na - CAST(o.cb AS DOUBLE) / o.nb)
                      < 0 THEN 1 ELSE 0 END AS INT) AS sign_reversed
FROM strata s CROSS JOIN overall o
"""


@register("simpson_paradox_audit", oracle=_SQL_SIMPSON)
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confounding audit (Simpson's paradox detector): the A/B
    conversion gap recomputed inside strata — users keyed to a
    document attribute (lang, via the deterministic user->doc map) —
    with a flag wherever a stratum's effect direction REVERSES the
    pooled one; any reversal means the pooled ab_test_conversion
    readout is confounded and per-stratum (or weighted) estimates
    must be reported instead. Same md5 arm assignment and heavy-buyer
    conversion as the pooled test, so the two entries reconcile
    exactly. Integer counts, round-6 rate gaps (the flag multiplies
    unrounded gaps identically in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    users = ev.select("user_id").distinct()
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"ab{SEED}:"), F.col("user_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assign = users.join(
        F.broadcast(docs.select("doc_id", "lang")),
        users["user_id"] % 500 == docs["doc_id"],
    ).select("user_id", "lang", arm.alias("arm"))
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("__np"))
        .where(F.col("__np") >= 15)
        .select("user_id")
        .withColumn("__c", F.lit(1))
    )
    cells = (
        assign.join(F.broadcast(conv), "user_id", "left")
        .groupBy("lang", "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("__c").isNotNull().cast("long")).alias("conv"),
        )
    )
    strata = cells.groupBy("lang").agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    tot = strata.agg(
        F.sum("na").alias("ona"),
        F.sum("ca").alias("oca"),
        F.sum("nb").alias("onb"),
        F.sum("cb").alias("ocb"),
    ).collect()[0]
    odiff = float(tot["oca"]) / float(tot["ona"]) - float(tot["ocb"]) / float(
        tot["onb"]
    )
    sdiff = F.col("ca").cast("double") / F.col("na") - F.col("cb").cast(
        "double"
    ) / F.col("nb")
    return strata.select(
        F.col("lang").alias("stratum"),
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        F.round(sdiff, 6).alias("rate_diff"),
        F.round(F.lit(odiff), 6).alias("overall_rate_diff"),
        ((sdiff * F.lit(odiff)) < 0).cast("int").alias("sign_reversed"),
    )


_SQL_HOLT = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
arr AS (SELECT list([y, 0.0] ORDER BY d) AS items, CAST(count(*) AS BIGINT) AS n FROM daily),
folded AS (
  SELECT n,
         list_reduce(
           list_prepend([items[1][1], 0.0], items[2:]),
           (a, x) -> [
             0.5 * x[1] + 0.5 * (a[1] + a[2]),
             0.3 * ((0.5 * x[1] + 0.5 * (a[1] + a[2])) - a[1]) + 0.7 * a[2]
           ]) AS st
  FROM arr
)
SELECT n AS n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       round(st[1] + 1.0 * st[2], 6) AS forecast_1d,
       round(st[1] + 2.0 * st[2], 6) AS forecast_2d,
       round(st[1] + 3.0 * st[2], 6) AS forecast_3d
FROM folded
"""


@register("holt_forecast_daily", oracle=_SQL_HOLT)
def holt_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting: Holt's linear exponential smoothing (alpha=0.5,
    beta=0.3) over daily event volume, with 1/2/3-day-ahead forecasts
    — the next step up the ladder from user_value_ewma (level only)
    and event_type_trend (one global line): a recency-weighted level
    PLUS trend, which is what a short-horizon capacity forecast
    actually runs on. The recurrence is inherently sequential, so
    it runs as the same day-ordered fold (2-slot state) as the
    clamped ledger — reduced over the 30-row day-grain rollup, a
    constant-size driver of work at any event volume. Smoothing
    constants are shared literals; both engines evaluate the
    identically-structured IEEE expressions over identical inputs;
    outputs carry round-6."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.col("ts").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("double").alias("y"))
    )
    g = daily.agg(
        F.count("*").alias("n"),
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("items"),
    )
    ys = F.transform(F.col("items"), lambda s: s["y"])
    init = F.struct(
        F.element_at(ys, 1).alias("l"), F.lit(0.0).alias("b")
    )
    rest = F.slice(ys, 2, F.size(ys) - 1)

    def step(a, x):
        l_new = F.lit(0.5) * x + F.lit(0.5) * (a["l"] + a["b"])
        b_new = (
            F.lit(0.3)
            * ((F.lit(0.5) * x + F.lit(0.5) * (a["l"] + a["b"])) - a["l"])
            + F.lit(0.7) * a["b"]
        )
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    st = F.aggregate(rest, init, step)
    return g.select(
        F.col("n").alias("n_days"),
        F.round(st["l"], 6).alias("level"),
        F.round(st["b"], 6).alias("trend"),
        F.round(st["l"] + F.lit(1.0) * st["b"], 6).alias("forecast_1d"),
        F.round(st["l"] + F.lit(2.0) * st["b"], 6).alias("forecast_2d"),
        F.round(st["l"] + F.lit(3.0) * st["b"], 6).alias("forecast_3d"),
    )


_SQL_DISPERSION = """
WITH c AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS k FROM orders GROUP BY o_custkey
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS skk
  FROM c
)
SELECT n AS n_customers, sk AS n_orders,
       round(CAST(sk AS DOUBLE) / n, 6) AS mean_orders,
       round((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / n)
             / (CAST(n AS DOUBLE) - 1.0), 6) AS var_orders,
       round(((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / n)
              / (CAST(n AS DOUBLE) - 1.0)) / (CAST(sk AS DOUBLE) / n), 6)
         AS dispersion_index
FROM s
"""


@register("order_count_dispersion", oracle=_SQL_DISPERSION)
def order_count_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-model diagnostics: the variance-to-mean (Poisson
    dispersion) index of orders per customer — the one number that
    says whether a Poisson assumption holds (~1), the population is
    bursty/heterogeneous (>1, reach for negative-binomial), or
    suspiciously regular (<1, often a synthetic generator — which
    this fixture honestly shows). One map-side-combined moment
    aggregate; sufficient statistics are exact integers, the closed
    forms carry round-6."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(F.count("*").alias("k"))
    s = c.agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
    )
    mean = F.col("sk").cast("double") / F.col("n")
    var = (
        F.col("skk").cast("double") - F.col("sk").cast("double") * F.col("sk") / F.col("n")
    ) / (F.col("n").cast("double") - F.lit(1.0))
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("sk").alias("n_orders"),
        F.round(mean, 6).alias("mean_orders"),
        F.round(var, 6).alias("var_orders"),
        F.round(var / mean, 6).alias("dispersion_index"),
    )


_SQL_ENTROPY_RATE = """
WITH seq AS (
  SELECT user_id, event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events
),
tr AS (
  SELECT f, t, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE t IS NOT NULL GROUP BY f, t
),
fr AS (SELECT f, CAST(sum(c) AS BIGINT) AS c_f FROM tr GROUP BY f),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tr),
terms AS (
  SELECT tr.f,
         -(CAST(tr.c AS DOUBLE) / tot.n)
           * log2(CAST(tr.c AS DOUBLE) / fr.c_f) AS h
  FROM tr JOIN fr ON fr.f = tr.f CROSS JOIN tot
)
SELECT CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_transition_types,
       round(list_aggregate(list(h ORDER BY h), 'sum'), 6) AS entropy_rate_bits
FROM terms
"""


@register("event_entropy_rate", oracle=_SQL_ENTROPY_RATE)
def event_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral predictability: the entropy rate of the first-order
    event chain, H(next | current) = -sum p(f,t) log2 p(t|f) — how
    many bits each next action actually carries given the current one
    (the information-theoretic summary of event_markov_transitions;
    compare against corpus_diversity_entropy's static mix:
    rate << log2(5) means behavior is predictable and journey-level
    caching/prefetch pays). One lead() window + a 25-cell aggregate;
    probabilities are exact-integer ratios, the per-cell terms fold
    in value order with the round-6 log2 contract."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(w).alias("t"),
    ).where(F.col("t").isNotNull())
    tr = seq.groupBy("f", "t").agg(F.count("*").alias("c"))
    fr = tr.groupBy("f").agg(F.sum("c").alias("c_f"))
    n = tr.agg(F.sum("c")).collect()[0][0]
    terms = tr.join(F.broadcast(fr), "f").select(
        (
            -(F.col("c").cast("double") / F.lit(int(n)))
            * F.log2(F.col("c").cast("double") / F.col("c_f"))
        ).alias("h")
    )
    return terms.agg(
        F.count("*").alias("n_transition_types"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("h")), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("entropy_rate_bits"),
    )


_XCORR_MAX_LAG = 3

_SQL_XCORR = f"""
WITH d AS (
  SELECT CAST(EXTRACT(day FROM ts) AS INT) AS day,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1})) AS lag),
pairs AS (
  SELECT l.lag, a.x, b.y
  FROM lags l
  JOIN d a ON TRUE
  JOIN d b ON b.day = a.day + l.lag
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS xcorr
FROM m
"""


@register("error_purchase_xcorr", oracle=_SQL_XCORR)
def error_purchase_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag analysis: cross-correlation of the daily error series
    against the purchase series at lags -{_XCORR_MAX_LAG}..
    +{_XCORR_MAX_LAG} — the "does X lead Y" table that turns two
    monitoring curves into a causal hypothesis (a peak at positive
    lag means errors PRECEDE purchase changes: investigate checkout;
    at zero, shared load). Every sufficient statistic is an exact
    integer over day-grain counts, so each lag's correlation is
    exact-rational into one round-6 — same normal-equation shape as
    event_type_trend, swept over a 7-row lag dimension via a
    day-offset self-join of the 30-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.dayofmonth("ts").cast("int").alias("day"),
            (F.col("event_type") == "error").cast("long").alias("is_x"),
            (F.col("event_type") == "purchase").cast("long").alias("is_y"),
        )
        .groupBy("day")
        .agg(F.sum("is_x").alias("x"), F.sum("is_y").alias("y"))
    )
    a = d.select(
        F.col("day").alias("da"),
        F.col("x"),
        F.explode(
            F.array(
                *[F.lit(l) for l in range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1)]
            )
        ).alias("lag"),
    )
    b = d.select(F.col("day").alias("db"), F.col("y"))
    pairs = a.join(b, F.col("db") == F.col("da") + F.col("lag"))
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.round(
            num.cast("double")
            / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double"))),
            6,
        ).alias("xcorr"),
    )


_CUSUM_K = 0.5   # slack, in sigma units
_CUSUM_H = 4.0   # decision threshold, in sigma units

_SQL_CUSUM = f"""
WITH d AS (
  SELECT CAST(EXTRACT(day FROM ts) AS INT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS scc
  FROM d
),
z AS (
  SELECT d.day, d.c,
         (CAST(d.c AS DOUBLE) - CAST(s.sc AS DOUBLE) / s.n)
         / sqrt((CAST(s.scc AS DOUBLE) - CAST(s.sc AS DOUBLE) * s.sc / s.n)
                / (CAST(s.n AS DOUBLE) - 1.0)) AS zv
  FROM d CROSS JOIN s
),
pref AS (
  SELECT a.day, a.c, round(a.zv, 6) AS z,
         list(round(b.zv, 6) ORDER BY b.day) AS zs
  FROM z a JOIN z b ON b.day <= a.day
  GROUP BY a.day, a.c, a.zv
),
folded AS (
  SELECT day, c, z,
         list_reduce(list_prepend([0.0, 0.0], list_transform(zs, v -> [v, 0.0])),
           (a, x) -> [
             greatest(0.0, a[1] + x[1] - {_CUSUM_K!r}),
             greatest(0.0, a[2] - x[1] - {_CUSUM_K!r})
           ]) AS st
  FROM pref
)
SELECT day, c AS n_events, z,
       round(st[1], 6) AS cusum_hi, round(st[2], 6) AS cusum_lo,
       CAST(CASE WHEN st[1] > {_CUSUM_H!r} OR st[2] > {_CUSUM_H!r}
            THEN 1 ELSE 0 END AS INT) AS shift_detected
FROM folded
"""


@register("volume_cusum_chart", oracle=_SQL_CUSUM)
def volume_cusum_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection (tabular CUSUM): daily volume
    standardized against the month's mean/sd, then the classic
    one-sided cumulative sums C+ = max(0, C+ + z - k) and
    C- = max(0, C- - z - k) with a 4-sigma decision threshold — the
    SPC chart that catches SMALL SUSTAINED level shifts the p-chart's
    per-day 3-sigma test misses entirely. The recurrence is the
    clamp-fold family again (per-day prefix folds over the 30-row
    rollup; at scale the per-key sequential state is the streaming
    applyInPandasWithState shape). z-scores round to 6 BEFORE
    entering the fold, so every engine folds identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(F.dayofmonth("ts").cast("int").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("c"))
    )
    s = d.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    ).collect()[0]
    n, sc, scc = int(s["n"]), int(s["sc"]), int(s["scc"])
    mean = float(sc) / n
    sd = _math.sqrt((float(scc) - float(sc) * sc / n) / (float(n) - 1.0))
    z = d.select(
        "day",
        "c",
        F.round((F.col("c").cast("double") - F.lit(mean)) / F.lit(sd), 6).alias("z"),
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    zs = F.transform(
        F.array_sort(F.collect_list(F.struct("day", "z")).over(w_cum)),
        lambda x: x["z"],
    )
    st = F.aggregate(
        zs,
        F.struct(F.lit(0.0).alias("hi"), F.lit(0.0).alias("lo")),
        lambda a, x: F.struct(
            F.greatest(F.lit(0.0), a["hi"] + x - F.lit(_CUSUM_K)).alias("hi"),
            F.greatest(F.lit(0.0), a["lo"] - x - F.lit(_CUSUM_K)).alias("lo"),
        ),
    )
    out = z.select(
        "day",
        F.col("c").alias("n_events"),
        "z",
        F.round(st["hi"], 6).alias("cusum_hi"),
        F.round(st["lo"], 6).alias("cusum_lo"),
        ((st["hi"] > _CUSUM_H) | (st["lo"] > _CUSUM_H)).cast("int").alias(
            "shift_detected"
        ),
    )
    return out


_SQL_HEAPS = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
w AS (SELECT doc_id, unnest(toks) AS term FROM t),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY term),
half AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v1,
         CAST(count(*) AS BIGINT) AS n1
  FROM w WHERE doc_id % 2 = 0
),
full_ AS (
  SELECT CAST(count(*) AS BIGINT) AS v2,
         CAST(sum(c) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM tc
)
SELECT full_.v2 AS vocab_size, full_.n2 AS n_tokens, full_.hapax,
       round(CAST(full_.hapax AS DOUBLE) / full_.v2, 6) AS hapax_rate,
       half.v1 AS vocab_half, half.n1 AS tokens_half,
       round(ln(CAST(full_.v2 AS DOUBLE) / half.v1)
             / ln(CAST(full_.n2 AS DOUBLE) / half.n1), 6) AS heaps_beta
FROM full_ CROSS JOIN half
"""


@register("vocab_growth_heaps", oracle=_SQL_HEAPS)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth diagnostics: hapax-legomenon rate (terms seen
    exactly once — the OOV-pressure signal a tokenizer budget is sized
    against) and the Heaps'-law exponent estimated from a half-corpus
    vs full-corpus vocabulary pair, V = K*N^beta — natural text sits
    near beta ~0.5; this fixture's closed vocabulary honestly reads
    ~0 (vocabulary saturates), exactly what the measurement is FOR
    (detecting template/synthetic text). Two distinct-count
    aggregates and one frequency table; ln carries round-6."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(tx.tokens_expr("text")).alias("term"))
    tc = w.groupBy("term").agg(F.count("*").alias("c"))
    half = w.where(F.col("doc_id") % 2 == 0).agg(
        F.count_distinct("term").alias("v1"), F.count("*").alias("n1")
    ).collect()[0]
    fullr = tc.agg(
        F.count("*").alias("v2"),
        F.sum("c").alias("n2"),
        F.sum((F.col("c") == 1).cast("long")).alias("hapax"),
    )
    v1, n1 = int(half["v1"]), int(half["n1"])
    return fullr.select(
        F.col("v2").alias("vocab_size"),
        F.col("n2").alias("n_tokens"),
        "hapax",
        F.round(F.col("hapax").cast("double") / F.col("v2"), 6).alias(
            "hapax_rate"
        ),
        F.lit(v1).cast("long").alias("vocab_half"),
        F.lit(n1).cast("long").alias("tokens_half"),
        F.round(
            F.log(F.col("v2").cast("double") / F.lit(v1))
            / F.log(F.col("n2").cast("double") / F.lit(n1)),
            6,
        ).alias("heaps_beta"),
    )


_PD_TOP = 15

_SQL_PRICE_DISPERSION = f"""
WITH up AS (
  SELECT l_partkey AS part, l_suppkey AS supp,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY 1, 2
),
pp AS (
  SELECT part, supp,
         round(CAST(r AS DOUBLE) / CAST(q AS DOUBLE), 6) AS unit_price
  FROM up
),
m AS (
  SELECT part, CAST(count(*) AS BIGINT) AS n_suppliers,
         round(avg(unit_price), 6) AS mean_price,
         min(unit_price) AS min_price, max(unit_price) AS max_price
  FROM pp GROUP BY part HAVING count(*) >= 3
)
SELECT part, n_suppliers, mean_price, min_price, max_price,
       round((max_price - min_price) / mean_price, 6) AS price_range_ratio,
       CAST(row_number() OVER (
         ORDER BY round((max_price - min_price) / mean_price, 6) DESC,
                  part ASC) AS INT) AS dispersion_rank
FROM m
QUALIFY dispersion_rank <= {_PD_TOP}
"""


@register("price_dispersion_by_part", oracle=_SQL_PRICE_DISPERSION)
def price_dispersion_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketplace price dispersion: for parts sold by >= 3 suppliers,
    the spread of quantity-weighted unit prices across suppliers,
    ranked by range-over-mean — the procurement arbitrage (or data-
    error) shortlist, and the classic industrial-organization
    dispersion measure. Unit prices are exact-decimal revenue /
    exact-decimal quantity rounded to 6 (engine-identical), min/max
    exact compares, the mean avg+round-6; ranking orders on the
    ROUNDED ratio with a part tie-break. One (part, supplier)
    aggregate then a part-keyed reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    up = li.groupBy(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
    )
    pp = up.select(
        "part",
        F.round(F.col("r").cast("double") / F.col("q").cast("double"), 6).alias(
            "unit_price"
        ),
    )
    m = (
        pp.groupBy("part")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.avg("unit_price"), 6).alias("mean_price"),
            F.min("unit_price").alias("min_price"),
            F.max("unit_price").alias("max_price"),
        )
        .where(F.col("n_suppliers") >= 3)
    )
    ratio = F.round(
        (F.col("max_price") - F.col("min_price")) / F.col("mean_price"), 6
    )
    w = Window.orderBy(ratio.desc(), F.col("part").asc())
    return (
        m.select(
            "part",
            "n_suppliers",
            "mean_price",
            "min_price",
            "max_price",
            ratio.alias("price_range_ratio"),
        )
        .withColumn("dispersion_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("dispersion_rank") <= _PD_TOP)
    )


_SQL_WATERFILL = """
WITH caps AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS cap
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(cap) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS ns FROM caps),
budget AS (SELECT CAST(total * 9 // 10 AS BIGINT) AS t FROM tot),
ranked AS (
  SELECT source, cap,
         CAST(row_number() OVER (ORDER BY cap ASC, source ASC) AS BIGINT) AS i,
         sum(cap) OVER (ORDER BY cap ASC, source ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pref
  FROM caps
),
lev AS (
  -- the water level: smallest-cap sources saturate; the first rank i
  -- where distributing the remaining budget over the remaining
  -- sources stays below the NEXT cap fixes the level
  SELECT max(CAST(b.t - (r.pref - r.cap) AS DOUBLE) / (tot.ns - r.i + 1)) AS level
  FROM ranked r CROSS JOIN budget b CROSS JOIN tot
  WHERE CAST(b.t - (r.pref - r.cap) AS DOUBLE) / (tot.ns - r.i + 1) <= r.cap
),
alloc AS (
  SELECT r.source, r.cap,
         CASE WHEN CAST(r.cap AS DOUBLE) <= lev.level
              THEN CAST(r.cap AS DOUBLE) ELSE lev.level END AS a
  FROM ranked r CROSS JOIN lev
)
SELECT source, cap AS available_tokens,
       round(a, 6) AS allocated_tokens,
       round(a / cap, 6) AS take_fraction,
       CAST(CASE WHEN CAST(cap AS DOUBLE) <= a THEN 1 ELSE 0 END AS INT)
         AS saturated
FROM alloc
"""


@register("mixture_waterfill", oracle=_SQL_WATERFILL)
def mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture allocation by water-filling: given a token budget (90%
    of the corpus), give every source an EQUAL share except where a
    source's availability caps it — small sources saturate and their
    shortfall redistributes to the rest, the max-min-fair allocation
    (waterfilling) that mixture_weights' proportional and
    temperature schemes do NOT produce. The water level has a closed
    form over the cap-sorted prefix sums (no iteration): the first
    rank where the evenly-split remainder fits under the next cap
    fixes it — one |sources|-row window pass. Caps and budget are
    exact integers; the level and allocations carry round-6. At
    scale: one token-count aggregate then arithmetic over the tiny
    source table."""
    docs = load_table(spark, sf_dir, "documents")
    caps = docs.groupBy("source").agg(
        F.sum(F.size(tx.tokens_expr("text"))).cast("long").alias("cap")
    )
    tot = caps.agg(
        F.sum("cap").alias("total"), F.count("*").alias("ns")
    ).collect()[0]
    total, ns = int(tot["total"]), int(tot["ns"])
    t = total * 9 // 10
    w = Window.orderBy(F.col("cap").asc(), F.col("source").asc())
    ranked = caps.select(
        "source",
        "cap",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("cap")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pref"),
    )
    cand = (F.lit(t) - (F.col("pref") - F.col("cap"))).cast("double") / (
        F.lit(ns) - F.col("i") + 1
    )
    # the first valid rank carries the true level; later ranks'
    # candidates only shrink (their prefixes over-subtract), so the
    # level is the MAX of the valid candidates
    lev = (
        ranked.where(cand <= F.col("cap"))
        .agg(F.max(cand).alias("level"))
        .collect()[0]["level"]
    )
    a = F.when(
        F.col("cap").cast("double") <= F.lit(lev), F.col("cap").cast("double")
    ).otherwise(F.lit(lev))
    return ranked.select(
        "source",
        F.col("cap").alias("available_tokens"),
        F.round(a, 6).alias("allocated_tokens"),
        F.round(a / F.col("cap"), 6).alias("take_fraction"),
        (F.col("cap").cast("double") <= a).cast("int").alias("saturated"),
    )


_SQL_CHI2_INDEP = """
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang
),
marg_s AS (SELECT source, CAST(sum(o) AS BIGINT) AS ns FROM cells GROUP BY source),
marg_l AS (SELECT lang, CAST(sum(o) AS BIGINT) AS nl FROM cells GROUP BY lang),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
grid AS (
  SELECT s.source, l.lang, s.ns, l.nl, tot.n,
         coalesce(c.o, 0) AS o,
         CAST(s.ns AS DOUBLE) * l.nl / tot.n AS e
  FROM marg_s s CROSS JOIN marg_l l CROSS JOIN tot
  LEFT JOIN cells c ON c.source = s.source AND c.lang = l.lang
),
terms AS (SELECT (o - e) * (o - e) / e AS t FROM grid),
chis AS (
  SELECT round(list_aggregate(list(t ORDER BY t), 'sum'), 6) AS chi2 FROM terms
),
dims AS (
  SELECT CAST((SELECT count(*) FROM marg_s) AS BIGINT) AS r,
         CAST((SELECT count(*) FROM marg_l) AS BIGINT) AS c
)
SELECT dims.r AS n_sources, dims.c AS n_langs,
       CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS dof,
       chis.chi2,
       round(chis.chi2 / ((dims.r - 1) * (dims.c - 1)), 6) AS chi2_per_dof
FROM dims CROSS JOIN chis
"""


@register("source_lang_independence", oracle=_SQL_CHI2_INDEP)
def source_lang_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between source and language —
    the contingency-table audit that says whether vendors specialize
    by language (chi2/dof >> 1) or the mix is exchangeable (~1, so
    per-source language stratification in mixture design buys
    nothing); the independence sibling of benford_price_audit's
    goodness-of-fit. The full marginal grid (including
    zero-observed cells, which carry weight (0-e)^2/e) comes from a
    marginals cross join — bounded by |sources| x |langs|, never by
    rows; expected counts are exact-integer products through one
    division; the term sum folds in value order with round-6."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count("*").alias("o"))
    ms = cells.groupBy("source").agg(F.sum("o").alias("ns"))
    ml = cells.groupBy("lang").agg(F.sum("o").alias("nl"))
    tot = cells.agg(F.sum("o")).collect()[0][0]
    r = ms.count()
    c = ml.count()
    grid = (
        ms.crossJoin(F.broadcast(ml))
        .join(cells, ["source", "lang"], "left")
        .select(
            F.coalesce("o", F.lit(0)).alias("o"),
            (
                F.col("ns").cast("double") * F.col("nl") / F.lit(int(tot))
            ).alias("e"),
        )
    )
    t = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    agg = grid.agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(t)), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("chi2")
    )
    dof = (r - 1) * (c - 1)
    return agg.select(
        F.lit(r).cast("long").alias("n_sources"),
        F.lit(c).cast("long").alias("n_langs"),
        F.lit(dof).cast("long").alias("dof"),
        "chi2",
        F.round(F.col("chi2") / F.lit(float(dof)), 6).alias("chi2_per_dof"),
    )


_CONT_T = 0.6  # containment threshold |A ∩ B| / |A|

_SQL_CONTAINMENT = f"""
WITH sh AS ({_SQL_SHINGLES}),
post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS i
  FROM post a JOIN post b ON b.g = a.g AND b.doc_id <> a.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a_id, i.b_id, i.i AS n_shared,
       sa.n AS n_a, sb.n AS n_b,
       round(CAST(i.i AS DOUBLE) / sa.n, 6) AS containment_a_in_b,
       round(CAST(i.i AS DOUBLE)
             / CAST(sa.n + sb.n - i.i AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
WHERE CAST(i.i AS DOUBLE) / sa.n >= {_CONT_T}
"""


@register("containment_pairs", oracle=_SQL_CONTAINMENT)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment
    |A∩B| / |A| >= {_CONT_T} — the excerpt/quote/subset relation that
    symmetric Jaccard structurally misses (a paragraph fully embedded
    in a long doc has tiny Jaccard but containment ~1; Broder's
    original resemblance-AND-containment pair). Emitted next to the
    pair's Jaccard so the asymmetry is visible: high containment +
    low Jaccard = A lives inside B, the rows a keep-longest policy
    must see. Scale shape: the same shingle inverted-index join as
    ngram_jaccard_pairs (posting-list bound, never N^2), one
    intersection count per co-shingled ORDERED pair, broadcast size
    lookups. Integer-exact but for two round-6 ratios."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup_ops.ngram_shingles(docs)
    post = sh.select("doc_id", F.explode("shingles").alias("g"))
    sizes = sh.select("doc_id", F.size("shingles").cast("long").alias("n"))
    a = post.select(F.col("doc_id").alias("a_id"), "g")
    b = post.select(F.col("doc_id").alias("b_id"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("b_id") != F.col("a_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("n_b"))
    j = inter.join(F.broadcast(sa), "a_id").join(F.broadcast(sb), "b_id")
    cont = F.col("i").cast("double") / F.col("n_a")
    return (
        j.where(cont >= _CONT_T)
        .select(
            "a_id",
            "b_id",
            F.col("i").alias("n_shared"),
            "n_a",
            "n_b",
            F.round(cont, 6).alias("containment_a_in_b"),
            F.round(
                F.col("i").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("i")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


_SQL_NOVELTY = f"""
WITH sh AS ({_SQL_SHINGLES}),
post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
first_seen AS (SELECT g, CAST(min(doc_id) AS BIGINT) AS fs FROM post GROUP BY g)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.fs = p.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(CAST(sum(CASE WHEN f.fs = p.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty_share
FROM post p JOIN first_seen f ON f.g = p.g
GROUP BY p.doc_id
"""


@register("doc_novelty_share", oracle=_SQL_NOVELTY)
def doc_novelty_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty attribution: per document (in doc_id ingest order), the
    share of its shingles that NO earlier document contained — the
    marginal-contribution number that turns dedup from binary
    keep/drop into a budgeted ranking (a doc that is 95% re-used
    shingles adds almost nothing even if it is nobody's near-dup;
    streaming pipelines compute exactly this against a Bloom/shingle
    store before paying for a document). Scale shape: one min-
    aggregate over the shingle postings (first-seen owner), one
    posting join back, one doc-keyed conditional count — all
    inverted-index bound. Integer-exact plus one round-6 share."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup_ops.ngram_shingles(docs)
    post = sh.select("doc_id", F.explode("shingles").alias("g"))
    first_seen = post.groupBy("g").agg(F.min("doc_id").alias("fs"))
    j = post.join(first_seen, "g")
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum((F.col("fs") == F.col("doc_id")).cast("long")).alias("n_novel"),
        F.round(
            F.sum((F.col("fs") == F.col("doc_id")).cast("long")).cast("double")
            / F.count("*"),
            6,
        ).alias("novelty_share"),
    )


_FANOUT_KS = (1, 10, 100)
_FANOUT_QS = (0.5, 0.99)


def _fanout_levels() -> list[tuple[int, float, float]]:
    """(k, q, q^(1/k)) triples — the quantile of max-of-k i.i.d. draws
    is the base distribution's quantile at level q^(1/k)."""
    return [(k, q, q ** (1.0 / k)) for k in _FANOUT_KS for q in _FANOUT_QS]


def _fanout_oracle() -> str:
    rows = ",\n    ".join(
        f"({k}, CAST({q!r} AS DOUBLE), CAST({lv!r} AS DOUBLE))"
        for k, q, lv in _fanout_levels()
    )
    return f"""
WITH lat AS (
  SELECT round(value, 6) AS v,
         row_number() OVER (ORDER BY round(value, 6) ASC, event_id ASC) AS rn,
         count(*) OVER () AS n
  FROM events
),
levels(k, q, lv) AS (VALUES
    {rows})
SELECT l.k AS fanout, l.q AS quantile,
       round(l.lv, 6) AS effective_level,
       (SELECT v FROM lat
        WHERE rn = CAST(ceil(l.lv * lat2.n) AS BIGINT)) AS latency_value
FROM levels l CROSS JOIN (SELECT max(n) AS n FROM lat) lat2
"""


@register("fanout_tail_amplification", oracle=_fanout_oracle)
def fanout_tail_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-latency amplification under fan-out (Dean & Barroso, "The
    Tail at Scale"): when a request fans out to k parallel workers and
    waits for ALL, its q-quantile latency is the worker distribution's
    quantile at level q^(1/k) — this table reads the median and p99 of
    max-of-k straight off the EXACT order statistics of the measured
    latency column for k = 1/10/100, which is why a 1000-executor
    stage runs at its stragglers' pace and why the two-phase top-k's
    bounded per-partition work matters. Levels are shared
    Python-double literals; the lookup is an exact rank into the
    6-decimal-rounded values via the MERGEABLE counting histogram
    (latency_quantiles_counting's pattern): per-value counts partially
    aggregate map-side, the cumulative window runs over |distinct
    round-6 values| rows (value-domain bounded, never the fact table),
    and the value at rank r is min(v : cum >= r) — identical to the
    order-statistic lookup, with NO single-partition sort of events."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.round("value", 6).alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    n = counts.agg(F.sum("c")).collect()[0][0]
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("v", F.sum("c").over(wcum).cast("long").alias("cumc"))
    targets = [
        (k, q, lv, int(_math.ceil(lv * n))) for k, q, lv in _fanout_levels()
    ]
    aggs = [
        F.min(F.when(F.col("cumc") >= r, F.col("v"))).alias(f"t{i}")
        for i, (_, _, _, r) in enumerate(targets)
    ]
    row = cum.agg(*aggs).collect()[0]
    counts.unpersist()
    out = [
        (k, q, round(lv, 6), row[f"t{i}"])
        for i, (k, q, lv, _) in enumerate(targets)
    ]
    return spark.createDataFrame(
        out, "fanout int, quantile double, effective_level double, latency_value double"
    )


_ZIPF_FIT_R = 10_000  # head size for the log-log fit, mirrored in the oracle

_SQL_ZIPF = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
w AS (SELECT unnest(toks) AS term FROM t),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY term),
ranked AS (
  SELECT term, c,
         CAST(row_number() OVER (ORDER BY c DESC, term ASC) AS BIGINT) AS r
  FROM tc
),
head AS (SELECT * FROM ranked WHERE r <= {_ZIPF_FIT_R}),
xy AS (
  SELECT round(log2(CAST(r AS DOUBLE)), 6) AS x,
         round(log2(CAST(c AS DOUBLE)), 6) AS y
  FROM head
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         round(list_aggregate(list(x ORDER BY x), 'sum'), 6) AS sx,
         round(list_aggregate(list(y ORDER BY y), 'sum'), 6) AS sy,
         round(list_aggregate(list(x * x ORDER BY x * x), 'sum'), 6) AS sxx,
         round(list_aggregate(list(x * y ORDER BY x * y), 'sum'), 6) AS sxy
  FROM xy
),
v AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM tc)
SELECT v.vocab_size,
       m.n AS n_fit,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
FROM m, v
"""


@register("zipf_slope", oracle=_SQL_ZIPF)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: the log-log OLS slope of term frequency against
    frequency rank — natural language sits near -1; this fixture's
    closed near-uniform vocabulary honestly reads near 0, which
    (with vocab_growth_heaps' beta ~ 0) is the two-line fingerprint
    that text is templated/synthetic rather than natural. log2 terms
    round to 6 BEFORE the moment sums, each sum folds in value order
    and re-rounds, so the normal equations see identical doubles in
    both engines. The OLS fits the TOP-{_ZIPF_FIT_R} frequency ranks
    only (Zipf is a head fit; the shared literal is mirrored in the
    oracle): orderBy+limit plans as a parallel partial top-R per
    partition (TakeOrderedAndProject), the rank window and the ordered
    fold arrays are then bounded by R — never the open-ended
    vocabulary, which is 10^7-10^8 terms at web scale."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(tx.tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    vocab = tc.agg(F.count("*").cast("long").alias("vocab_size"))
    head = tc.orderBy(F.col("c").desc(), F.col("term").asc()).limit(_ZIPF_FIT_R)
    w = Window.orderBy(F.col("c").desc(), F.col("term").asc())
    xy = head.select(
        F.round(F.log2(F.row_number().over(w).cast("double")), 6).alias("x"),
        F.round(F.log2(F.col("c").cast("double")), 6).alias("y"),
    )

    def fold(col):
        return F.round(
            F.aggregate(
                F.array_sort(F.collect_list(col)), F.lit(0.0), lambda a, b: a + b
            ),
            6,
        )

    m = xy.agg(
        F.count("*").alias("n"),
        fold(F.col("x")).alias("sx"),
        fold(F.col("y")).alias("sy"),
        fold(F.col("x") * F.col("x")).alias("sxx"),
        fold(F.col("x") * F.col("y")).alias("sxy"),
    )
    return m.crossJoin(F.broadcast(vocab)).select(
        "vocab_size",
        F.col("n").cast("long").alias("n_fit"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


_SQL_SKYLINE = f"""
WITH qual AS ({_SQL_QUALITY}),
pts AS (
  SELECT d.doc_id,
         CAST(round(round(q.quality, 6) * 1000000.0, 0) AS BIGINT) AS q6,
         round(q.quality, 6) AS quality,
         d.n_chars
  FROM documents d JOIN qual q ON q.doc_id = d.doc_id
),
groups AS (SELECT q6, CAST(max(n_chars) AS BIGINT) AS gmax FROM pts GROUP BY q6),
gprior AS (
  SELECT q6, gmax,
         max(gmax) OVER (ORDER BY q6 DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_max
  FROM groups
)
SELECT p.doc_id, p.quality, p.n_chars
FROM pts p JOIN gprior g ON g.q6 = p.q6
WHERE (g.prior_max IS NULL OR g.prior_max < p.n_chars)
  AND p.n_chars = g.gmax
"""


@register("doc_skyline", oracle=_SQL_SKYLINE)
def doc_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKYLINE operator (Borzsony et al., ICDE'01): documents not
    Pareto-dominated in (quality, length) — no other doc is at least
    as good on both axes and strictly better on one. The multi-
    criteria shortlist no single score can produce (diverse_topk
    caps per source; this keeps every undominated tradeoff point).
    Algorithm: group by the quantized quality level, keep each
    level's max-length rows, then one DESCENDING running-max window
    over the ~|levels| group rows — the classic sort-based skyline,
    never a pairwise dominance join. Quality quantizes to an exact
    integer key (round*1e6), lengths are exact integers; equal
    (quality, length) ties all survive (no strict domination)."""
    docs = load_table(spark, sf_dir, "documents")
    d = _toks_df(spark, sf_dir)
    pts = d.select(
        "doc_id",
        "n_chars",
        F.round(tx.quality_expr(F.col("toks"), "text"), 6).alias("quality"),
    ).withColumn(
        "q6", F.round(F.col("quality") * 1000000.0, 0).cast("long")
    )
    groups = pts.groupBy("q6").agg(F.max("n_chars").alias("gmax"))
    w = Window.orderBy(F.col("q6").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    gprior = groups.withColumn("prior_max", F.max("gmax").over(w))
    return (
        pts.join(F.broadcast(gprior), "q6")
        .where(
            (F.col("prior_max").isNull() | (F.col("prior_max") < F.col("n_chars")))
            & (F.col("n_chars") == F.col("gmax"))
        )
        .select("doc_id", "quality", "n_chars")
    )


# ==========================================================================
# Driver-gate basket ordering (round 3)
#
# The driver's correctness gate checks the FIRST 50 entries in
# registration order (CORRECTNESS_r02 stopped at entry #50, leaving 54
# entries — including every r1 failure and SURVEY §2's O18/O19 — with no
# official driver verdict).  The round-2 VERDICT's top item: curate the
# top-50 into a covering set.  This list is that set:
#   * one representative per SURVEY.md §2 operator (O2-O29, O32-O33),
#   * the 9 entries that FAILED in round 1 and were never re-gated,
#   * O18 (latency_percentiles) + O19 (scan_cost_model),
#   * one-or-more representatives per never-gated family (streaming,
#     multimodal, doc search, dedup tail, LLM pipeline, relational).
# Entries beyond #50 keep their original relative order and rotate into
# the gate window in round 4 (tracked in COVERAGE.md).
# ==========================================================================

GATE_BASKET_R3: tuple[str, ...] = (
    # -- SURVEY §2 operator representatives (re-gated from the r2-green set)
    "topk_dot",                 # O4/O8/O9
    "topk_l2",                  # O7
    "topk_f16",                 # O5/O22
    "topk_i8",                  # O6
    "topk_multi_twophase",      # O10-O12/O14
    "gt_build",                 # O16
    "recall_i8_vs_f32",         # O17
    "slice_first_n",            # O2/O20
    "sample_queries",           # O21
    "sanity_stats",             # O24
    "quantize_i8",              # O23
    "quant_error_stats",        # O3
    "refine_i8",                # O29/O32
    "ivf_search",               # O26/O28
    "pq_adc_search",            # O27 (PQ-ADC)
    "opq_learned_refine_search",# O27 (learned OPQ)
    "ivfpq_refine_search",      # O27 (IVF-PQ)
    "csv_chunks_embed",         # O33 end-to-end
    # -- the 9 round-1 failures, never re-gated in round 2
    "pricing_summary",
    "top_revenue_customers",
    "events_running_window",
    "events_sessionize",
    "events_asof_purchase",
    "events_range_join",
    "events_salted_agg",
    "latency_percentiles",      # also O18
    "embedding_neardup_lsh",
    # -- O19
    "scan_cost_model",
    # -- never-gated families: streaming
    "stream_event_counts",
    "stream_dedup",
    "stream_click_attribution",
    "stream_sessionize",
    # -- never-gated families: multimodal
    "multimodal_features",
    "multimodal_frames",
    # -- never-gated families: semantic/lexical doc search
    "doc_search",
    "doc_search_bm25",
    # -- never-gated families: dedup tail
    "dedup_components",
    "simhash64_pairs",
    "corpus_clean",
    # -- never-gated families: LLM training-data pipeline
    "mixture_sample",
    "pack_sequences",
    "pii_redact",
    "decontaminate",
    # -- never-gated families: relational tail
    "events_hypertable_rollup",
    "events_funnel",
    "events_props_variant",
    "events_gapfill",
    "distinct_users_hll",
    "orders_rollup",
    "events_partitioned_scan",
)


def _reorder_registry() -> None:
    missing = [n for n in GATE_BASKET_R3 if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"GATE_BASKET_R3 names unknown entries: {missing}")
    ordered = {n: REGISTRY[n] for n in GATE_BASKET_R3}
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


# ==========================================================================
# Driver-gate basket ordering (round 4) — rotation 1 of 3
#
# Every GATE_BASKET_R3 entry now holds an official driver-green
# CORRECTNESS_r03 row (50/50 pass).  Per the rotation plan
# (COVERAGE.md "Driver-gate window" table, r3 VERDICT item 1), round 4
# swaps positions 51-100 of the r3 order into the gate window: the
# r2-driver-green legacy tail (flat-topk variants, IVF/PQ siblings,
# text/chunk singles, dedup/corpus family, relational tail).  The r3
# basket — already officially verdicted — parks at the END of the
# registry so the remaining never-gated entries (r3's mid-session and
# continuation additions) sit contiguously at positions 51-116, ready
# to become GATE_BASKET_R5/R6 without another shuffle.
# ==========================================================================

GATE_BASKET_R4: tuple[str, ...] = (
    # -- flat-scan top-k variants (r2-green, never re-gated)
    "topk_filtered",
    "topk_cosine",
    "topk_multi_window",
    "embedding_clusters",
    "events_trailing_window",
    # -- IVF / PQ siblings
    "ivf_search_after_add",
    "ivf_search_persisted",
    "ivf_recall_sweep",
    "pq_refine_search",
    "opq_refine_search",
    # -- text analysis singles
    "token_stats",
    "bpe_token_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    # -- chunking / embed pipeline singles
    "chunk_fixed",
    "chunk_words",
    "pipeline_chunks_embed",
    "jsonl_roundtrip",
    "csv_roundtrip",
    # -- dedup / corpus family
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "corpus_release",
    "data_split",
    "bigram_commonness",
    "corpus_upsert",
    "vocab_top_terms",
    "text_normalize",
    "topk_mmr",
    "heavy_hitters_cm",
    "dedup_incremental",
    "simhash_pairs",
    "embedding_neardup_pairs",
    "doc_length_percentiles",
    # -- relational tail
    "shipping_priority",
    "semi_anti_join",
    "distinct_users_sketch",
    "local_supplier_volume",
    "nation_trade_volume",
    "nation_presence",
    "customer_balance_quartiles",
    "brand_margin",
    "order_fulfillment_latency",
    "lineitem_unpivot",
    "returned_items_report",
    "set_ops",
    "events_pivot",
    "events_props_json",
    "doc_search_ivf",
)


def _reorder_registry_r4() -> None:
    missing = [n for n in GATE_BASKET_R4 if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"GATE_BASKET_R4 names unknown entries: {missing}")
    overlap = set(GATE_BASKET_R4) & set(GATE_BASKET_R3)
    if overlap:
        raise RuntimeError(f"GATE_BASKET_R4 repeats r3-verdicted entries: {overlap}")
    officially_gated = set(GATE_BASKET_R3)
    ordered = {n: REGISTRY[n] for n in GATE_BASKET_R4}
    # rotation queue: never-gated entries keep relative order just after
    # the window (GATE_BASKET_R5 = positions 51-100 next round)
    ordered.update(
        (n, e)
        for n, e in REGISTRY.items()
        if n not in ordered and n not in officially_gated
    )
    # entries with official driver rows park at the tail
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry_r4()
