"""Dataset slicing and query sampling.

Reference surface (SURVEY.md §2.1):
  O20 slice first-n rows   (tools/nvdb_slice.cpp:27-75)
  O21 query sampling       (tools/nvdb_make_query.cpp:56-75 — seeded
      uniform sample without replacement, or first-n)

The reference's mt19937 stream is not reproducible across engines, so
the seeded mode here uses a deterministic keyed hash (md5 of the row id
with the seed) as the sort key — same "uniform, seeded, no replacement"
contract, and bit-reproducible in any engine that has md5. The global
row_number window only ever sees the q sampled rows (q is small by the
same contract that makes queries broadcastable), never the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def slice_first_n(df: DataFrame, n: int, id_col: str = "vec_id") -> DataFrame:
    """First n rows by stable id (reference O20)."""
    return df.orderBy(F.col(id_col).asc()).limit(n)


def sample_queries(
    df: DataFrame,
    q: int,
    seed: int = 42,
    mode: str = "random",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Seeded uniform sample of q rows without replacement (reference O21),
    renumbered query_id 0..q-1 in sample order."""
    if mode == "first":
        key = F.col(id_col)
    elif mode == "random":
        key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    else:
        raise ValueError(f"mode must be 'first' or 'random', got {mode!r}")
    picked = (
        df.select(key.alias("__key"), F.col(id_col).alias("source_vec_id"), F.col(vec_col))
        .orderBy(F.col("__key").asc(), F.col("source_vec_id").asc())
        .limit(q)
    )
    w = Window.orderBy(F.col("__key").asc(), F.col("source_vec_id").asc())
    return picked.select(
        (F.row_number().over(w) - 1).cast("long").alias("query_id"),
        "source_vec_id",
        F.col(vec_col).alias("embedding"),
    )
