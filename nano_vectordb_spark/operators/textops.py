"""Document-level text operators: chunking and the text->embedding
pipeline plumbing.

Reference surface (SURVEY.md O33, scripts/build_vecbin_chunked.py):
  * sentence/size-aware chunking (:189-225) — here as (a) a fixed-width
    chunker (oracle-backed) and (b) a greedy word-boundary chunker as a
    native higher-order fold (no Python in the loop);
  * deterministic hash-projection embeddings stand in for the
    SentenceTransformer encode (:294-300) so the pipeline is testable
    without model weights — normalized output, like the reference's
    normalize_embeddings=True.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nano_vectordb_spark.functions.text import token_hash_expr, tokens_expr
from nano_vectordb_spark.functions.vector import normalize_expr


def chunk_fixed(
    df: DataFrame, max_chars: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fixed-width character chunking: explode substrings of exactly
    max_chars (last one shorter). Pure narrow transform — chunking 100 TB
    is embarrassingly parallel with zero shuffle."""
    n_chunks = F.ceil(F.length(text_col) / F.lit(max_chars)).cast("int")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "__i"),
            F.col(text_col).alias("__t"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.substring(
                F.col("__t"), F.col("__i") * max_chars + 1, max_chars
            ).alias("chunk"),
        )
        .withColumn("chunk_chars", F.length("chunk"))
    )


def greedy_pack_expr(pieces: Column, max_chars: int) -> Column:
    """Greedy packing of string pieces into space-joined chunks
    <= max_chars, as a native aggregate fold — state is (finished
    chunks, current chunk), merged piece by piece. The fold behind both
    word-boundary and sentence-aware chunking (reference
    build_vecbin_chunked.py:189-225)."""
    zero = F.struct(
        F.lit([]).cast("array<string>").alias("done"), F.lit("").alias("cur")
    )

    def step(acc: Column, x: Column) -> Column:
        cur = acc["cur"]
        joined = F.when(cur == "", x).otherwise(F.concat(cur, F.lit(" "), x))
        fits = F.length(joined) <= max_chars
        # an oversize piece (> max_chars on its own) must not flush an
        # empty current chunk — it becomes its own oversize chunk
        flushed = F.when(cur == "", acc["done"]).otherwise(
            F.concat(acc["done"], F.array(cur))
        )
        return F.struct(
            F.when(fits, acc["done"]).otherwise(flushed).alias("done"),
            F.when(fits, joined).otherwise(x).alias("cur"),
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["cur"] == "", acc["done"]).otherwise(
            F.concat(acc["done"], F.array(acc["cur"]))
        )

    return F.aggregate(pieces, zero, step, finish)


def chunk_words(
    df: DataFrame, max_chars: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Greedy word-boundary chunking <= max_chars."""
    chunks = greedy_pack_expr(tokens_expr(F.col(text_col)), max_chars)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "chunk"),
    ).withColumn("chunk_chars", F.length("chunk"))


SENTENCE_SPLIT = r"(?<=[.!?])\s+"
DEFAULT_HEADING = r"(?m)^#{1,6}\s+"


def split_sections(
    df: DataFrame,
    heading_pattern: str = DEFAULT_HEADING,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Regex section split (reference build_vecbin_chunked.py:144-178):
    documents break at heading matches into (doc_id, section_id,
    section) rows; text without headings is one section."""
    strip = lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")
    parts = F.filter(
        F.transform(F.split(F.col(text_col), heading_pattern), strip),
        lambda s: s != "",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(parts).alias("section_id", "section"),
    )


def chunk_sentences(
    df: DataFrame,
    max_chars: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-aware chunking <= max_chars (reference
    build_vecbin_chunked.py:189-225): split at sentence boundaries,
    greedily pack whole sentences; a sentence longer than max_chars
    becomes its own oversize chunk (never split mid-sentence)."""
    sentences = F.filter(
        F.transform(F.split(F.col(text_col), SENTENCE_SPLIT), F.trim),
        lambda s: s != "",
    )
    chunks = greedy_pack_expr(sentences, max_chars)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "chunk"),
    ).withColumn("chunk_chars", F.length("chunk"))


def hash_embed_fold(
    df: DataFrame,
    dim: int,
    text_col: str = "chunk",
    out_col: str = "embedding",
) -> DataFrame:
    """Executable spec for hash_embed as pure Catalyst higher-order
    folds — the form every oracle SQL mirrors. Kept as the equivalence
    oracle for the vectorized fast path (tests/test_textops.py pins
    hash_embed ≡ hash_embed_fold bit-for-bit); O(dim × tokens) work per
    row, so the fast path is what callers use."""
    toks = tokens_expr(F.col(text_col))
    # materialize the (bucket, weight) pairs as real columns first —
    # referencing the transform expression from each of the `dim`
    # aggregates would recompute the md5 token hashes dim times per row
    staged = df.withColumn("__toks", toks).withColumn(
        "__buckets",
        F.transform(
            F.col("__toks"),
            lambda x, i: F.struct(
                (token_hash_expr(x) % dim).cast("int").alias("b"),
                (F.lit(1.0) / (i + 1).cast("double")).alias("w"),
            ),
        ),
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            F.col("__buckets"),
            F.lit(0.0),
            lambda acc, s: acc + F.when(s["b"] == d, s["w"]).otherwise(F.lit(0.0)),
        ),
    )
    staged = staged.withColumn("__raw", raw)
    # all-zero rows (no tokens) stay zero instead of dividing by 0;
    # null text is NULL out (not an array of dim NULLs), matching the
    # vectorized hash_embed path's contract exactly
    safe = (
        F.when(F.col(text_col).isNull(), F.lit(None).cast("array<double>"))
        .when(F.size("__toks") == 0, F.col("__raw"))
        .otherwise(normalize_expr(F.col("__raw")))
    )
    return staged.withColumn(out_col, safe).drop("__toks", "__buckets", "__raw")


def hash_embed(
    df: DataFrame,
    dim: int,
    text_col: str = "chunk",
    out_col: str = "embedding",
) -> DataFrame:
    """Deterministic hash-projection embedding: each token adds weight
    1/(pos+1) to bucket (md5-prefix token_hash mod dim); the result is
    L2-normalized. A testable stand-in for the model encode step of the
    reference pipeline (O33) with the same shape contract: fixed dim,
    normalized, order-sensitive.

    Implementation is an Arrow-batched pandas UDF, BIT-IDENTICAL to the
    Catalyst fold spec (hash_embed_fold, which the DuckDB oracles
    mirror) by construction:
      * per-bucket weights accumulate in token order (np.add.at applies
        repeated indices sequentially), and the fold's `acc + 0.0` for
        non-matching tokens is exact in IEEE754, so both produce the
        same left-to-right partial-sum sequence per bucket;
      * the norm is a sequential left fold of x*x in array order (a
        Python loop — np.sum's pairwise summation would round
        differently), then one correctly-rounded sqrt and an
        elementwise divide.
    The fold form is O(dim × tokens) expression evaluations per row —
    measured 30×+ slower at dim=64 on long documents — while this path
    hashes each UNIQUE token once per batch and does O(tokens + dim)
    float work per row, JVM→Python transfer Arrow-batched."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _embed(texts: pd.Series) -> pd.Series:
        import hashlib
        import math

        import numpy as np

        buckets: dict[str, int] = {}

        def bucket(tok: str) -> int:
            b = buckets.get(tok)
            if b is None:
                b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:7], 16) % dim
                buckets[tok] = b
            return b

        out: list = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            toks = [t for t in text.split(" ") if t]
            raw = np.zeros(dim, dtype=np.float64)
            if toks:
                idx = np.fromiter(
                    (bucket(t) for t in toks), dtype=np.int64, count=len(toks)
                )
                np.add.at(raw, idx, 1.0 / np.arange(1.0, len(toks) + 1.0))
                s = 0.0
                for v in raw.tolist():
                    s += v * v
                # math.sqrt is IEEE-754 correctly rounded on every
                # platform; s**0.5 routes through libm pow, whose
                # last-ulp is only guaranteed on recent glibc — the
                # fold spec uses F.sqrt (Java Math.sqrt, correctly
                # rounded), so this must match it exactly
                raw = raw / math.sqrt(s)
            out.append(raw)
        return pd.Series(out)

    return df.withColumn(out_col, _embed(F.col(text_col)))
