"""Text analysis column expressions for the LLM-data-pipeline extensions.

The reference's only text processing is the CSV -> chunk -> embed
pipeline (SURVEY.md O33, scripts/build_vecbin_chunked.py:144-225). This
module generalizes it into the operator family a training-data pipeline
needs: tokenization, language-ID, quality scoring, token counting, and
document fingerprinting — all as native (codegen'd) expressions, all
deterministic across engines:

  * tokens = whitespace split, empties dropped;
  * token hashes come from md5 hex (28-bit slices) so any engine with
    md5 reproduces them bit-for-bit — never engine-specific hash();
  * ratios/scores use a fixed operation order so doubles match the
    oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

FP_MOD = 2_147_483_647  # 2^31 - 1

# Marker vocabularies for the language-ID heuristic (letter-frequency /
# stopword n-gram approach; deterministic and SQL-expressible).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "los", "las", "una", "es", "y", "que", "por"),
    "fr": ("le", "les", "des", "et", "est", "une", "dans", "que"),
}

EN_STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"] + ("that", "for", "on", "with")


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens_expr(text: ColumnOrName) -> Column:
    """Whitespace tokens with empties removed."""
    return F.filter(F.split(_col(text), " "), lambda x: x != "")


def token_hash_expr(tok: Column) -> Column:
    """Deterministic 28-bit token hash from the md5 hex prefix —
    reproducible in any engine with md5 (cf. DuckDB's hex cast)."""
    return F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long")


def marker_hits_expr(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that appear in a marker vocabulary."""
    lit = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda x: F.array_contains(lit, x)))


def lang_pred_expr(en: Column, de: Column, es: Column, fr: Column) -> Column:
    """Argmax with the fixed tie-break order en > de > es > fr (same
    CASE cascade in the oracle SQL)."""
    return (
        F.when((en >= de) & (en >= es) & (en >= fr), F.lit("en"))
        .when((de >= es) & (de >= fr), F.lit("de"))
        .when(es >= fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def fingerprint_expr(toks: Column) -> Column:
    """Order-sensitive document fingerprint: position-weighted rolling
    hash sum(token_hash_i * (i mod 64 + 1)) mod (2^31-1), i zero-based.
    Terms stay < 2^34 and the sum < 2^63, so no overflow under ANSI
    semantics; the same arithmetic runs in the oracle."""
    weighted = F.transform(
        toks, lambda x, i: token_hash_expr(x) * ((i % 64) + 1).cast("long")
    )
    return (
        F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x) % FP_MOD
    )


def punct_ratio_expr(text: ColumnOrName) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    t = F.lower(_col(text))
    n = F.length(t)
    stripped = F.length(F.regexp_replace(t, "[a-z0-9 ]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stripped.cast("double") / n.cast("double")
    )


def stopword_ratio_expr(toks: Column) -> Column:
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        marker_hits_expr(toks, EN_STOPWORDS).cast("double") / n.cast("double")
    )


def quality_expr(toks: Column, text: ColumnOrName) -> Column:
    """Composite quality score in [0, 1]: length saturation, low
    stopword share, low punctuation share. Fixed op order for parity."""
    n = F.size(toks)
    length_term = F.least(F.lit(1.0), n.cast("double") / F.lit(64.0))
    return (
        F.lit(0.5) * length_term
        + F.lit(0.3) * (F.lit(1.0) - stopword_ratio_expr(toks))
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio_expr(text))
    )


def ngrams_expr(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty when len(toks) < n.

    Guarded with `when` because Spark's `sequence(1, m)` produces a
    DESCENDING [1, 0] when m = 0 — the naive form would fabricate
    grams for short docs.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def max_run_expr(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a
    sorted array (0 for empty). A native fold — the zero-shuffle way
    to get "count of the most frequent element" per row, vs the
    explode + groupBy plan that shuffles every n-gram. Elements must
    be non-empty strings ("" is the run sentinel).
    """
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, acc0, merge, lambda acc: acc["best"])


def dup_run_total_expr(sorted_arr: Column) -> Column:
    """Total count of elements that belong to runs of length > 1 in a
    sorted array — i.e. how many n-gram occurrences are duplicated
    within the document (Gopher-style repetition signal). Same
    zero-shuffle fold shape as max_run_expr.
    """
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def merge(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        flushed = acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["dup"]).otherwise(flushed).alias("dup"),
        )

    return F.aggregate(
        sorted_arr,
        acc0,
        merge,
        lambda acc: acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0)),
    )
