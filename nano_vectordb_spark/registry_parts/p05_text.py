"""Text analysis over `documents` (reference analog O33).

Sequential part of the registry — see registry.py (facade).
"""
from __future__ import annotations
from nano_vectordb_spark.registry_parts.p00_base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _ser_f32_col,
    _sql_ser_f32,
    load_table,
    register,
    text_ops,
    tx,
)
from nano_vectordb_spark.registry_parts.p03_ivf import _materialize_once  # noqa: F401

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
# r12: vectorized-scoring witness — the integer profile layer gated raw
# --------------------------------------------------------------------------


@register(
    "token_profile_counts",
    oracle=f"""
WITH t AS ({_SQL_TOKS})
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_filter(toks, x -> list_contains([{_SQL_EN_STOP}], x))) AS INT) AS sw_hits,
       {_sql_marker_hits("en")} AS en_hits,
       {_sql_marker_hits("de")} AS de_hits,
       {_sql_marker_hits("es")} AS es_hits,
       {_sql_marker_hits("fr")} AS fr_hits,
       CAST(length(lower(text)) AS INT) AS prof_chars,
       CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS INT) AS n_punct
FROM t
""",
)
def token_profile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 one-pass Arrow profile (functions/text.token_profile_udf)
    gated at its RAW integer layer: token count, stopword hits, the
    four language-marker hit counts, and the char/punct lengths that
    feed punct_ratio. This is the witness that the vectorized scoring
    path (scored_docs — corpus_clean's quality/lang stage since r12)
    computes the exact counts the expression/oracle semantics define,
    BEFORE any float composition: every downstream score is a pure
    JVM-side arithmetic function of these eight integers."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__p", tx.token_profile_udf()("text")
    )
    p = F.col("__p")
    return d.select(
        "doc_id",
        p["n_tokens"].alias("n_tokens"),
        p["sw_hits"].alias("sw_hits"),
        p["en_hits"].alias("en_hits"),
        p["de_hits"].alias("de_hits"),
        p["es_hits"].alias("es_hits"),
        p["fr_hits"].alias("fr_hits"),
        p["n_chars"].alias("prof_chars"),
        p["n_punct"].alias("n_punct"),
    )
