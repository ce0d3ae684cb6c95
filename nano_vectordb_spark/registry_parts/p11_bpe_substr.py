"""BPE merge learning, exact-substring spans, EWMA, multimodal near-dup.

Sequential part of the registry — see registry.py (facade).
"""
from __future__ import annotations
from nano_vectordb_spark.registry_parts.p00_base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    dedup_ops,
    load_table,
    register,
    tx,
)
from nano_vectordb_spark.registry_parts.p03_ivf import _ORACLE_SF, _fit_cached  # noqa: F401
from nano_vectordb_spark.registry_parts.p00_base import _sql_view_query  # noqa: F401
from nano_vectordb_spark.registry_parts.p10_quant_variants import _SQL_EVENTS_ANOMALY  # noqa: F401

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

    # r13 (guide §2): single-file source -> one scan partition -> the
    # signature pass AND the blocked join's probe side ran
    # single-threaded; _spread is a no-op on multi-file sources
    docs = dedup_ops._spread(load_table(spark, sf_dir, "documents"))
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
        F.floor(F.col("byte_len") / _MMND_BUCKET).alias("bk_y"),
    )
    l1 = F.aggregate(
        F.zip_with("hist", "hist_y", lambda p, q: F.abs(p - q)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # r13 (guide §3): the integer length bound rides IN the join
    # condition, so the 16-term interpreted L1 fold (the expensive
    # predicate — higher-order folds never enter codegen) prices only
    # pairs already within the length threshold instead of every
    # same-bucket pair; the emitted pair set is unchanged (the length
    # filter was always applied, just after the fold).
    return (
        probes.join(
            home,
            (F.col("bk") == F.col("bk_y"))
            & (F.abs(F.col("byte_len") - F.col("len_y")) <= _MMND_LEN)
            & (F.col("doc_id") != F.col("doc_id_y")),
        )
        .withColumn("l1_dist", l1)
        .withColumn("len_diff", F.abs(F.col("byte_len") - F.col("len_y")))
        .filter(F.col("l1_dist") <= _MMND_L1)
        .select(
            F.least("doc_id", "doc_id_y").alias("doc_id_a"),
            F.greatest("doc_id", "doc_id_y").alias("doc_id_b"),
            "l1_dist",
            "len_diff",
        )
        .distinct()
    )


