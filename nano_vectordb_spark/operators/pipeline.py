"""Training-data pipeline operators: stratified sampling, source
mixture weighting, and sequence packing.

These extend the reference's dataset-prep tooling (tools/nvdb_slice.cpp,
tools/nvdb_make_query.cpp — take deterministic subsets of a corpus) to
the operations an LLM pretraining pipeline runs at corpus scale:

  * stratified_sample — seeded n-per-stratum sample (the per-language /
    per-source analog of the reference's seeded query sampling,
    tools/nvdb_make_query.cpp:56-75);
  * mixture_weights / mixture_sample — given target mixture shares per
    source, compute per-source keep rates (downsample-only policy) and
    realize them with a deterministic keyed-hash Bernoulli filter;
  * pack_sequences — greedy bin-packing of documents into fixed
    token-budget training sequences, parallel across hash buckets.

Determinism rules (cross-engine oracle parity): all randomness is a
keyed md5 hash, never an engine RNG; the packing fold is sequential per
bucket in doc_id order, so the result is independent of partitioning.

Scale notes: stratified_sample is one shuffle on the stratum key (the
per-stratum top-n never materializes more than n rows per stratum past
the window); mixture_sample is a map-only filter against a broadcast
rate table; pack_sequences parallelizes across `n_buckets` independent
greedy folds — at 100 TB you raise n_buckets so each bucket's doc list
fits an executor (packing quality is per-bucket greedy either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 28
HASH_SPACE = float(1 << HASH_BITS)


def _hash_key(seed: int, id_col: str) -> F.Column:
    """Keyed md5 hex sort key — same recipe as operators/sample.py."""
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))


def _hash_frac(seed: int, id_col: str) -> F.Column:
    """Deterministic uniform u in [0, 1): 28-bit md5 prefix / 2^28."""
    u = F.conv(F.substring(_hash_key(seed, id_col), 1, 7), 16, 10).cast("long")
    return u.cast("double") / F.lit(HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Seeded uniform sample of n rows per stratum, without replacement.

    Each stratum's rows are ranked by a keyed hash of the row id (ties
    broken by id), and the first n kept — uniform within the stratum,
    reproducible in any engine with md5. One shuffle on the stratum key;
    rows beyond rank n are dropped map-side after the window.
    """
    key = _hash_key(seed, id_col)
    w = Window.partitionBy(stratum_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def seeded_shuffle(
    df: DataFrame,
    seed: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus shuffle into training shards.

    Pretraining wants a reproducible global permutation of the corpus
    per epoch. A single global rank is a one-reducer funnel, so the
    scale shape is the standard shard shuffle: a keyed md5 assigns each
    row a shard (pmod of the hash) and a position within the shard
    (row_number over the hash order) — n_shards independent window
    sorts, one shuffle on the shard key, no global bottleneck. Readers
    consume shards in any order; within-shard order is the permutation.
    Reproducible in any engine with md5 (same recipe as
    stratified_sample); change `seed` per epoch for a fresh permutation.
    """
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__k").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__k", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("__k")
    )


def mixture_weights(
    docs: DataFrame,
    target_shares: dict[str, float],
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-source mixture plan: token counts, natural share, target
    share, and the keep rate that realizes the target mixture by
    downsampling only (the source whose target/natural ratio is highest
    keeps rate 1.0; every other source is thinned proportionally).

    One aggregation shuffle on the source key; the share/rate math runs
    over the tiny per-source aggregate.
    """
    total = sum(target_shares.values())
    tgt = F.create_map(
        *[x for s, v in sorted(target_shares.items()) for x in (F.lit(s), F.lit(v / total))]
    )
    per_src = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(tokens_col)).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return (
        per_src.withColumn(
            "natural_share",
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(w).cast("double"),
        )
        .withColumn("target_share", tgt[F.col(source_col)])
        .withColumn("rate_raw", F.col("target_share") / F.col("natural_share"))
        .withColumn("keep_rate", F.col("rate_raw") / F.max("rate_raw").over(w))
        .drop("rate_raw")
    )


def mixture_sample(
    docs: DataFrame,
    weights: DataFrame,
    seed: int = 42,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Realize a mixture plan: keep each doc iff its deterministic
    keyed-hash uniform falls under its source's keep rate. Map-only
    against a broadcast rate table — no shuffle of the corpus."""
    rates = F.broadcast(weights.select(source_col, "keep_rate"))
    return (
        docs.join(rates, source_col)
        .filter(_hash_frac(seed, id_col) < F.col("keep_rate"))
        .drop("keep_rate")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_buckets: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: assign whole documents to fixed
    token-budget packs, never splitting a document.

    Documents are routed to `n_buckets` independent buckets by id hash
    (doc_id % n_buckets) and packed greedily within each bucket in
    doc_id order: a document opens a new pack when adding it would
    exceed the budget (an oversize document becomes its own over-budget
    pack). The fold is a native JVM higher-order aggregate over the
    bucket's sorted (doc_id, n_tokens) list — sequential and therefore
    partitioning-independent, the same contract as the greedy chunking
    fold (operators/textops.py:greedy_pack_expr).

    Returns one row per pack: bucket, pack_id, n_docs, pack_tokens,
    doc_ids (comma-joined, in pack order).

    Scale: buckets are embarrassingly parallel; each bucket's doc list
    is materialized on one executor, so n_buckets is the scale knob —
    size it so total_tokens / n_buckets fits comfortably in task memory.
    """
    entries = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("doc_id"),
                F.col(tokens_col).cast("long").alias("n_tokens"),
            )
        )
    )
    zero = F.struct(
        F.lit(-1).alias("pack"),
        F.lit(budget + 1).cast("long").alias("acc"),
        F.lit([]).cast("array<struct<doc_id:bigint,n_tokens:bigint,pack:int>>").alias("out"),
    )

    def step(a: F.Column, x: F.Column) -> F.Column:
        opens = (a["acc"] + x["n_tokens"]) > F.lit(budget).cast("long")
        pack = F.when(opens, a["pack"] + 1).otherwise(a["pack"])
        acc = F.when(opens, x["n_tokens"]).otherwise(a["acc"] + x["n_tokens"])
        row = F.struct(
            x["doc_id"].alias("doc_id"),
            x["n_tokens"].alias("n_tokens"),
            pack.alias("pack"),
        )
        return F.struct(
            pack.alias("pack"),
            acc.alias("acc"),
            F.concat(a["out"], F.array(row)).alias("out"),
        )

    packed = (
        docs.select(
            (F.col(id_col) % n_buckets).alias("bucket"),
            F.col(id_col).alias("doc_id"),
            F.col(tokens_col),
        )
        .groupBy("bucket")
        .agg(F.aggregate(entries, zero, step, lambda a: a["out"]).alias("assign"))
        .select("bucket", F.explode("assign").alias("a"))
        .select("bucket", "a.doc_id", "a.n_tokens", F.col("a.pack").alias("pack_id"))
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.array_join(
            F.array_sort(F.collect_list(F.col("doc_id"))).cast("array<string>"), ","
        ).alias("doc_ids"),
    )
