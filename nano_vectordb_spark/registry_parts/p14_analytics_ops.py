"""Operational analytics: partition planning, churn, control charts, RFM, Benford, A/B, survival.

Sequential part of the registry — see registry.py (facade).
"""
from __future__ import annotations
from nano_vectordb_spark.registry_parts.p00_base import (  # noqa: F401
    DataFrame,
    F,
    REGISTRY,
    SEED,
    SparkSession,
    Window,
    _math,
    grank,
    load_table,
    register,
    tx,
)
from nano_vectordb_spark.registry_parts.p06_dedup import _UPSERT_MOD  # noqa: F401
from nano_vectordb_spark.registry_parts.p09_pipeline_corpus import _BM25_QUERIES  # noqa: F401
from nano_vectordb_spark.registry_parts.p10_quant_variants import knn_self_join  # noqa: F401
from nano_vectordb_spark.registry_parts.p13_analytics_graph import (  # noqa: F401
    _RPP_P,
    _SQL_RANGE_PARTITION,
)

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




# Registered in r8 (r6 VERDICT item 8 queued it; freeze lifted):
# small-files compaction witness — the measured 46 s -> 9.15 s
# streaming-read win at sf100 (PERF.md, sources/compact.py),
# oracle-witnessed.
_SQL_COMPACT_STATS = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       TRUE AS rows_preserved,
       TRUE AS hash_preserved,
       TRUE AS layout_ok
FROM events
"""


def _compact_scratch(sf_dir: str) -> str:
    """Content-addressed scratch dir (the _csv_docs_path staleness
    rule: keyed by the source parquet's stat, so a /tmp layout written
    from a previous testdata generation is never reused)."""
    import hashlib
    import os as _os

    st = _os.stat(_os.path.join(sf_dir, "events.parquet"))
    key = f"compact:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    return "/tmp/nvdb_compact_" + hashlib.md5(key.encode()).hexdigest()[:8]


@register("compact_stats", oracle=_SQL_COMPACT_STATS)
def compact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction round-trip witness (sources/compact.py —
    the OPTIMIZE/bin-packing step every table-format deployment
    schedules; measured 5x streaming-read win at sf100 in PERF.md).
    Compacts the events table to ~1 MB files in a content-addressed
    scratch dir and hashes: the EXACT row count of the rewritten table
    (cross-engine: the oracle counts the source — compaction must be
    lossless), plus IN-PLAN booleans — source/destination row counts
    equal, order-independent full-row xxhash64 fingerprint equal
    (compaction may reorder rows across files, never change them), and
    the output file count equal to plan_compaction's target (the
    layout the rewrite promised is the layout it delivered).
    Scale shape: one distributed read + one round-robin repartition +
    one distributed write; the only driver work is the file listing."""
    import os as _os

    from nano_vectordb_spark.sources import compact as compact_src

    dst = _compact_scratch(sf_dir)
    planned = compact_src.plan_compaction(
        _os.path.join(sf_dir, "events.parquet"), target_mb=1
    )
    out = compact_src.compact_table(spark, sf_dir, dst, "events", target_mb=1)
    src = spark.read.parquet(_os.path.join(sf_dir, "events.parquet"))

    def fingerprint(df: DataFrame):
        # order-independent: per-row xxhash64 over every column, summed
        # (sum is commutative; files/partitions may reorder rows)
        row = df.select(
            F.xxhash64(*[F.col(c) for c in sorted(df.columns)]).alias("h")
        )
        # sum as decimal(38,0): 50k 64-bit hashes overflow a long sum
        # under ANSI mode
        r = row.agg(
            F.count("*").alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("fp"),
        ).first()
        return int(r["n"]), int(r["fp"])

    n_src, fp_src = fingerprint(src)
    n_dst, fp_dst = fingerprint(out)
    n_files = len(
        [
            f
            for f in _os.listdir(_os.path.join(dst, "events.parquet"))
            if f.endswith(".parquet")
        ]
    )
    return spark.createDataFrame(
        [
            (
                n_dst,
                bool(n_src == n_dst),
                bool(fp_src == fp_dst),
                bool(n_files == planned),
            )
        ],
        "n_rows long, rows_preserved boolean, hash_preserved boolean, layout_ok boolean",
    )
