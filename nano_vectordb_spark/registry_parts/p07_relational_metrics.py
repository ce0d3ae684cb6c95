"""Metrics aggregation (O18/O19) + relational/window coverage.

Sequential part of the registry — see registry.py (facade).
"""
from __future__ import annotations
from nano_vectordb_spark.registry_parts.p00_base import (  # noqa: F401
    _sql_view_query,
    DataFrame,
    F,
    SparkSession,
    load_table,
    metrics_ops,
    register,
)
from nano_vectordb_spark.registry_parts.p03_ivf import _materialize_once  # noqa: F401

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
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99,
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


# TPC-H Q1 shape: float money is summed in DECIMAL (exact, order-
# independent) and cast to double at the end so both engines emit the
# same doubles regardless of aggregation order.
#
# sum_charge's THREE-factor product uses NARROW casts on purpose: with
# (18,2)x(18,3)x(18,3) the result precision (56) exceeds both engines'
# decimal-38 cap and each rounds intermediates by its own rule — the
# sums then differ at ~1e-6, which the final DOUBLE exposes once the
# aggregate passes ~1e10 (caught by the r5 sf1 parity run; invisible
# at sf0.1 magnitudes). (12,2)x(4,3)x(4,3) -> scale-8 precision 22
# stays exact end-to-end in both engines (price < 1e6, |disc|,|tax|
# < 1, checked against the fixtures). Two-factor products never
# overflow 38 and keep the original wide casts.
#
# The product sums ALSO round to scale 3 before the DOUBLE cast: a
# DECIMAL whose unscaled value exceeds 2^53 (sum ~2.8e10 at scale 8 =
# 2.8e18) converts through engine-specific int->double->descale paths
# that can land one ulp apart even from IDENTICAL decimals. At scale 3
# the unscaled value (~2.8e13) is exactly representable, so the cast is
# a single correctly-rounded step in both engines — bit-identical.
_SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS count_order,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))), 3) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.0 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3))) * (CAST(1.0 AS DECIMAL(4,3)) + CAST(l_tax AS DECIMAL(4,3)))), 3) AS DOUBLE) AS sum_charge,
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


_SQL_SKETCH = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_daily_sketches,
       TRUE AS within_5pct
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("distinct_users_sketch", oracle=_SQL_SKETCH)
def distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (DataSketches HLL via
    hll_sketch_agg): one sketch per (day, event_type), then the monthly
    per-type estimate by UNIONING the daily sketches — the 100 TB
    pattern: sketches pre-aggregate per partition/day and re-aggregate
    without rescanning, unlike exact COUNT(DISTINCT). The raw estimate
    is library-specific (no SQL form), so the DRIVER-VISIBLE contract
    hashes the exact count plus an in-plan ``within_5pct`` assertion:
    the sketch estimate must land within 5% relative error of the exact
    distinct count — ~3x the default lgK=12 HLL rse of ~1.6%, so the
    bound sits at >=3 sigma and stays deterministic under future
    fixtures/replicas (measured ≤0.8% on every current fixture). A
    wrong sketch flips the boolean and fails the value-hash — the estimator is gated, not just row-counted. Raw
    estimates remain available via the engine-independent sibling
    distinct_users_hll."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    monthly = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx"),
        F.count("*").alias("n_daily_sketches"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct_users")
    )
    return (
        monthly.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct_users",
            "n_daily_sketches",
            (
                F.abs(F.col("approx") - F.col("exact_distinct_users"))
                <= 0.05 * F.col("exact_distinct_users")
            ).alias("within_5pct"),
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


