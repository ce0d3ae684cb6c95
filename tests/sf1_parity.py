"""Oracle parity at sf1 (10x the bench scale): run a curated subset of
registry entries against their DuckDB oracles on the /tmp/nvdb_sf1
scale fixture (tests/make_sf1.py).

Correctness is officially gated at sf0.01; this run extends the
evidence to 10x the bench scale for every entry whose oracle SQL is
PURE — derived from the data alone. Excluded by construction: the ANN
family (centroid/codebook/rotation/hyperplane literals are fitted on
the sf0.01/sf0.1 fixtures and embedded in the SQL, so their oracles
only replay at the fitted sf) and fixture-bound demos (late-data file
layout, scratch artifacts).

Run: python tests/make_sf1.py && python tests/sf1_parity.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/nvdb_sf1")

# data-derived-oracle entries spanning every non-ANN family
PURE_ORACLE_ENTRIES = (
    # relational / TPC-H shapes
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "top_revenue_customers",
    "semi_anti_join",
    "set_ops",
    "events_pivot",
    "customer_balance_quartiles",
    "orders_above_customer_avg",
    "brand_margin",
    "returned_items_report",
    # global-rank two-phase consumers (the r3 scale-killer fixes)
    "revenue_gini",
    "revenue_pareto",
    "customer_rfm_segments",
    # text analysis
    "token_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "vocab_top_terms",
    "doc_length_percentiles",
    # dedup family (md5-derived permutations replay in SQL).
    # ngram_jaccard_pairs and simhash_pairs are EXCLUDED here: their
    # oracles verify against ALL-PAIRS on purpose (the strongest
    # exactness check at sf0.01) — at 50k sf1 docs that is 1.25e9
    # list-intersections in DuckDB, hours of oracle CPU for no extra
    # signal. minhash_lsh_pairs' oracle replays the banded inverted
    # index, so it scales and stays in.
    "dedup_exact",
    "minhash_lsh_pairs",
    "data_split",
    # sketches (md5 hash families replay in SQL)
    "heavy_hitters_cm",
    "distinct_users_sketch",
    # events / sessionization / windows
    "events_sessionize",
    "events_range_join",
    "events_salted_agg",
    "latency_percentiles",
    # streaming (batch-parity oracles)
    "stream_event_counts",
    "stream_dedup",
)


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    if not os.path.exists(os.path.join(SF1, "_DONE")):
        print(f"sf1 fixture missing — run tests/make_sf1.py first ({SF1})")
        sys.exit(2)

    import duckdb

    import __spark_entry__ as E
    from nano_vectordb_spark.session import get_spark
    from tests.oracle_harness import compare

    spark = get_spark(app_name="nvdb-sf1-parity", cpus="32")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        path = os.path.join(SF1, f"{t}.parquet")
        # dir layout (Spark write) needs a part-file glob; single file
        # reads directly
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    qs, osql = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    # explicit argv names override the curated list (callers vet purity)
    targets = tuple(sys.argv[1:]) or PURE_ORACLE_ENTRIES
    for name in targets:
        t0 = time.time()
        try:
            ok, msg = compare(qs[name](spark, SF1), con, osql[name])
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXC {exc}"
        dt = time.time() - t0
        status = "PASS" if ok else f"FAIL {msg[:300]}"
        print(f"{name:32s} {status} ({dt:.2f}s)", flush=True)
        n_pass += ok
        n_fail += not ok
    print(f"SF1 PARITY TOTAL: {n_pass} pass / {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
