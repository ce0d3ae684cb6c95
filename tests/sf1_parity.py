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

# Data-derived-oracle entries spanning every non-ANN family — 176 of
# the 220 registry entries. The 44 outside this list, with reasons:
#   * ANN family (~30): oracle SQL embeds centroid/codebook/rotation/
#     hyperplane literals FITTED on the sf0.01/0.1 fixtures, so the
#     oracle only replays at the fitted sf (ivf_*, pq_*, opq_*,
#     sq8_search, lsh_multiprobe_search, embedding_clusters,
#     embedding_neardup_lsh, doc_search_ivf, ann_cost_frontier, ...).
#   * Fitted-table oracles: bpe_learn_merges / bpe_encode_stats,
#     mixture_weights / mixture_sample, cluster_topics, filter_funnel,
#     hybrid_search_rrf, doc_search_bm25, bm25_score_explain,
#     rankers_agreement, benford_price_audit, bloom_join_prune,
#     fanout_tail_amplification, federated_format_audit — the SQL
#     embeds constants derived from the fixture (vocab encodings,
#     mixture rates, fitted topics), which the 10x corpus invalidates.
#   * All-pairs oracles (cost, not validity): ngram_jaccard_pairs and
#     simhash_pairs verify against ALL-PAIRS on purpose (strongest
#     exactness check at sf0.01) — 1.25e9 list-intersections at 50k
#     docs; knn_pagerank and lsh_operating_point similarly replay
#     exact all-pairs kNN / collision tables. Their Spark sides are
#     the banded/bucketed scale paths, whose sf1 runtime the bench
#     measures directly.
PURE_ORACLE_ENTRIES = (
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
    "revenue_gini",
    "revenue_pareto",
    "customer_rfm_segments",
    "token_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "vocab_top_terms",
    "doc_length_percentiles",
    "dedup_exact",
    "minhash_lsh_pairs",
    "data_split",
    "heavy_hitters_cm",
    "distinct_users_sketch",
    "events_sessionize",
    "events_range_join",
    "events_salted_agg",
    "latency_percentiles",
    "stream_event_counts",
    "stream_dedup",
    "multimodal_wav_stats",
    "quality_filter_quantile",
    "latency_quantiles_counting",
    "schema_evolution_read",
    "dedup_keep_longest",
    "lang_id_confusion",
    "hard_negative_mining",
    "incremental_stats_merge",
    "corpus_history_scd2",
    "dow_seasonality",
    "vocab_drift_js",
    "price_index_laspeyres",
    "simpson_paradox_audit",
    "vocab_growth_heaps",
    "zipf_slope",
    "bpe_token_stats",
    "corpus_release",
    "nation_trade_volume",
    "topk_l2",
    "slice_first_n",
    "csv_chunks_embed",
    "multimodal_features",
    "pack_sequences",
    "events_gapfill",
    "multimodal_ppm_stats",
    "token_length_histogram",
    "search_quality_i8",
    "stream_heavy_hitters",
    "neardup_rate_by_source",
    "pmi_collocations",
    "dq_validation_suite",
    "user_value_twa",
    "prefix_filter_join",
    "event_markov_transitions",
    "error_rate_control_chart",
    "locf_imputation",
    "holt_forecast_daily",
    "price_dispersion_by_part",
    "doc_skyline",
    "chunk_fixed",
    "bigram_commonness",
    "nation_presence",
    "topk_f16",
    "sample_queries",
    "events_running_window",
    "multimodal_frames",
    "pii_redact",
    "distinct_users_hll",
    "stream_dedup_ingest",
    "radius_search",
    "topk_matryoshka",
    "events_anomaly_topk",
    "embedding_dim_stats",
    "user_activity_skew",
    "quality_signal_corr",
    "neardup_graph_stats",
    "value_drift_ks",
    "event_type_trend",
    "range_partition_plan",
    "user_budget_clamp",
    "event_top_paths",
    "order_count_dispersion",
    "mixture_waterfill",
    "topk_filtered",
    "chunk_words",
    "corpus_upsert",
    "order_fulfillment_latency",
    "topk_i8",
    "sanity_stats",
    "events_asof_purchase",
    "doc_search",
    "decontaminate",
    "orders_rollup",
    "sample_stratified",
    "topk_binary_rescore",
    "corpus_snapshot_diff",
    "user_value_ewma",
    "corpus_report",
    "pack_efficiency",
    "orders_cube",
    "chunk_words_udtf",
    "max_concurrent_sessions",
    "churn_training_set",
    "ab_test_conversion",
    "attribution_model_compare",
    "event_entropy_rate",
    "source_lang_independence",
    "topk_cosine",
    "pipeline_chunks_embed",
    "text_normalize",
    "lineitem_unpivot",
    "topk_multi_twophase",
    "quantize_i8",
    "scan_cost_model",
    "dedup_components",
    "events_hypertable_rollup",
    "events_partitioned_scan",
    "corpus_shuffle",
    "orc_roundtrip",
    "user_retention_cohorts",
    "multimodal_neardup",
    "minhash_estimator_error",
    "zorder_skipping",
    "sliding_distinct_users",
    "event_pattern_match",
    "weighted_sample_docs",
    "event_assoc_rules",
    "trimmed_mean_value",
    "km_survival_curve",
    "stream_late_drop",
    "error_purchase_xcorr",
    "containment_pairs",
    "topk_multi_window",
    "jsonl_roundtrip",
    "topk_mmr",
    "events_props_json",
    "gt_build",
    "quant_error_stats",
    "stream_click_attribution",
    "simhash64_pairs",
    "events_funnel",
    "repetition_stats",
    "tfidf_top_terms",
    "mixture_weights_temperature",
    "source_overlap",
    "quantize_error_by_dim",
    "lm_perplexity_filter",
    "label_centroid_quality",
    "corpus_diversity_entropy",
    "diverse_topk_docs",
    "persistent_heavy_hitters",
    "link_negative_samples",
    "customer_ltv_cohorts",
    "gdpr_erasure_audit",
    "volume_cusum_chart",
    "doc_novelty_share",
    "events_trailing_window",
    "csv_roundtrip",
    "dedup_incremental",
    "topk_dot",
    "recall_i8_vs_f32",
    "refine_i8",
    "stream_sessionize",
    "corpus_clean",
    "events_props_variant",
)

# ANN-family entries whose oracle literals (centroids / codebooks /
# rotations / hyperplanes / scale vectors) RE-DERIVE on the target
# fixture when SPARK_GRAFT_ORACLE_SF points at it (r6: the train
# sample is id-keyed on both engine sides — kmeans.collect_train_sample
# and p03_ivf._oracle_train_rows — so the fit is layout-independent).
# Run with:
#   SPARK_GRAFT_ORACLE_SF=/tmp/nvdb_sf1 python tests/sf1_parity.py --ann
# Still excluded even here (cost, not validity): the all-pairs oracles
# (knn_self_join, knn_pagerank, ngram_jaccard_pairs, simhash_pairs,
# embedding_neardup_pairs, lsh_operating_point) and the fitted-TEXT
# oracles (bpe_*, cluster_topics, hybrid/bm25 family, mixture_*,
# vocab_typo_pairs, substring_dup_spans, ...) whose DuckDB replay cost
# scales with corpus text, not vector count.
ANN_REFIT_ENTRIES = (
    "ivf_search",
    "ivf_search_persisted",
    "ivf_search_after_add",
    "ivf_search_filtered",
    "ivf_search_after_delete",
    "ivf_cluster_balance",
    "ivf_compact_stats",
    "ivf_nprobe_autotune",
    "ivf_probe_cost",
    "ivf_recall_sweep",
    "stream_ivf_ingest",
    "pq_adc_search",
    "pq_refine_search",
    "opq_refine_search",
    "opq_learned_refine_search",
    "ivfpq_refine_search",
    "sq8_search",
    "embedding_clusters",
    "lsh_multiprobe_search",
    "embedding_neardup_lsh",
    "ann_cost_frontier",
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
    # an in-memory DuckDB has NO temp_directory by default, which
    # disables larger-than-memory spill entirely — the r8 sf10 sweep's
    # OPQ replays (200k-vector rotation + ADC intermediates) died with
    # "Failed to allocate block" on a box with 100 GB free because of
    # it. Point spill at disk and cap the budget explicitly.
    spill = os.environ.get("SPARK_GRAFT_DUCKDB_TMP", "/tmp/nvdb_duck_spill")
    os.makedirs(spill, exist_ok=True)
    # escape quotes rather than interpolating raw env values into SET
    # statements (ADVICE r8: a path with a single quote broke the SQL)
    con.execute("SET temp_directory='%s'" % spill.replace("'", "''"))
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM", "48GB")
    con.execute("SET memory_limit='%s'" % mem.replace("'", "''"))
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
    # explicit argv names override the curated list (callers vet purity);
    # --ann selects the re-fittable ANN tranche (requires
    # SPARK_GRAFT_ORACLE_SF to point at the same fixture as SF1)
    args = sys.argv[1:]
    if args == ["--ann"]:
        if os.environ.get("SPARK_GRAFT_ORACLE_SF") != SF1:
            print("--ann requires SPARK_GRAFT_ORACLE_SF to equal the SF1 dir")
            sys.exit(2)
        targets = ANN_REFIT_ENTRIES
    else:
        targets = tuple(args) or PURE_ORACLE_ENTRIES
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
