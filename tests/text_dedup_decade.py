"""Decade-scale profile of the rebuilt (r11) text-dedup path — r10
VERDICT items 1, 2 and 5.

Measures, at 1M and 2M documents (the surviving /tmp fixtures from
tests/make_sf1.py; pass --build5m to also build/use a 5M-doc fixture
matching the r6 "sf100" documents scale):

  * minhash_lsh_pairs  — wall + pair count (the exactly-once banded
    kernel; the r6-era join+distinct plan measured 36.86 s at 5M docs)
  * simhash64_pairs    — wall + pair count (same comparison: 4.40 s at
    5M docs under the old plan)
  * corpus_clean       — the end-to-end release pipeline (filters ->
    exact dedup -> LSH near-dup removal -> anti-join) with per-stage
    attribution, which had never been profiled above sf0.1 even though
    each stage had.

Each wall is min-of-2 (cold JVM/page-cache effects reported by the
first rep). Prints one JSON line at the end for PERF.md.

Run: python tests/text_dedup_decade.py [--build5m]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = {
    "1m": "/tmp/nvdb_docs1m",
    "2m": "/tmp/nvdb_docs2m",
}
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def _wall(fn, reps=REPS):
    walls = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        walls.append(round(time.perf_counter() - t0, 2))
    return walls, out


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import functions as F

    from nano_vectordb_spark.operators import dedup as dedup_ops
    from nano_vectordb_spark.session import get_spark

    fixtures = dict(FIXTURES)
    if "--build5m" in sys.argv:
        fix5 = "/tmp/nvdb_docs5m"
        if not os.path.exists(os.path.join(fix5, "_DONE")):
            env = dict(
                os.environ,
                SPARK_GRAFT_SCALE_REPLICAS="1000",
                SPARK_GRAFT_SCALE_TABLES="documents",
                SPARK_GRAFT_SF1_DIR=fix5,
            )
            import subprocess

            subprocess.run(
                [sys.executable, "tests/make_sf1.py"], env=env, check=True
            )
        fixtures["5m"] = fix5

    spark = get_spark(app_name="nvdb-dedup-decade", cpus="32")
    results: dict[str, dict] = {}
    for label, path in fixtures.items():
        if not os.path.exists(os.path.join(path, "_DONE")):
            print(f"{label}: fixture missing at {path} — skipped")
            continue
        docs = spark.read.parquet(f"{path}/documents.parquet")
        n_docs = docs.count()  # warms the page cache too
        row: dict = {"n_docs": n_docs}

        walls, n = _wall(
            lambda: dedup_ops.minhash_lsh_pairs(docs, 0.2).count()
        )
        row["minhash_lsh_pairs"] = {"walls_s": walls, "pairs": n}
        print(f"{label}: minhash_lsh_pairs {walls} s, {n} pairs", flush=True)

        walls, n = _wall(lambda: dedup_ops.simhash64_pairs(docs, 3).count())
        row["simhash64_pairs"] = {"walls_s": walls, "pairs": n}
        print(f"{label}: simhash64_pairs {walls} s, {n} pairs", flush=True)

        # corpus_clean end-to-end (the registry pipeline, re-expressed
        # here so each stage can be timed on a cold cache): quality +
        # language filter -> exact-dedup keep-first -> LSH near-dup
        # removal -> anti-join survivor set
        from nano_vectordb_spark.registry_parts.p06_dedup import (
            _JACCARD_T,
            _QUALITY_T,
        )
        from nano_vectordb_spark.functions import text as tx
        from pyspark.sql import Window

        def staged():
            stages: dict[str, float] = {}
            t0 = time.perf_counter()
            # r12: the registry pipeline scores via the one-pass
            # Arrow profile (tx.scored_docs) — keep this re-expression
            # in lockstep so the stage attribution measures the real op
            scored = tx.scored_docs(docs.select("doc_id", "text"))
            filt = scored.filter(
                (F.col("quality") >= _QUALITY_T) & (F.col("pred_lang") == "en")
            ).drop("pred_lang")
            w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
            uniq = (
                filt.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
                .persist()
            )
            n_uniq = uniq.count()
            stages["filter_exact_dedup_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            pairs = dedup_ops.minhash_lsh_pairs(
                uniq.select("doc_id", "text"), _JACCARD_T
            )
            removed = pairs.select(F.col("b_id").alias("doc_id")).distinct()
            removed = removed.persist()
            n_removed = removed.count()
            stages["lsh_neardup_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            kept = uniq.join(F.broadcast(removed), "doc_id", "left_anti")
            n_kept = kept.count()
            stages["antijoin_s"] = round(time.perf_counter() - t0, 2)
            uniq.unpersist()
            removed.unpersist()
            return {
                "stages": stages,
                "n_uniq": n_uniq,
                "n_removed": n_removed,
                "n_kept": n_kept,
                "total_s": round(sum(stages.values()), 2),
            }

        reps = [staged() for _ in range(REPS)]
        best = min(reps, key=lambda r: r["total_s"])
        best["all_total_s"] = [r["total_s"] for r in reps]
        row["corpus_clean"] = best
        print(f"{label}: corpus_clean {best}", flush=True)
        results[label] = row

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
