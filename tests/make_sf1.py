"""Synthesize a deterministic sf1 (10x sf0.1) dataset for SCALE
validation only — correctness stays gated at sf0.01 against DuckDB.

/root/testdata is read-only and the driver ships no sf1, so the 10x
scale-up derives from sf0.1 by key-offset replication, constructed so
per-query work scales ~linearly (the property the run is measuring):

  * dims (region, nation) stay as-is — they broadcast at any scale;
  * fact tables replicate 10x with key offsets (orderkey/custkey/
    suppkey/partkey/event_id/user_id/doc_id/vec_id), so join fan-outs
    and group cardinalities scale 10x, not 100x;
  * document TEXT gets a per-replica per-word tag (w -> w_rK), so
    replicas share NO shingles with the original: near-dup pair
    density per replica matches sf0.1 and total pairs scale 10x —
    naive text copies would make every doc a 10-way near-dup group
    and quadratically explode the dedup queries, measuring a
    different workload, not scale;
  * embeddings rotate dimensions by K per replica — norms and the
    pairwise-distance distribution are preserved exactly, vectors are
    distinct, and k-means/IVF rebuild on the union.

Run: python tests/make_sf1.py  (writes /tmp/nvdb_sf1, idempotent)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/nvdb_sf1")
# 10 replicas of sf0.1 = sf1; SPARK_GRAFT_SCALE_REPLICAS=100 with a
# matching DST builds sf10 for the second decade of the scaling curve
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
# SPARK_GRAFT_SCALE_TABLES=documents,events restricts the build to a
# table subset — the sf100 third-decade fixture only needs the
# data-bound family's tables (documents+events), ~2.6 GB instead of
# ~160 GB for all facts at 1000 replicas
_TABLE_SUBSET = {
    t for t in os.environ.get("SPARK_GRAFT_SCALE_TABLES", "").split(",") if t
}
# plans with REPLICAS union branches stress the analyzer; write in
# chunks of <= 50 replicas (append mode) so sf100 (1000 replicas)
# stays a sequence of ordinary writes
_CHUNK = 50

# key columns to offset per table: col -> per-replica stride (a round
# number safely above the sf0.1 max so replica key ranges never collide)
_OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


# Generator version, embedded in the _DONE marker (r6 ADVICE): any
# change to the replication scheme (e.g. the r6 rotation fix
# k = 1 + (i-1) % (dim-1)) bumps this, so stale on-disk fixtures are
# detected and rebuilt instead of silently reused against oracle
# expectations fitted to the new scheme.
_GEN_VERSION = "v2-rot-nonzero"


def _marker_text() -> str:
    return f"{_GEN_VERSION} replicas={REPLICAS} tables={sorted(_TABLE_SUBSET) or 'all'}"


def build(spark) -> str:
    from pyspark.sql import functions as F

    done = os.path.join(DST, "_DONE")
    if os.path.exists(done):
        with open(done) as fh:
            if fh.read() == _marker_text():
                return DST
        # stale fixture from an older generator: rebuild from scratch
        import shutil

        shutil.rmtree(DST)
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation"):
        if _TABLE_SUBSET and t not in _TABLE_SUBSET:
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    for t, offs in _OFFSETS.items():
        if _TABLE_SUBSET and t not in _TABLE_SUBSET:
            continue
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(REPLICAS):
            rep = base
            for col, stride in offs.items():
                dt = dict(base.dtypes)[col]
                rep = rep.withColumn(col, (F.col(col) + F.lit(i * stride)).cast(dt))
            if t == "documents" and i > 0:
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"_r{i}")),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text"))
            if t == "embeddings" and i > 0:
                dim = len(base.select("embedding").first()[0])
                # rotation must never be 0 for i>0, or replicas whose
                # index is a multiple of dim duplicate the base vectors
                # verbatim (distance ties in knn/dedup workloads); this
                # cycles k through 1..dim-1
                k = 1 + (i - 1) % (dim - 1)
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", k + 1, dim - k),
                        F.slice("embedding", 1, k),
                    ),
                )
            parts.append(rep)
        for c0 in range(0, len(parts), _CHUNK):
            chunk = parts[c0 : c0 + _CHUNK]
            out = chunk[0]
            for p in chunk[1:]:
                out = out.unionByName(p)
            mode = "overwrite" if c0 == 0 else "append"
            out.write.mode(mode).parquet(f"{DST}/{t}.parquet")
    with open(os.path.join(DST, "_DONE"), "w") as fh:
        fh.write(_marker_text())
    return DST


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-make-sf1", cpus="32")
    build(spark)
    tables = list(_OFFSETS) + ["region", "nation"]
    if _TABLE_SUBSET:
        tables = [t for t in tables if t in _TABLE_SUBSET]
    for t in tables:
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(t, n)
    spark.stop()


if __name__ == "__main__":
    main()
