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


def build(spark) -> str:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DST, "_DONE")):
        return DST
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    for t, offs in _OFFSETS.items():
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
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    open(os.path.join(DST, "_DONE"), "w").close()
    return DST


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(app_name="nvdb-make-sf1", cpus="32")
    build(spark)
    for t in list(_OFFSETS) + ["region", "nation"]:
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(t, n)
    spark.stop()


if __name__ == "__main__":
    main()
