"""Replay the driver's full correctness gate locally: every queries()
entry vs its oracle_sql() at sf0.01, plus a driver-canonicalizer safety
check (no array/map typed output columns — the driver's pandas
sort_values crashes on unhashable cells).

Run: SPARK_LOCAL_IP=127.0.0.1 python tests/full_gate_replay.py [names...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as E
from nano_vectordb_spark.session import get_spark
from tests.oracle_harness import compare


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(cpus=8)
    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, osql = E.queries(), E.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row: dict = {}
        try:
            df = fn(spark, sf_dir)
            bad_types = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad_types:
                row["canon_unsafe"] = bad_types
            if name in osql:
                ok, msg = compare(df, con, osql[name])
                row["ok"] = ok
                if not ok:
                    row["msg"] = msg[:400]
            else:
                row["ok"] = None
                row["rows"] = df.count()
        except Exception as exc:  # noqa: BLE001
            row["ok"] = False
            row["msg"] = f"{type(exc).__name__}: {exc}"[:400]
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        status = (
            "PASS" if row.get("ok") else
            ("no_oracle" if row.get("ok") is None else "FAIL")
        )
        extra = " CANON-UNSAFE" if row.get("canon_unsafe") else ""
        print(f"{name:32s} {status}{extra} ({row['sec']}s)", flush=True)
        if row.get("msg"):
            print("   ", row["msg"][:300], flush=True)
    n_pass = sum(1 for r in results.values() if r.get("ok"))
    n_fail = sum(1 for r in results.values() if r.get("ok") is False)
    n_none = sum(1 for r in results.values() if r.get("ok") is None)
    print(f"\nTOTAL: {n_pass} pass / {n_fail} fail / {n_none} no-oracle")
    with open("/tmp/gate_replay.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
