"""Time every registry entry at sf0.1 — the round-13 measurement base.

Usage:
    python tests/sweep_r13.py <outfile.json> [name_filter ...]

For each entry: build the DataFrame twice and fully materialize it with
the noop sink (guide §1.4 — computes every column of every row, no
column pruning, no driver collect), recording [cold, warm] wall seconds
(the registry's per-application memoization makes the second rep the
warm number).  Entries are run in registry order; caches are NOT
released between entries (matches the r12 sweep methodology so numbers
are comparable within a run).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outfile = sys.argv[1]
    name_filter = sys.argv[2:]

    from nano_vectordb_spark import registry
    from nano_vectordb_spark.session import get_spark

    spark = get_spark(
        app_name="sweep-r13", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    out: dict[str, list[float]] = {}
    errs: dict[str, str] = {}
    names = [
        n for n in registry.REGISTRY
        if not name_filter or any(f in n for f in name_filter)
    ]
    for i, name in enumerate(names):
        fn = registry.REGISTRY[name].fn
        reps = []
        for _ in range(2):
            t0 = time.time()
            try:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 - record and continue
                errs[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
            reps.append(round(time.time() - t0, 3))
        if reps:
            out[name] = reps
        print(f"[{i + 1}/{len(names)}] {name}: {reps or errs.get(name)}", flush=True)
        with open(outfile, "w") as fh:
            json.dump({"times": out, "errors": errs, "sf_dir": SF_DIR}, fh, indent=1)
    spark.stop()
    print(f"wrote {outfile}: {len(out)} timed, {len(errs)} errors")


if __name__ == "__main__":
    main()
