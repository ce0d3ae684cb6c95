"""Local replica of the driver's correctness gate: run a registry query
on Spark and its DuckDB oracle SQL side-by-side, sort columns by name,
sort rows, and compare values exactly.

If a query passes here at sf0.01 it should hash-match in the driver's
CORRECTNESS_r{N}.json run.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np


def _normalize_cell(v: Any) -> Any:
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_normalize_cell(x) for x in v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((str(type(x)), str(x)) for x in t))
    return out


def compare(spark_df, duck_con, sql: str) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn = _normalize_rows(s_cols, s_rows)
    dn = _normalize_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return False, f"value mismatch at sorted-row {i}:\n  spark={a!r}\n  duck ={b!r}"
    return True, "ok"
