"""Every registry entry with an oracle must match DuckDB exactly at
sf0.01 — the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from nano_vectordb_spark import registry
from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare

NAMES = sorted(registry.REGISTRY)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    entry = registry.REGISTRY[name]
    df = entry.fn(spark, SF_CORRECT)
    sql = registry.resolve_oracle(entry)
    if sql is None:
        assert df.count() >= 0  # rows-only smoke, like the driver's weak check
        return
    ok, msg = compare(df, duck, sql)
    assert ok, f"{name}: {msg}"
