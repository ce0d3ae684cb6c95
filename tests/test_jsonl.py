"""JSONL source fidelity on adversarial content + seeded-shuffle
permutation invariants."""

from __future__ import annotations

from nano_vectordb_spark.operators.pipeline import seeded_shuffle
from nano_vectordb_spark.sources.csv import DOCUMENTS_SCHEMA
from nano_vectordb_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_jsonl_roundtrip_nasty_strings(spark, tmp_path):
    rows = [
        (1, "line1\nline2\r\nline3", "en", 'src "quoted"', 18),
        (2, "tab\there backslash \\ slash /", None, "src0", 28),
        (3, "unicode ß日本語 \U0001f680", "ja", "src1", 12),
        (4, None, "en", None, None),
        (5, '{"looks":"like json"}', "en", "src2", 21),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(df, path)
    back = read_documents_jsonl(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_seeded_shuffle_is_partitioning_invariant_permutation(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = seeded_shuffle(docs, seed="t", n_shards=4).collect()
    # a permutation: every doc exactly once
    assert sorted(r.doc_id for r in out) == list(range(500))
    # positions within each shard are contiguous 1..n
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic under a different input partitioning
    out2 = seeded_shuffle(
        docs.repartition(13), seed="t", n_shards=4
    ).collect()
    key = lambda rs: sorted((r.doc_id, r.shard, r.pos) for r in rs)  # noqa: E731
    assert key(out) == key(out2)
    # a different seed produces a different permutation
    out3 = seeded_shuffle(docs, seed="u", n_shards=4).collect()
    assert key(out) != key(out3)
