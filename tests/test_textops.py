"""Text pipeline tests: greedy chunker vs a pure-Python reference,
hash-embedding invariants (SURVEY.md §5c shape for the O33 pipeline)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nano_vectordb_spark.operators import textops
from tests.conftest import SF_CORRECT


def _docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")


def py_chunk_words(text: str, max_chars: int) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    done: list[str] = []
    cur = ""
    for t in toks:
        joined = t if not cur else f"{cur} {t}"
        if len(joined) <= max_chars:
            cur = joined
        else:
            if cur:
                done.append(cur)
            cur = t
    if cur:
        done.append(cur)
    return done


def test_chunk_words_matches_python(spark):
    rows = textops.chunk_words(_docs(spark), 120).orderBy("doc_id", "chunk_id").collect()
    got: dict[int, list[str]] = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r.chunk)
    src = {r.doc_id: r.text for r in _docs(spark).collect()}
    assert set(got) == set(src)
    for doc_id, text in src.items():
        assert got[doc_id] == py_chunk_words(text, 120), doc_id


def test_chunk_words_bounds(spark):
    df = textops.chunk_words(_docs(spark), 120)
    assert df.filter(F.col("chunk_chars") > 120).count() == 0
    assert df.filter(F.col("chunk_chars") == 0).count() == 0


def test_chunk_words_oversize_token(spark):
    # a token longer than max_chars becomes its own oversize chunk,
    # with no spurious empty chunk before it
    df = spark.createDataFrame(
        [(0, "x" * 200 + " ok tail", "en", "s", 209)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = textops.chunk_words(df, 120).orderBy("chunk_id").collect()
    assert [r.chunk for r in rows] == ["x" * 200, "ok tail"]
    assert py_chunk_words("x" * 200 + " ok tail", 120) == ["x" * 200, "ok tail"]


def test_chunk_fixed_reassembles(spark):
    df = textops.chunk_fixed(_docs(spark), 120)
    re = df.groupBy("doc_id").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))), lambda s: s["chunk"])
        ).alias("rebuilt")
    )
    joined = re.join(_docs(spark), "doc_id")
    assert joined.filter(F.col("rebuilt") != F.col("text")).count() == 0


def test_split_sections_on_headed_doc(spark):
    text = "# Intro\nalpha beta\n# Methods\ngamma delta\n# End\nomega"
    df = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = textops.split_sections(df).orderBy("section_id").collect()
    assert [r.section for r in rows] == [
        "Intro\nalpha beta",
        "Methods\ngamma delta",
        "End\nomega",
    ]
    # headless text -> single section
    flat = _docs(spark).limit(5)
    assert textops.split_sections(flat).count() == 5


def test_chunk_sentences(spark):
    text = "One two three. Four five! Six seven eight nine? Ten."
    df = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = textops.chunk_sentences(df, 30).orderBy("chunk_id").collect()
    chunks = [r.chunk for r in rows]
    assert chunks == ["One two three. Four five!", "Six seven eight nine? Ten."]
    # sentences are never split mid-sentence even when oversize
    long_sent = "word " * 20 + "end."
    df2 = spark.createDataFrame(
        [(0, long_sent.strip(), "en", "s", len(long_sent))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [r.chunk for r in textops.chunk_sentences(df2, 30).collect()]
    assert got == [long_sent.strip()]


def test_section_sentence_pipeline_composes(spark):
    text = "# A\nFirst sentence. Second sentence here.\n# B\nThird one."
    df = spark.createDataFrame(
        [(7, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sections = textops.split_sections(df)
    chunks = textops.chunk_sentences(
        sections.withColumnRenamed("section", "text"), 40
    )
    assert chunks.count() >= 2
    assert chunks.filter("chunk_chars > 40").count() == 0


def test_doc_search_self_match(spark):
    from nano_vectordb_spark import registry
    from tests.conftest import SF_CORRECT as SF

    res = registry.REGISTRY["doc_search"].fn(spark, SF)
    top1 = {r.query_id: r.vec_id for r in res.filter("rank = 1").collect()}
    assert len(top1) == 5
    assert all(q == v for q, v in top1.items())  # each chunk finds itself first


def test_hash_embed_normalized_and_deterministic(spark):
    chunks = textops.chunk_words(_docs(spark).limit(50), 120)
    emb = textops.hash_embed(chunks, dim=32)
    rows = emb.select("doc_id", "chunk_id", "embedding").collect()
    for r in rows:
        nrm = math.sqrt(sum(x * x for x in r.embedding))
        assert abs(nrm - 1.0) < 1e-9, (r.doc_id, r.chunk_id, nrm)
    rows2 = textops.hash_embed(chunks, dim=32).select("embedding").collect()
    assert [list(r.embedding) for r in rows2] == [
        list(r.embedding) for r in emb.select("embedding").collect()
    ]


def test_hash_embed_matches_fold_spec_bitwise(spark):
    """The vectorized pandas-UDF hash_embed must equal the Catalyst
    fold spec (hash_embed_fold — the form the DuckDB oracles mirror)
    BIT-FOR-BIT: exact float equality, no tolerance. Covers repeated
    tokens (order-dependent bucket accumulation), multi-space runs,
    empty text (zero vector, unnormalized), single token, unicode,
    long docs with many bucket collisions, and NULL text (both paths
    must yield a NULL array, not an array of NULLs)."""
    rows = [
        (0, "a b c a b a"),
        (1, "  leading  and   multi   space  "),
        (2, ""),
        (3, "solo"),
        (4, "naïve café 東京 naïve"),
        (5, " ".join(f"tok{i % 7}" for i in range(500))),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for dim in (8, 64):
        fast = {
            r.doc_id: None if r.embedding is None else list(r.embedding)
            for r in textops.hash_embed(df, dim, text_col="text").collect()
        }
        spec = {
            r.doc_id: None if r.embedding is None else list(r.embedding)
            for r in textops.hash_embed_fold(df, dim, text_col="text").collect()
        }
        assert fast == spec  # exact equality, not approx
        assert fast[6] is None  # NULL text -> NULL array on both paths


def test_csv_pipeline_end_to_end(spark):
    import numpy as np

    from nano_vectordb_spark import registry
    from tests.conftest import SF_CORRECT as SF

    emb = registry.REGISTRY["csv_chunks_embed"].fn(spark, SF)
    rows = emb.limit(50).collect()
    assert len(rows) > 0
    for r in rows:
        # registry entries serialize the vector canonically (rounded to
        # 9 decimals for the driver's hash gate), so parse + loosen tol
        vec = [float(x) for x in r.embedding.split(",")]
        n = float(np.linalg.norm(vec))
        assert abs(n - 1.0) < 1e-6 or n == 0.0  # normalized encode contract
    # CSV source fidelity is oracle-checked (csv_roundtrip); here assert
    # the pipeline starts from the CSV copy, not the parquet table
    from nano_vectordb_spark.registry import _csv_docs_path
    import os

    assert os.path.exists(f"{_csv_docs_path(SF)}/_SUCCESS")


def test_doc_search_ivf_self_match(spark):
    from nano_vectordb_spark import registry
    from tests.conftest import SF_CORRECT as SF

    res = registry.REGISTRY["doc_search_ivf"].fn(spark, SF)
    top1 = {r.query_id: r.vec_id for r in res.filter("rank = 1").collect()}
    assert len(top1) == 5
    # a query vector's own cluster is always probed, so it finds itself
    assert all(q == v for q, v in top1.items())


# --- repetition folds (registry: repetition_stats) ----------------------

def _fold_vals(spark, arrs: list[list[str]]) -> list[tuple[int, int]]:
    from nano_vectordb_spark.functions import text as tx

    df = spark.createDataFrame([(a,) for a in arrs], "arr array<string>")
    rows = (
        df.select(
            tx.max_run_expr(F.array_sort("arr")).alias("mx"),
            tx.dup_run_total_expr(F.array_sort("arr")).alias("dup"),
        )
        .collect()
    )
    return [(r.mx, r.dup) for r in rows]


def test_run_folds_match_python_counter(spark):
    from collections import Counter

    cases = [
        [],
        ["a"],
        ["a", "a"],
        ["a", "b", "a", "a", "c", "b"],
        ["x"] * 5,
        ["a", "b", "c"],
    ]
    got = _fold_vals(spark, cases)
    for arr, (mx, dup) in zip(cases, got):
        c = Counter(arr)
        assert mx == (max(c.values()) if c else 0)
        assert dup == sum(v for v in c.values() if v > 1)


def test_ngrams_expr_short_docs(spark):
    from nano_vectordb_spark.functions import text as tx

    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",)], "text string"
    )
    rows = df.select(
        tx.ngrams_expr(tx.tokens_expr("text"), 3).alias("g")
    ).collect()
    assert [r.g for r in rows] == [[], [], [], ["one two three"]]
