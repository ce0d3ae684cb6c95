"""BPE merge learner: hand-computed toy corpus + encode behavior."""

from __future__ import annotations

from nano_vectordb_spark.functions import bpe


def test_learn_merges_toy_corpus():
    # "aaab" x3, "ab" x2:
    #  step 1: (a,a) = 2*3 = 6 beats (a,b) = 3+2 = 5      -> merge "aa"
    #  step 2: (a,b) = 3+2 = 5 beats (aa,a) = 3           -> merge "ab"
    #  step 3: only (aa,ab) = 3 remains                    -> merge "aaab"
    merges = bpe.learn_merges([("aaab", 3), ("ab", 2)], 10)
    assert merges == [
        (1, "a", "a", 6),
        (2, "a", "b", 5),
        (3, "aa", "ab", 3),
    ]


def test_learn_merges_tie_breaks_lexicographic():
    # (a,b) and (c,d) both count 1 -> the lexicographically smaller wins
    merges = bpe.learn_merges([("ab", 1), ("cd", 1)], 1)
    assert merges == [(1, "a", "b", 1)]


def test_segment_word_applies_merges_in_order():
    merges = bpe.learn_merges([("aaab", 3), ("ab", 2)], 10)
    assert bpe.segment_word("aaab", merges) == ["aaab"]
    assert bpe.segment_word("aab", merges) == ["aa", "b"]
    assert bpe.segment_word("ba", merges) == ["b", "a"]
    assert bpe.segment_word("", merges) == []


def test_merge_counts_weighted_by_word_frequency():
    # greedy left-to-right: "aaa" segments (a,a,a) -> pairs count 2 per
    # occurrence, weighted by the word's corpus frequency
    merges = bpe.learn_merges([("aaa", 4)], 1)
    assert merges == [(1, "a", "a", 8)]


def test_merge_regex_steps_match_segment_word(spark):
    """The JVM-native encode (regexp_replace steps) must equal the
    greedy Python segmenter on adversarial words: overlapping pairs,
    merged-symbol boundaries, chains of merges, empty string."""
    import pyspark.sql.functions as F

    merges = [
        (1, "a", "a", 0),   # overlap: "aaa" -> [aa, a]
        (2, "a", "b", 0),
        (3, "aa", "ab", 0), # multi-char symbols
        (4, "ab", "ab", 0), # must NOT match raw "abab" (symbols a,b,a,b)
        (5, "b", "c", 0),
    ]
    words = [
        "aaa", "aaaa", "aaab", "abab", "aabab", "abc", "bcbc",
        "aaabaaab", "ba", "b", "", "xyz", "aabbcc",
    ]
    steps = bpe.merge_regex_steps(merges)

    def pieces(w):
        e = F.array_join(F.filter(F.split(w, ""), lambda x: x != ""), bpe.SEP)
        for pat, repl in steps:
            e = F.regexp_replace(e, pat, repl)
        return F.translate(e, bpe.SEP, ",")

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["p"] for r in df.select("w", pieces(F.col("w")).alias("p")).collect()}
    for w in words:
        assert got[w] == ",".join(bpe.segment_word(w, merges)), w


def test_merge_regex_steps_rejects_quoting_hole():
    import pytest

    with pytest.raises(ValueError):
        bpe.merge_regex_steps([(1, "x\\E", "y", 0)])
