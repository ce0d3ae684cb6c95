"""Property-based tests (hypothesis): the custom join operators and the
driver-side k-means against brute-force references on random inputs.
Example counts are small because every Spark example costs a job; the
NumPy-only k-means properties run many more."""

from __future__ import annotations

import datetime

import numpy as np
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from nano_vectordb_spark.functions import kmeans as km

_BASE = datetime.datetime(2024, 1, 1)


def _row_strategy(n_keys: int = 3):
    return st.lists(
        st.tuples(
            st.integers(0, n_keys - 1),  # key
            st.integers(0, 3600),        # seconds offset
            st.integers(0, 100),         # payload
        ),
        min_size=0,
        max_size=12,
    )


_SPARK_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(left=_row_strategy(), right=_row_strategy())
@_SPARK_SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right):
    from nano_vectordb_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [
            (i, k, _BASE + datetime.timedelta(seconds=s))
            for i, (k, s, _) in enumerate(left)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [
            (k, _BASE + datetime.timedelta(seconds=s), float(v))
            for k, s, v in right
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: r.asof_ts
        for r in asof_join(ldf, rdf, on="user_id", right_payload=("value",)).collect()
    }
    assert set(got) == set(range(len(left)))  # left rows preserved 1:1
    for i, (k, s, _) in enumerate(left):
        lt = _BASE + datetime.timedelta(seconds=s)
        prior = [
            _BASE + datetime.timedelta(seconds=rs)
            for rk, rs, _ in right
            if rk == k and rs <= s
        ]
        assert got[i] == (max(prior) if prior else None), (i, left, right)


@given(left=_row_strategy(), right=_row_strategy())
@_SPARK_SETTINGS
def test_range_join_matches_bruteforce(spark, left, right):
    from nano_vectordb_spark.operators.rangejoin import range_join

    ldf = spark.createDataFrame(
        [
            (i, k, _BASE + datetime.timedelta(seconds=s))
            for i, (k, s, _) in enumerate(left)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    # intervals of varying width, some spanning multiple 600 s buckets
    rdf = spark.createDataFrame(
        [
            (
                j,
                k,
                _BASE + datetime.timedelta(seconds=s),
                _BASE + datetime.timedelta(seconds=s + 1 + 7 * v),
            )
            for j, (k, s, v) in enumerate(right)
        ],
        "win_id long, user_id long, win_start timestamp, win_end timestamp",
    )
    got = sorted(
        (r.event_id, r.win_id)
        for r in range_join(
            ldf, rdf, on="user_id", start="win_start", end="win_end",
            bucket_seconds=600,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (lk, ls, _) in enumerate(left)
        for j, (rk, rs, rv) in enumerate(right)
        if lk == rk and rs <= ls < rs + 1 + 7 * rv
    )
    assert got == want, (left, right)


@given(
    data=st.lists(
        st.lists(st.floats(-10, 10), min_size=4, max_size=4),
        min_size=8,
        max_size=64,
    ),
    k=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=200, deadline=None)
@example(
    data=[[0.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, 1.0, 0.0],
     [0.0, 0.0, 0.0, 5.0],
     [0.0, 0.0, 0.0, 0.5],
     [0.0, 0.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 4.0],
     [0.0, 0.0, 0.0, 1.0],
     [0.0, 0.0, 3.0, 0.0],
     [0.0, 0.0, 0.0, 0.0]],
    k=6,
    seed=168,
).via('discovered failure')
def test_lloyd_fit_invariants(data, k, seed):
    mat = np.asarray(data)
    if len(mat) < k:
        return
    cent = km.lloyd_fit(mat, k, seed=seed, n_init=2)
    assert cent.shape == (k, mat.shape[1])
    assert np.isfinite(cent).all()
    # no starved centroids: each is SOME point's nearest (up to exact
    # ties — duplicate points make argmin's index choice arbitrary)
    d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    mins = d2.min(axis=1)
    assert all((d2[:, j] == mins).any() for j in range(k))
    # determinism
    assert np.array_equal(cent, km.lloyd_fit(mat, k, seed=seed, n_init=2))


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=8,
    ),
    t=st.integers(0, 7),
)
@_SPARK_SETTINGS
def test_simhash64_band_join_is_exact(spark, docs, t):
    """The byte-band candidate join must find EXACTLY the brute-force
    pair set for hamming <= 7 (pigeonhole) on arbitrary corpora."""
    from nano_vectordb_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, d, "en", "s", len(d)) for i, d in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in dedup.simhash64_pairs(df, t).collect()
    )
    sig = {r.doc_id: (r.sim_hi, r.sim_lo) for r in dedup.simhash64(df).collect()}
    want = sorted(
        (a, b, bin(sig[a][0] ^ sig[b][0]).count("1")
         + bin(sig[a][1] ^ sig[b][1]).count("1"))
        for a in sig
        for b in sig
        if a < b
        and bin(sig[a][0] ^ sig[b][0]).count("1")
        + bin(sig[a][1] ^ sig[b][1]).count("1") <= t
    )
    assert got == want, (docs, t)


@given(
    arrs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "ab", "x y"]), max_size=20),
        min_size=1,
        max_size=6,
    )
)
@_SPARK_SETTINGS
def test_run_folds_match_counter(spark, arrs):
    """max_run/dup_run_total over a sorted array == Counter facts
    (registry: repetition_stats)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from nano_vectordb_spark.functions import text as tx

    df = spark.createDataFrame([(a,) for a in arrs], "arr array<string>")
    rows = df.select(
        "arr",
        tx.max_run_expr(F.array_sort("arr")).alias("mx"),
        tx.dup_run_total_expr(F.array_sort("arr")).alias("dup"),
    ).collect()
    for r in rows:
        c = Counter(r.arr)
        assert r.mx == (max(c.values()) if c else 0)
        assert r.dup == sum(v for v in c.values() if v > 1)


# ---------------------------------------------------------------------------
# globalrank: the ntile closed form is pure arithmetic — verify it against
# the standard ntile definition exhaustively in NumPy (no Spark job), and
# the two-phase rank against a Python sort on random multisets (Spark).
# ---------------------------------------------------------------------------


@given(n=st.integers(1, 400), k=st.integers(1, 12))
@settings(max_examples=200, deadline=None)
def test_ntile_closed_form_matches_definition(n, k):
    base, rem = divmod(n, k)
    expect = []
    for tile in range(1, k + 1):
        size = base + (1 if tile <= rem else 0)
        expect += [tile] * size
    # replicate ntile_from_rank's arithmetic in plain Python
    cutoff = rem * (base + 1)
    got = []
    for rn in range(1, n + 1):
        if rn <= cutoff:
            got.append((rn - 1) // (base + 1) + 1)
        else:
            got.append(rem + (rn - cutoff - 1) // max(base, 1) + 1)
    assert got == expect


@given(
    vals=st.lists(st.integers(-5, 5), min_size=1, max_size=30),
    parts=st.integers(1, 5),
)
@_SPARK_SETTINGS
def test_two_phase_rank_matches_python_sort(spark, vals, parts):
    from pyspark.sql import functions as F

    from nano_vectordb_spark.operators import globalrank as grank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(parts)
    got = {
        r["id"]: r["rn"]
        for r in grank.two_phase_rank(
            df, [F.col("v").desc(), F.col("id").asc()], num_partitions=parts
        ).collect()
    }
    expect = {
        i: rank
        for rank, (i, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0])), start=1
        )
    }
    assert got == expect
