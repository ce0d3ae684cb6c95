"""Binary sign-signature quantization + SQ8 scalar quantization units."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nano_vectordb_spark.functions import quantize as qz
from nano_vectordb_spark.operators import binaryq as binq
from nano_vectordb_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_signature_spark_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = (
        binq.with_signature(emb)
        .select("vec_id", "embedding", "sig_lo", "sig_hi")
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    assert rows
    for r in rows:
        lo, hi = binq.sign_signature_np(r["embedding"])
        assert (r["sig_lo"], r["sig_hi"]) == (lo, hi), r["vec_id"]
        # both halves use only the low 32 bits — never the sign bit
        assert 0 <= r["sig_lo"] < 2**32 and 0 <= r["sig_hi"] < 2**32


def test_hamming_zero_to_self_and_symmetric_bound(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    sig = binq.with_signature(emb).select("vec_id", "sig_lo", "sig_hi")
    qrow = sig.filter(F.col("vec_id") == 3).first()
    cand = binq.hamming_candidates(sig, qrow["sig_lo"], qrow["sig_hi"], r=5)
    rows = cand.collect()
    assert rows[0]["vec_id"] == 3 and rows[0]["hamming"] == 0
    assert all(0 <= r["hamming"] <= 64 for r in rows)


def test_binary_rescore_scores_are_exact_dot(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    sig = binq.with_signature(emb).select("vec_id", "sig_lo", "sig_hi")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    out = binq.topk_binary_rescore(sig, emb, qvec, k=5, rescore_r=20).collect()
    assert len(out) == 5
    got = {r["vec_id"]: r["score"] for r in out}
    base = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin(*got)).collect()
    }
    q = np.asarray(qvec, dtype=np.float64)
    for vid, score in got.items():
        # sequential-fold dot in double precision: matches a NumPy dot
        # to float tolerance (exactness vs DuckDB is the parity test)
        assert score == pytest.approx(float(np.asarray(base[vid], dtype=np.float64) @ q), rel=1e-12)


def test_sign_signature_np_rejects_wrong_dim():
    with pytest.raises(ValueError):
        binq.sign_signature_np([1.0] * 63)


def test_sq8_train_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    vmin, vdiff = qz.sq8_train(emb, train_cap=10**9)
    rows = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float32
    )
    np_min, np_max = rows.min(axis=0), rows.max(axis=0)
    assert vmin == [float(v) for v in np_min]
    assert vdiff == [float(np_max[j]) - float(np_min[j]) for j in range(rows.shape[1])]


def test_sq8_recon_error_bounded(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    vmin, vdiff = qz.sq8_train(emb, train_cap=10**9)
    rows = (
        emb.select("embedding", qz.sq8_recon_expr("embedding", vmin, vdiff).alias("recon"))
        .limit(100)
        .collect()
    )
    half_step = np.asarray(vdiff, dtype=np.float64) / (2.0 * qz.SQ8_LEVELS)
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        rec = np.asarray(r["recon"], dtype=np.float64)
        # in-range values reconstruct within half a quantization step
        assert np.all(np.abs(x - rec) <= half_step + 1e-12)


# ---- property tests (NumPy-only, no Spark session) ----

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _vec64(draw):
    return draw(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=64,
            max_size=64,
        )
    )


@given(_vec64())
@settings(max_examples=50, deadline=None)
def test_signature_bits_roundtrip(v):
    lo, hi = binq.sign_signature_np(v)
    bits = [(lo >> i) & 1 for i in range(32)] + [(hi >> i) & 1 for i in range(32)]
    assert bits == [1 if x > 0 else 0 for x in v]


@given(_vec64(), _vec64())
@settings(max_examples=50, deadline=None)
def test_hamming_equals_naive_sign_disagreement(a, b):
    la, ha = binq.sign_signature_np(a)
    lb, hb = binq.sign_signature_np(b)
    ham = bin((la ^ lb)).count("1") + bin((ha ^ hb)).count("1")
    naive = sum(1 for x, y in zip(a, b) if (x > 0) != (y > 0))
    assert ham == naive
