"""PQ self-oracle tests: the reference's recall-ladder shape
(Performance.md Tables 19/20): PQ alone loses recall, PQ+refine
recovers it; more refine candidates never hurt."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nano_vectordb_spark.operators import gt as gt_ops
from nano_vectordb_spark.operators import pq as pq_ops
from nano_vectordb_spark.operators import sample as sample_ops
from tests.conftest import SF_CORRECT

K = 10


@pytest.fixture(scope="module")
def setup(spark):
    base = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    queries = sample_ops.sample_queries(base, 20, seed=42)
    index = pq_ops.pq_build(base, m=8, nbits=6, seed=42)
    index.codes = index.codes.cache()
    gt = gt_ops.gt_build(base, queries, K).select("query_id", "gt_ids")
    return base, queries, index, gt


def _recall(pred_topk, gt, k=K):
    pred = gt_ops.gt_from_topk(pred_topk, k).select(
        "query_id", F.col("gt_ids").alias("pred_ids")
    )
    return gt_ops.recall_at_k(gt, pred, k).first().recall_at_k


def test_pq_ladder(setup):
    base, queries, index, gt = setup
    r_pq = _recall(pq_ops.pq_adc_search(index, queries, K), gt)
    r_ref50 = _recall(pq_ops.pq_search_refined(index, base, queries, K, refine_k=50), gt)
    r_ref100 = _recall(pq_ops.pq_search_refined(index, base, queries, K, refine_k=100), gt)
    # reference shape: refine recovers recall, monotone in refine_k
    assert r_pq < r_ref50 <= r_ref100, (r_pq, r_ref50, r_ref100)
    assert r_ref100 >= 0.9, r_ref100
    assert r_pq > 0.2, r_pq  # ADC is lossy but far better than chance


def test_pq_codes_shape(setup):
    base, queries, index, gt = setup
    row = index.codes.first()
    assert len(row.codes) == 8
    assert all(0 <= c < 64 for c in row.codes)
    assert index.codes.count() == base.count()


def test_opq_rotation_ladder(spark, setup):
    # OPQ variant: rotation is orthonormal (ranking-preserving), ladder
    # still holds; on isotropic synthetic data recall lands near plain
    # PQ rather than above it — the reference's OPQ gains come from
    # anisotropic real embeddings.
    base, queries, index, gt = setup
    rot = pq_ops.pca_rotation(base)
    import numpy as np

    assert np.allclose(rot @ rot.T, np.eye(rot.shape[0]), atol=1e-8)
    opq = pq_ops.pq_build(base, m=8, nbits=6, seed=42, rotation=rot)
    r_opq = _recall(pq_ops.pq_adc_search(opq, queries, K), gt)
    r_opq_ref = _recall(
        pq_ops.pq_search_refined(opq, base, queries, K, refine_k=100), gt
    )
    assert r_opq < r_opq_ref
    assert r_opq_ref >= 0.9, (r_opq, r_opq_ref)


def test_pq_rejects_bad_m(spark):
    base = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        pq_ops.pq_build(base, m=7)
    with pytest.raises(ValueError, match="nbits"):
        pq_ops.pq_build(base, m=8, nbits=9)


def test_pq_nbits8_signed_byte_codes(spark):
    """K=256 (the reference's default PQ_BITS=8): codes 128..255 wrap to
    negative tinyints at rest; ADC must unwrap them. The ADC score must
    equal a NumPy recomputation from the (unwrapped) codes exactly."""
    import numpy as np

    from nano_vectordb_spark.operators import sample as sample_ops

    base = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    queries = sample_ops.sample_queries(base, 3, seed=42)
    index = pq_ops.pq_build(base, m=8, nbits=8, seed=42)
    codes = {r.vec_id: list(r.codes) for r in index.codes.collect()}
    # the wrap case must actually occur for this test to bite
    assert any(c < 0 for row in codes.values() for c in row)
    got = {
        (r.query_id, r.vec_id): r.score
        for r in pq_ops.pq_adc_search(index, queries, 5).collect()
    }
    qmap = {
        r.query_id: np.asarray(r.embedding, dtype=np.float64)
        for r in queries.collect()
    }
    dsub = index.dim // index.m
    for (qid, vid), score in got.items():
        q = qmap[qid]
        want = 0.0
        for mi in range(index.m):
            c = codes[vid][mi] % 256  # unwrap signed byte
            want += float(index.codebooks[mi][c] @ q[mi * dsub : (mi + 1) * dsub])
        assert abs(want - score) < 1e-9, (qid, vid, want, score)


def test_opq_learned_rotation_beats_naive_split(spark):
    """The learned OPQ-NP rotation must recover quantizability that a
    random rotation destroyed: product-structured data (16 tight
    gaussians per 8-dim block) scrambled by a random orthogonal matrix.
    Reference shape: IVF-PQ 0.6943 -> OPQ-PQ 0.7657 (Performance.md
    Table 19). Measured here: identity 0.346, PCA 0.256, learned 0.454."""
    import numpy as np

    from nano_vectordb_spark.functions import kmeans as km

    rng = np.random.default_rng(5)
    m, dsub, k = 8, 8, 16
    blocks = []
    for _mi in range(m):
        means = rng.normal(size=(k, dsub))
        idx = rng.integers(0, k, size=3000)
        blocks.append(means[idx] + 0.05 * rng.normal(size=(3000, dsub)))
    x0 = np.concatenate(blocks, axis=1)
    q_mix, _ = np.linalg.qr(rng.normal(size=(64, 64)))
    x = x0 @ q_mix
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    def adc_recall(rot):
        xr = x if rot is None else x @ rot
        recon = np.empty_like(xr)
        for mi in range(m):
            xs = xr[:, mi * dsub : (mi + 1) * dsub]
            b = km.lloyd_fit(xs, k, seed=42 + mi)
            d2 = (xs * xs).sum(1)[:, None] - 2 * (xs @ b.T) + (b * b).sum(1)[None, :]
            recon[:, mi * dsub : (mi + 1) * dsub] = b[d2.argmin(1)]
        qs = x[:50]
        qr = qs if rot is None else qs @ rot
        scores = qr @ recon.T
        exact = qs @ x.T
        return sum(
            len(set(np.argsort(-scores[i])[:10]) & set(np.argsort(-exact[i])[:10]))
            for i in range(50)
        ) / 500

    learned = pq_ops.opq_learn_rotation(x, m=m, nbits=4, n_iter=15, seed=42)
    assert np.allclose(learned @ learned.T, np.eye(64), atol=1e-8)
    r_id, r_learned = adc_recall(None), adc_recall(learned)
    assert r_learned > r_id + 0.05, (r_id, r_learned)
    # determinism (oracle embeds this rotation as literals)
    again = pq_ops.opq_learn_rotation(x, m=m, nbits=4, n_iter=15, seed=42)
    assert np.array_equal(learned, again)


def test_pq_index_roundtrip(spark, tmp_path):
    import numpy as np

    base = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    queries = sample_ops.sample_queries(base, 5, seed=42)
    index = pq_ops.pq_build(base, m=8, nbits=4, seed=42)
    path = str(tmp_path / "pq")
    pq_ops.pq_write(index, path)
    loaded = pq_ops.pq_read(spark, path)
    assert np.array_equal(loaded.codebooks, index.codebooks)
    a = pq_ops.pq_adc_search(index, queries, 10).orderBy("query_id", "rank")
    b = pq_ops.pq_adc_search(loaded, queries, 10).orderBy("query_id", "rank")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
