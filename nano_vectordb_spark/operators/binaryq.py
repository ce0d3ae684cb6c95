"""Binary (1-bit sign) quantization and Hamming-distance search.

The coarsest rung of the reference's precision ladder (f32 -> f16 ->
int8+scale -> PQ, SURVEY.md §2.1 O5/O6/O22/O23/O27): keep only the sign
bit of every dimension, so a D=64 vector stores in 8 bytes — 32x fewer
scan bytes than f32 (the same bandwidth argument as the reference's
INT8-vs-FP16 scan tables, Performance.md). Hamming distance between
sign signatures approximates angular distance, so the standard plan is
candidate generation by Hamming over the tiny signature table followed
by exact rescoring of the surviving R rows — the reference's staged
candidates->refine pipeline (O32, apps/nvdb_ivf_eval.cpp:278-307)
applied to a different codec.

Engine-portability choice: signatures are packed into TWO 32-bit halves
(sig_lo = dims 0..31, sig_hi = dims 32..63) held in BIGINT columns, the
same trick as the simhash64 operator — bit 31/63 never touches a sign
bit in either engine, so Spark and DuckDB agree without relying on
64-bit shift-overflow semantics.

Scale shape: the signature table is a materialized sink (16-24 bytes a
row); stage 1 is a codegen'd xor+bit_count scan of ONLY that table into
a TakeOrderedAndProject partial top-R; stage 2 is a broadcast join of R
candidate ids back to the f32 base. A 100 TB corpus scans ~0.8 TB of
signatures and re-reads R rows — never the full-precision table.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HALF_BITS = 32


def _sign_half_expr(vec_col: str, lo_dim: int) -> Column:
    """Pack sign bits of dims [lo_dim, lo_dim+32) into one BIGINT.

    Bits are disjoint so the additive fold equals the bitwise OR; the
    fold stays a codegen'd higher-order expression (no UDF).
    """
    return F.expr(
        f"aggregate(transform(slice({vec_col}, {lo_dim + 1}, {HALF_BITS}), "
        f"(x, i) -> IF(x > 0, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)"
    )


def with_signature(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Attach (sig_lo, sig_hi) sign-signature columns (the sink-side
    encode pass, run once like the reference's quantize tools)."""
    if dim != 2 * HALF_BITS:
        raise ValueError(f"binary signature expects dim {2 * HALF_BITS}, got {dim}")
    return df.withColumn("sig_lo", _sign_half_expr(vec_col, 0)).withColumn(
        "sig_hi", _sign_half_expr(vec_col, HALF_BITS)
    )


def sign_signature_np(vec) -> tuple[int, int]:
    """Driver-side signature of a query vector (same bit layout)."""
    v = np.asarray(vec, dtype=np.float64)
    if v.shape[0] != 2 * HALF_BITS:
        raise ValueError(f"binary signature expects dim {2 * HALF_BITS}")
    bits = (v > 0).astype(np.int64)
    lo = int((bits[:HALF_BITS] << np.arange(HALF_BITS, dtype=np.int64)).sum())
    hi = int((bits[HALF_BITS:] << np.arange(HALF_BITS, dtype=np.int64)).sum())
    return lo, hi


def hamming_expr(q_lo: int, q_hi: int) -> Column:
    """Hamming distance of (sig_lo, sig_hi) to a query signature —
    xor + bit_count, pure codegen in both engines."""
    return (
        F.bit_count(F.expr(f"sig_lo ^ {q_lo}L"))
        + F.bit_count(F.expr(f"sig_hi ^ {q_hi}L"))
    ).cast("int")


def hamming_candidates(
    sig: DataFrame, q_lo: int, q_hi: int, r: int, id_col: str = "vec_id"
) -> DataFrame:
    """Stage 1: top-R rows by (hamming asc, vec_id asc) over the
    signature table only — plans as TakeOrderedAndProject (per-partition
    partial top-R, the reference's O9/O13 heap shape)."""
    return (
        sig.select(F.col(id_col).alias("vec_id"), hamming_expr(q_lo, q_hi).alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col("vec_id").asc())
        .limit(r)
    )


def topk_binary_rescore(
    sig: DataFrame,
    base: DataFrame,
    query_vec,
    k: int,
    rescore_r: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary candidate generation + exact dot rescore (staged O32
    pipeline). Returns (vec_id, hamming, score, rank) with rank <= k.

    The candidate set (R rows) broadcasts to the base join, so the
    full-precision table is probed, never scanned.
    """
    from nano_vectordb_spark.functions.vector import dot_expr

    q_lo, q_hi = sign_signature_np(query_vec)
    cand = F.broadcast(hamming_candidates(sig, q_lo, q_hi, rescore_r, id_col))
    qlit = F.lit([float(x) for x in query_vec]).cast("array<double>")
    scored = cand.join(
        base.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__bvec")),
        "vec_id",
    ).select("vec_id", "hamming", dot_expr("__bvec", qlit).alias("score"))
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "hamming", "score", "rank")
    )
