"""Quantized storage and mixed-precision scoring.

Reference surface (SURVEY.md §2.1):
  O22 f32 -> f16 conversion        (tools/nvdb_convert_f16.cpp:20-119)
  O23 int8 quantization            (apps/nvdb_quantize_i8.cpp:12-16,57-85)
  O3  dequant projection           (include/nvdb/to_f32_row.h:10-34)
  O6  f32 x i8+scale dot product   (src/simd_dot.cpp:151-213)

Semantics reproduced exactly:
  * int8 is asymmetric per-row max-abs quantization: scale = max|x|/127,
    code = clamp(round-to-nearest-even(x/scale), ±127), one float scale
    per row appended to the payload (vecbin_format.h:52-55). Rounding is
    RNE because the reference uses lrint() under the default FP
    environment; Spark's bround and DuckDB's round_even match it.
  * f16 is an IEEE-754 half round-trip with round-to-nearest-even
    (include/nvdb/f16_scalar.h:8-36); Spark has no half type, so the
    column stays float but every value is f16-representable — ranking
    semantics in the quantized space are preserved, byte-level bandwidth
    effects are not (documented SURVEY.md §7).

At 100 TB the point of these codecs is scan-byte reduction: an int8
table is ~4x fewer parquet bytes than f32, and scoring stays entirely
in codegen'd expressions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nano_vectordb_spark.functions.vector import as_double_array, dot_expr

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def i8_scale_expr(vec: ColumnOrName) -> Column:
    """Per-row scale = max|x| / 127 (apps/nvdb_quantize_i8.cpp:71-74)."""
    return F.array_max(F.transform(as_double_array(vec), F.abs)) / F.lit(127.0)


def i8_encode_expr(vec: ColumnOrName, scale: ColumnOrName) -> Column:
    """code = clamp(RNE(x/scale), ±127) as array<tinyint>; all-zero rows
    (scale == 0) encode to zeros (apps/nvdb_quantize_i8.cpp:75-80)."""
    s = _col(scale)
    return F.transform(
        as_double_array(vec),
        lambda x: F.when(s == 0.0, F.lit(0))
        .otherwise(
            F.greatest(F.lit(-127.0), F.least(F.lit(127.0), F.bround(x / s)))
        )
        .cast("tinyint"),
    )


def i8_dequant_expr(codes: ColumnOrName, scale: ColumnOrName) -> Column:
    """Widen int8 codes back to doubles: x ≈ code * scale (reference O3)."""
    s = _col(scale)
    return F.transform(as_double_array(codes), lambda x: x * s)


def dot_i8_expr(query_vec: ColumnOrName, codes: ColumnOrName, scale: ColumnOrName) -> Column:
    """Mixed-precision dot: sum(q_j * code_j) * scale, matching the
    reference's widen-then-scale order (src/simd_dot.cpp:151-213) so the
    quantized ranking space is identical."""
    return dot_expr(query_vec, codes) * _col(scale)


_f16_round = F.pandas_udf(
    lambda s: s.map(
        lambda v: np.asarray(v, dtype=np.float32).astype(np.float16).astype(np.float32)
    ),
    T.ArrayType(T.FloatType()),
)


def f16_round_expr(vec: ColumnOrName) -> Column:
    """IEEE-754 half round-trip with RNE via NumPy (Arrow-batched; the
    only non-codegen step in the codec family, and it runs once at
    encode time, not in the scan hot path)."""
    return _f16_round(_col(vec))


def f16_round_local(vec) -> list[float]:
    """Driver-side f16 round-trip for tests/oracles."""
    return (
        np.asarray(vec, dtype=np.float32).astype(np.float16).astype(np.float32).tolist()
    )


def quantize_i8_df(df, vec_col: str = "embedding"):
    """Attach (scale, embedding_i8) columns — the sink-side of reference
    O23 as a derived table."""
    with_scale = df.withColumn("scale", i8_scale_expr(vec_col))
    return with_scale.withColumn("embedding_i8", i8_encode_expr(vec_col, F.col("scale")))


# --------------------------------------------------------------------------
# SQ8: per-DIMENSION trained scalar quantization (the FAISS
# ScalarQuantizer QT_8bit family), complementing the per-ROW max-abs
# codec above. Training learns (vmin_j, vdiff_j) per dimension from a
# bounded id prefix — the same sample-bounded training contract as the
# k-means fits (functions/kmeans.py) — then encode/reconstruct/score
# stay pure codegen expressions.
# --------------------------------------------------------------------------

SQ8_LEVELS = 255.0


def sq8_train(df, vec_col: str = "embedding", id_col: str = "vec_id",
              train_cap: int = 100_000) -> tuple[list[float], list[float]]:
    """Learn per-dimension (vmin, vdiff) on rows with id < train_cap.

    Distributed shape: posexplode -> hash aggregate (min/max partially
    aggregate map-side), D result rows collect to the driver. min/max
    are order-independent and exact on float32 inputs, so the fit is
    deterministic and engine-reproducible.
    """
    rows = (
        df.filter(F.col(id_col) < train_cap)
        .select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("vmin"), F.max("x").alias("vmax"))
        .collect()
    )
    d = 1 + max(r["dim"] for r in rows)
    vmin, vdiff = [0.0] * d, [0.0] * d
    for r in rows:
        vmin[r["dim"]] = float(r["vmin"])
        vdiff[r["dim"]] = float(r["vmax"]) - float(r["vmin"])
    return vmin, vdiff


def sq8_recon_expr(vec: ColumnOrName, vmin: list[float], vdiff: list[float]) -> Column:
    """Encode-then-reconstruct in one codegen expression:

      code_j = RNE(clamp((x_j - vmin_j) / vdiff_j * 255, 0, 255))
      recon_j = vmin_j + code_j / 255 * vdiff_j   (vdiff_j = 0 -> vmin_j)

    Operation order is fixed left-to-right so DuckDB replays it
    bit-exactly (bround == round_even, verified for the i8 codec)."""
    vm = F.lit([float(v) for v in vmin]).cast("array<double>")
    vd = F.lit([float(v) for v in vdiff]).cast("array<double>")

    def recon(x: Column, i: Column) -> Column:
        m = F.element_at(vm, i + 1)
        d = F.element_at(vd, i + 1)
        t = (x.cast("double") - m) / d * F.lit(SQ8_LEVELS)
        code = F.bround(F.greatest(F.lit(0.0), F.least(F.lit(SQ8_LEVELS), t)))
        return F.when(d == 0.0, m).otherwise(m + code / F.lit(SQ8_LEVELS) * d)

    return F.transform(_col(vec), recon)
