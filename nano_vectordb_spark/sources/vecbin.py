"""Reader/writer for the reference's on-disk vector formats.

Format parity with SURVEY.md §1.2 (layouts, not code, from
include/nvdb/vecbin_format.h:7-29 and src/vector_dataset.cpp:10-22):

  vecbin64: 64-byte header
      magic   u64   kMagic=0x4E56444256454331 stored little-endian,
                    so the file starts with bytes b"1CEVBDVN"
      version u32   == 1
      dtype   u32   1=float32, 2=float16, 3=int8
      dim     u32
      reserved u32
      count   u64
      (pad to 64 bytes)
    + row-major payload [count x dim x elem_width]
    + for int8: count float32 per-row scales appended
      (vecbin_format.h:52-55)

  raw12 (legacy): 12-byte header {count u32, reserved u32, dim u32}
    + float32 payload (src/vector_dataset.cpp:10-16).

Validation mirrors the reference's strict checks
(src/vector_dataset.cpp:42-69): magic, version, dtype whitelist, and
exact file-size-vs-payload match.

Scale note: these are single-file interchange formats from the
reference ecosystem (import/export only). The engine's at-rest store is
Parquet — columnar, splittable, predicate-pushdown-able; a 100 TB
corpus never lives in a vecbin file.
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# The reference stores magic as a little-endian uint64 constant
# (vecbin_format.h:7 kMagic = 0x4E56444256454331, "NVDBVEC1" read as a
# big-endian number), so the on-disk byte sequence is the REVERSED
# ASCII: b"1CEVBDVN". Matching bytes, not the mnemonic, is what makes
# real reference files load here and our exports load there.
MAGIC = (0x4E56444256454331).to_bytes(8, "little")  # b"1CEVBDVN"
VERSION = 1
DTYPE_F32, DTYPE_F16, DTYPE_I8 = 1, 2, 3
_WIDTH = {DTYPE_F32: 4, DTYPE_F16: 2, DTYPE_I8: 1}
_NP = {DTYPE_F32: np.float32, DTYPE_F16: np.float16, DTYPE_I8: np.int8}
_HEADER = struct.Struct("<8sIIIIQ")  # + pad to 64


def write_vecbin(
    path: str,
    matrix: np.ndarray,
    dtype: int,
    scales: np.ndarray | None = None,
) -> None:
    count, dim = matrix.shape
    if dtype not in _WIDTH:
        raise ValueError(f"unsupported dtype {dtype}")
    if dtype == DTYPE_I8:
        if scales is None or len(scales) != count:
            raise ValueError("int8 vecbin requires one float32 scale per row")
    payload = np.ascontiguousarray(matrix, dtype=_NP[dtype])
    header = _HEADER.pack(MAGIC, VERSION, dtype, dim, 0, count)
    with open(path, "wb") as f:
        f.write(header.ljust(64, b"\0"))
        f.write(payload.tobytes())
        if dtype == DTYPE_I8:
            f.write(np.ascontiguousarray(scales, dtype=np.float32).tobytes())


def write_raw12(path: str, matrix: np.ndarray) -> None:
    count, dim = matrix.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<III", count, 0, dim))
        f.write(np.ascontiguousarray(matrix, dtype=np.float32).tobytes())


def _read_np(path: str) -> tuple[np.ndarray, np.ndarray | None, int]:
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(64)
        if len(head) >= 8 and head[:8] == MAGIC:
            if len(head) < 64:
                raise ValueError("vecbin: truncated header")
            _, version, dtype, dim, _, count = _HEADER.unpack(head[: _HEADER.size])
            if version != VERSION:
                raise ValueError(f"vecbin: unsupported version {version}")
            if dtype not in _WIDTH:
                raise ValueError(f"vecbin: unsupported dtype {dtype}")
            payload = count * dim * _WIDTH[dtype]
            expect = 64 + payload + (4 * count if dtype == DTYPE_I8 else 0)
            if size != expect:
                raise ValueError(
                    f"vecbin: file size {size} != expected {expect} "
                    f"(count={count} dim={dim} dtype={dtype})"
                )
            mat = np.frombuffer(f.read(payload), dtype=_NP[dtype]).reshape(count, dim)
            scales = None
            if dtype == DTYPE_I8:
                scales = np.frombuffer(f.read(4 * count), dtype=np.float32)
            return mat, scales, dtype
        # raw12 fallback
        f.seek(0)
        head12 = f.read(12)
        if len(head12) < 12:
            raise ValueError("raw12: truncated header")
        count, _, dim = struct.unpack("<III", head12)
        if size != 12 + count * dim * 4:
            raise ValueError(f"raw12: file size {size} != 12 + {count}*{dim}*4")
        mat = np.frombuffer(f.read(count * dim * 4), dtype=np.float32).reshape(
            count, dim
        )
        return mat, None, DTYPE_F32


def read_vecbin(spark: SparkSession, path: str) -> DataFrame:
    """Load a vecbin/raw12 file as a DataFrame.

    f32/f16 -> (vec_id long, embedding array<float>); f16 values are
    widened (they remain f16-representable, preserving ranking
    semantics — SURVEY §1.3). i8 -> (vec_id, embedding_i8 array<tinyint>,
    scale float)."""
    mat, scales, dtype = _read_np(path)
    if dtype == DTYPE_I8:
        rows = [
            (i, [int(x) for x in mat[i]], float(scales[i])) for i in range(len(mat))
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding_i8 array<tinyint>, scale float"
        )
    widened = mat.astype(np.float32)
    rows = [(i, [float(x) for x in widened[i]]) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# gtbin_format.h:8 kGtMagic = 0x4E56444247543031 as little-endian bytes
GT_MAGIC = (0x4E56444247543031).to_bytes(8, "little")  # b"10TGBDVN"
_GT_HEADER = struct.Struct("<8sIIIIQQ")  # magic, version, metric, k, dim, Q, N


def write_gtbin(
    path: str,
    gt_ids: np.ndarray,  # (Q, k) uint32
    metric: int,
    dim: int,
    n_base: int,
) -> None:
    """Ground-truth artifact (layout from include/nvdb/gtbin_format.h:
    8-35): 64-byte header {magic NVDBGT01, version, metric, k, dim, Q,
    N} + uint32 ids[Q*k]."""
    q, k = gt_ids.shape
    header = _GT_HEADER.pack(GT_MAGIC, 1, metric, k, dim, q, n_base)
    with open(path, "wb") as f:
        f.write(header.ljust(64, b"\0"))
        f.write(np.ascontiguousarray(gt_ids, dtype=np.uint32).tobytes())


def read_gtbin(
    spark: SparkSession, path: str, expect: dict | None = None
) -> DataFrame:
    """Read a gtbin file as (query_id, k, gt_ids). ``expect`` optionally
    cross-validates header fields (k/dim/Q/N), mirroring the reference's
    strict 5-field check (apps/nvdb_ivf_eval.cpp:360-383)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(64)
        if len(head) < 64 or head[:8] != GT_MAGIC:
            raise ValueError("gtbin: bad magic")
        _, version, metric, k, dim, q, n = _GT_HEADER.unpack(head[: _GT_HEADER.size])
        if version != 1:
            raise ValueError(f"gtbin: unsupported version {version}")
        if size != 64 + 4 * q * k:
            raise ValueError(f"gtbin: file size {size} != 64 + 4*{q}*{k}")
        if expect:
            for field, val in expect.items():
                got = {"k": k, "dim": dim, "Q": q, "N": n}[field]
                if got != val:
                    raise ValueError(f"gtbin: header {field}={got}, expected {val}")
        ids = np.frombuffer(f.read(4 * q * k), dtype=np.uint32).reshape(q, k)
    rows = [(i, k, [int(x) for x in ids[i]]) for i in range(q)]
    return spark.createDataFrame(rows, "query_id long, k int, gt_ids array<bigint>")


# Driver-residency guard: the single-file legacy artifact is inherently
# driver-assembled (positional row ids, one contiguous payload); cap it
# like the other driver-resident paths (topk.py MAX_BROADCAST_QUERIES,
# rerank.py MAX_HEAD_ROWS) so a mis-call on a big table errors instead
# of OOMing the driver.
MAX_EXPORT_ROWS = 1_000_000


def export_vecbin(
    df: DataFrame, path: str, dtype: int = DTYPE_F32, vec_col: str = "embedding"
) -> None:
    """Export a vector DataFrame to vecbin, ordered by vec_id (row id is
    positional in the file format, gtbin_format.h:32).

    dtypes: F32 passthrough; F16 rounds every value to IEEE-754 half
    with round-to-nearest-even (NumPy's float64->float16 cast — the
    same RNE kernel as functions/quantize.f16_round_expr; artifact
    layout per tools/nvdb_convert_f16.cpp:183-196); I8 is per-row
    max-abs symmetric quantization with appended float32 scales.

    A vecbin file is an interchange artifact, not the at-rest store —
    exports above MAX_EXPORT_ROWS raise instead of collecting."""
    rows = (
        df.select("vec_id", vec_col)
        .orderBy("vec_id")
        .limit(MAX_EXPORT_ROWS + 1)
        .collect()
    )
    if len(rows) > MAX_EXPORT_ROWS:
        raise ValueError(
            f"export_vecbin assembles the single-file artifact on the "
            f"driver and supports at most {MAX_EXPORT_ROWS} rows; got "
            f"more. Export a slice, or keep the corpus in parquet (the "
            f"at-rest format)."
        )
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    if dtype == DTYPE_I8:
        scales = np.abs(mat).max(axis=1) / 127.0
        safe = np.where(scales == 0, 1.0, scales)
        codes = np.clip(np.rint(mat / safe[:, None]), -127, 127).astype(np.int8)
        write_vecbin(path, codes, DTYPE_I8, scales.astype(np.float32))
    else:
        write_vecbin(path, mat, dtype)
