"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pipeline-extension surface (per BASELINE.json north star): image/audio/
video payloads ride as `binary` columns with metadata; decode /
feature-extract / frame-sample run as Arrow-batched Pandas functions
over mapInPandas. The container has no image/audio libraries, so the
actual decoders are STUBBED behind `decoder="real"` (raises
NotImplementedError, clearly marked); `decoder="fake"` is a
deterministic stand-in (md5-seeded features) that keeps the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — fully real
and testable.

Scale notes: blobs stay opaque bytes end-to-end (no driver collect);
feature extraction is a narrow per-partition map with Arrow transfer;
frame sampling explodes bounded slices.
"""

from __future__ import annotations

import hashlib
import math
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import cloudpickle

# Worker-shipped closures here reference module-level helpers
# (_fake_decode). By default cloudpickle serializes those by reference,
# which requires this package to be importable on every executor — not
# true when an external harness drives Spark from a different cwd.
# By-value registration makes the shipped task self-contained.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column (stand-in for image bytes) +
    typed metadata, as an upstream loader would provide."""
    blob = F.col(text_col).cast("binary")
    return df.withColumn("blob", blob).withColumn(
        "blob_meta",
        F.struct(
            F.length(blob).alias("byte_len"),
            F.lit("fake/raw").alias("mime"),
        ),
    )


def _fake_decode(blob: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decode + feature extraction:
    md5-chained pseudo-features (uniform in [-0.5, 0.5), L2-normalized),
    pseudo width/height from the digest. Pure md5 arithmetic — not an
    engine RNG — so any engine with md5 reproduces it bit-for-bit (the
    registry oracle replays it in DuckDB SQL)."""
    digest = hashlib.md5(blob).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    feat = []
    for i in range(dim):
        h = int(hashlib.md5(blob + b":%d" % i).hexdigest()[:7], 16)
        feat.append(h / float(2**28) - 0.5)  # exact: 28-bit int / 2^28
    n = 0.0
    for x in feat:
        n += x * x
    n = math.sqrt(n)
    return width, height, ([x / n for x in feat] if n > 0 else feat)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    decoder: str = "fake",
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Decode blobs and emit (id, width, height, byte_len, features)
    via mapInPandas — the real 100 TB shape: Arrow batches in, narrow
    map, no shuffle."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decoding requires PIL/libvips, not present in this "
            "container — plug a decoder into _fake_decode's slot"
        )
    if decoder != "fake":
        raise ValueError(f"decoder must be 'real' or 'fake', got {decoder!r}")

    schema = (
        f"{id_col} long, width int, height int, byte_len int, "
        "features array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: pdf[id_col].to_numpy(),
                "width": [],
                "height": [],
                "byte_len": [],
                "features": [],
            }
            for blob in pdf[blob_col]:
                raw = bytes(blob)
                w, h, feat = _fake_decode(raw, dim)
                out["width"].append(w)
                out["height"].append(h)
                out["byte_len"].append(len(raw))
                out["features"].append(feat)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Sample n evenly-spaced fixed-width slices of each blob ("frames"
    of a pretend video) as an explode — pure narrow transform."""
    size = F.length(blob_col)
    frame_w = F.greatest(F.floor(size / n_frames).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return (
        df.select(
            F.col(id_col),
            F.posexplode(idx).alias("frame_id", "__i"),
            F.col(blob_col).alias("__b"),
            frame_w.alias("__w"),
        )
        .filter(F.col("__i") * F.col("__w") < F.length("__b"))
        .select(
            id_col,
            "frame_id",
            F.substring(F.col("__b"), F.col("__i") * F.col("__w") + 1, 64).alias(
                "frame_bytes"
            ),
        )
    )


def byte_histogram_signatures(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Per-blob byte-level signature: (id, byte_len, 16-bucket high-
    nibble histogram) — the codec-free analog of a perceptual hash
    (integer-exact, engine-reproducible). NumPy-vectorized per payload
    (frombuffer + bincount) over Arrow batches via mapInPandas: narrow
    map, no shuffle, blobs never leave the executors."""
    import numpy as np

    schema = f"{id_col} long, byte_len long, hist array<long>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens, hists = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                h = np.bincount(b >> 4, minlength=16)
                ids.append(i)
                lens.append(int(b.size))
                hists.append([int(x) for x in h[:16]])
            yield pd.DataFrame({id_col: ids, "byte_len": lens, "hist": hists})

    return df.select(id_col, blob_col).mapInPandas(run, schema)
