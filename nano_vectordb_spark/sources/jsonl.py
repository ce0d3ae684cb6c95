"""JSONL source/sink for the document pipeline.

JSON-lines is the de-facto interchange format for training corpora
(one JSON object per line). Same contract as the CSV source
(sources/csv.py): explicit schema on read — schema inference is a full
extra pass at 100 TB, never infer — and post-read column validation.
JSONL is actually the safer container for document text: embedded
newlines and quotes are escaped per-field, so no multiLine parsing is
needed and files stay line-splittable (each task can split at any
byte offset and resync on '\n'), which keeps huge files parallel.

The writer exists so the roundtrip is testable end-to-end from the
driver parquet tables; at scale the JSONL side is the upstream
system's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .csv import DOCUMENTS_SCHEMA


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    (
        df.select([f.name for f in DOCUMENTS_SCHEMA.fields])
        .write.mode("overwrite")
        # keep nulls explicit so a reread sees the same shape row-by-row
        .option("ignoreNullFields", "false")
        .json(path)
    )


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    # FAILFAST surfaces corrupt lines; the explicit schema fixes the
    # field names/types, so no post-read schema check is needed (a read
    # with .schema(...) always yields exactly those fields)
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )
