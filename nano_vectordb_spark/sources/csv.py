"""CSV source for the document-ingest pipeline.

The reference's corpus pipeline streams a CSV of documents as its entry
point (SURVEY.md O33, scripts/build_vecbin_chunked.py:312-368); this is
the Spark-native equivalent: an explicit schema (schema inference is a
full extra pass at 100 TB — never infer), multiLine quoting so embedded
newlines in document text survive, and a post-read validation matching
the vecbin loader's strictness (sources/tables.py).

The writer exists so the roundtrip is testable end-to-end from the
driver parquet tables; at scale the CSV side is the upstream system's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',  # RFC-4180 doubled quotes, DuckDB-compatible
    "multiLine": "true",  # document text may contain newlines
}


def write_documents_csv(df: DataFrame, path: str) -> None:
    w = df.select([f.name for f in DOCUMENTS_SCHEMA.fields]).write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    r = spark.read.schema(DOCUMENTS_SCHEMA)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    df = r.csv(path)
    if [f.name for f in df.schema.fields] != [f.name for f in DOCUMENTS_SCHEMA.fields]:
        raise ValueError("documents CSV schema mismatch")
    return df
