"""nano-vectordb-spark: a PySpark-native analytics engine with the query
and data-processing capabilities of the reference vector search engine
(ntnu-yjyjames/nano-vectordb), re-expressed Spark-first.

The reference is a C++17/CUDA flat-scan / IVF / PQ vector search engine
(see SURVEY.md). This package implements the same semantics on the Spark
DataFrame API — declarative plans, Catalyst optimization, partition
pruning for IVF, broadcast joins for small sides — plus the LLM-data-
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) that a 100 TB training-data pipeline needs.

Layout:
    functions/   column-expression builders (vector math, quantization, text)
    operators/   DataFrame->DataFrame operators (topk, ivf, dedup, metrics, ...)
    sources/     table loaders and the vecbin binary format reader/writer
    plans/       plan-inspection helpers (explain, shuffle audit)
    streaming/   Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
