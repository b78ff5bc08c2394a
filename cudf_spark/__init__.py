"""cudf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rapidsai/cudf.

The reference (/root/reference, rapidsai/cudf) is a CUDA columnar kernel
library; this package re-expresses its operator inventory (SURVEY.md §2)
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, Pandas
UDFs only where built-in operators cannot express the semantics.

Layout
------
- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC).
- ``catalog``    — loaders for the ten fixture tables.
- ``queries``    — the operator-coverage query registry: every operator
  from SURVEY.md §2 is exercised by a named query with a DuckDB oracle.
- ``operators``  — composite operators Spark lacks natively (as-of join,
  EWMA, min-hash LSH dedup, ANN search, sessionize, top-k per group).
- ``functions``  — scalar-function shims mirroring libcudf semantics
  (zfill/swapcase/title, timestamp ceil/round, jaccard, cross-engine
  deterministic hashing).
- ``streaming``  — Structured Streaming operators (watermarked windows,
  stateful dedup) mirroring cudf's chunked streaming layer.
- ``multimodal`` — binary-column (image/audio) plumbing with stubbed
  decoders.
"""

__version__ = "0.1.0"
