"""Sources & sinks — the cudf I/O surface (SURVEY §2.1, cpp/src/io/:
parquet/orc/csv/json/avro read+write, ~102k LoC of kernels) mapped onto
Spark's DataSource framework, which already provides projection/predicate
pushdown, chunked reads (file splits), and compression codecs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "csv", "json", "avro", "text")


def read(spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options) -> DataFrame:
    """Uniform reader. CSV/JSON take an explicit schema in production paths
    (inference is a full extra pass at 100 TB)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "avro":
        # spark-avro is a separate jar; probe lazily so environments
        # without it fail with a clear message (import-try contract).
        try:
            return reader.format("avro").options(**options).load(path)
        except Exception as exc:  # pragma: no cover - depends on classpath
            raise RuntimeError("avro support requires the spark-avro package on the classpath") from exc
    return reader.format(fmt).options(**options).load(path)


def write(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", partition_by=None, **options) -> None:
    """Uniform writer; ``partition_by`` maps to hive-style directory
    partitioning (the scan-pruning layout for 100 TB tables)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.format(fmt).options(**options).save(path)
