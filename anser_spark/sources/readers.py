"""Parquet source reader with nanosecond-timestamp normalization.

Spark's vectorized Parquet reader rejects TIMESTAMP(NANOS) columns
(PARQUET_TYPE_ILLEGAL). With ``spark.sql.legacy.parquet.nanosAsLong``
they scan as LongType nanos; this reader detects such columns from the
Parquet footer (metadata-only, driver-side) and converts them back to
proper timestamps via ``timestamp_micros`` — a pure JVM expression, so
the scan stays vectorized and distributed.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_parquet_table", "read_table"]

_NS_CACHE: dict[str, list[str]] = {}


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as timestamp[ns], from the footer of one file."""
    if path in _NS_CACHE:
        return _NS_CACHE[path]
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            hit = next((f for f in sorted(files) if f.endswith(".parquet")), None)
            if hit:
                target = os.path.join(root, hit)
                break
    cols: list[str] = []
    try:
        # Inspect the *parquet physical* schema, not the arrow view:
        # Spark-written INT96 timestamps surface as timestamp[ns] in
        # arrow but Spark reads them natively — only INT64/nanos columns
        # actually trip PARQUET_TYPE_ILLEGAL.
        pschema = pq.ParquetFile(target).metadata.schema
        for i in range(len(pschema)):
            col = pschema.column(i)
            if (
                col.physical_type == "INT64"
                and "nanoseconds" in str(col.logical_type or "")
            ):
                cols.append(col.name)
    except (OSError, ValueError, pa.lib.ArrowException) as exc:
        # ArrowException is the pyarrow base class — the probe is
        # advisory, so ANY arrow failure (NotImplemented on exotic
        # footers, encrypted files, …) skips the ns-rewrite; the plain
        # scan will surface any real read error with full context
        logging.getLogger(__name__).debug(
            "ns-timestamp probe failed for %s: %s", target, exc
        )
        cols = []
    _NS_CACHE[path] = cols
    return cols


def read_parquet_table(
    spark: SparkSession,
    path: str,
    file_col: str | None = None,
    files: list[str] | None = None,
) -> DataFrame:
    """Read a parquet dataset (dir or single file).

    ``file_col`` adds the source file path of each row (from the
    ``_metadata.file_path`` hidden column, captured at the scan before
    any transformation) — the hook for file-level copy-on-write pruning.
    ``files`` restricts the scan to specific data files while keeping
    ``path`` as basePath so hive-partition columns still resolve.
    """
    ns_cols = _ns_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if files is not None:
        df = spark.read.option("basePath", path).parquet(*files)
    else:
        df = spark.read.parquet(path)
    if file_col:
        df = df.withColumn(file_col, F.col("_metadata.file_path"))
    for name in ns_cols:
        # ns → µs truncation; timestamp_micros stays inside codegen.
        # Integer `div`, NOT float division: ns epoch values (~1.7e18)
        # exceed double's exact-integer range (2^53), so `/1000` then
        # cast can be off by ±1µs vs exact truncation.
        df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` div 1000")))
    return df


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatched source reader: parquet datasets (the native
    format), ORC (Spark-native columnar interchange), plus JSON-lines
    and CSV single-file sources (mongoimport/mongoexport analogues).
    Non-parquet sources become parquet on the first mutation (every
    version write is parquet)."""
    lower = path.lower()
    if lower.endswith((".json", ".jsonl", ".ndjson")):
        return spark.read.json(path)
    if lower.endswith(".csv"):
        return spark.read.csv(path, header=True, inferSchema=True)
    if lower.endswith(".orc"):
        return spark.read.orc(path)
    return read_parquet_table(spark, path)
