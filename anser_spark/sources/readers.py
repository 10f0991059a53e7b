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

__all__ = ["read_parquet_table", "read_table", "version_schema"]

_NS_CACHE: dict[str, list[str]] = {}

#: Sidecar recording a version directory's authoritative UNION schema.
#: Written only when a schema-evolving partial rewrite or append leaves
#: the directory's parquet files carrying MIXED schemas (round 13): an
#: explicit read schema makes Spark null-fill columns a file lacks, so
#: an add-a-field mutation can hard-link every untouched file instead
#: of rewriting the corpus. The leading underscore keeps it invisible
#: to Spark's file listing and to the engine's _data_files walk.
VERSION_SCHEMA_SIDECAR = "_SCHEMA.json"


def version_schema(path: str):
    """The union StructType recorded for a mixed-schema version
    directory, or None for homogeneous datasets (the common case —
    checked with one stat call, no footer reads)."""
    if not os.path.isdir(path):
        return None
    p = os.path.join(path, VERSION_SCHEMA_SIDECAR)
    if not os.path.isfile(p):
        return None
    import json

    from pyspark.sql import types as T

    try:
        with open(p) as fh:
            return T.StructType.fromJson(json.load(fh))
    except (OSError, ValueError, KeyError):
        return None


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


#: (path → (freshness stamp, inferred StructType)). Parquet schema
#: inference costs a JVM footer read + py4j round trips (~60ms) on
#: EVERY ``spark.read.parquet`` — and the engine re-reads the current
#: version on each ``df()`` call, so a mutation gate paid it 3× per
#: mutation (round 14, guide §1). The stamp captures the first data
#: file's identity (mtime_ns, size, inode — os.replace always
#: publishes a new inode) plus the dataset dir's mtime_ns (a new
#: version dir is a NEW path; appends/removals touch the dir), so any
#: layout change re-infers.
_SCHEMA_CACHE: dict[str, tuple[tuple, object]] = {}


def _schema_stamp(path: str) -> tuple | None:
    try:
        st_root = os.stat(path)
        target = path
        if os.path.isdir(path):
            target = None
            for root, _dirs, fs in os.walk(path):
                hit = next(
                    (f for f in sorted(fs) if f.endswith(".parquet")), None
                )
                if hit:
                    target = os.path.join(root, hit)
                    break
            if target is None:
                return None
        st = os.stat(target)
        return (
            target, st.st_mtime_ns, st.st_size, st.st_ino, st_root.st_mtime_ns
        )
    except OSError:
        return None


def prime_schema_cache(path: str, schema) -> None:
    """Record a just-written dataset's schema so its first read skips
    the parquet footer-inference job (Spark 4 reads footers via a
    distributed job on every uncached ``spark.read.parquet``) — one
    job per mutation across the version-publish paths (round 14,
    guide §1.2). Callers pass the exact schema of the frame written;
    parquet round-trips it (nullable ↔ optional), so the entry equals
    what inference would return. Sidecar-carrying dirs never consult
    the cache and are skipped."""
    if version_schema(path) is not None:
        return
    stamp = _schema_stamp(path)
    if stamp is not None:
        _SCHEMA_CACHE[path] = (stamp, schema)


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
    reader = spark.read
    union = version_schema(path)
    stamp = None
    if union is not None:
        # mixed-schema version dir (see VERSION_SCHEMA_SIDECAR): the
        # recorded union schema null-fills per file — no mergeSchema
        # footer sweep, no silently-dropped columns
        reader = reader.schema(union)
    else:
        stamp = _schema_stamp(path)
        cached = _SCHEMA_CACHE.get(path) if stamp is not None else None
        if cached is not None and cached[0] == stamp:
            reader = reader.schema(cached[1])
            stamp = None  # already served from cache — skip re-store
    if files is not None:
        df = reader.option("basePath", path).parquet(*files)
        stamp = None  # never cache a schema inferred from a file subset
    else:
        df = reader.parquet(path)
    if stamp is not None:
        _SCHEMA_CACHE[path] = (stamp, df.schema)
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
