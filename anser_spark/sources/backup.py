"""Collection backup — the reference's backup.Collection
(backup/backup.go:21-54 API, 79-150 data path, 152-200 index metadata):
stream a (filtered, sorted, limited) collection to a target plus a
metadata sidecar.

Spark-first shape: the data export is `df.where(q).orderBy(s).limit(n)
.write.parquet(...)` — a distributed write, no driver materialization;
the 'index metadata' sidecar becomes a schema + layout manifest JSON.
`indexes_only` skips the data write entirely (backup.go IndexesOnly).
The reference's upfront count (EstimatedDocumentCount vs CountDocuments,
backup.go:79-101) is kept for the returned report.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections.abc import Mapping, Sequence
from dataclasses import dataclass
from typing import Any

logger = logging.getLogger("anser_spark.backup")

from anser_spark.engine import Collection
from anser_spark.functions.filters import compile_filter
from anser_spark.functions.sort import parse_sort_keys

__all__ = ["BackupOptions", "backup_collection", "restore_collection"]


@dataclass
class BackupOptions:
    """Mirror of backup.Options (backup/backup.go:21-38)."""

    target_dir: str
    query: Mapping[str, Any] | None = None
    sort: Sequence[str] | None = None
    limit: int = 0
    indexes_only: bool = False
    enable_logging: bool = False
    # export format: parquet (native), orc (columnar interchange),
    # json (mongoexport analogue: one JSON document per line), csv
    format: str = "parquet"


def backup_collection(collection: Collection, options: BackupOptions) -> dict[str, Any]:
    """Returns a report dict {namespace, count, data_path, metadata_path}.

    ``enable_logging`` mirrors the reference's every-1000-docs progress
    cadence (backup/backup.go:112-146). The write itself is one
    distributed job (no driver-side cursor to hook), so progress lines
    are emitted at file-commit granularity: after the job, written
    parquet footers are walked in order (metadata-only, no data read)
    and a line fires for each 1000-document boundary a file commit
    crossed, then a final summary — same fields (ns, seen, count,
    dur_secs), per-file rather than per-document resolution."""
    ns = collection.namespace
    start_at = time.monotonic()
    os.makedirs(options.target_dir, exist_ok=True)
    base = os.path.join(options.target_dir, f"{ns.db}.{ns.collection}")
    metadata_path = base + ".metadata.json"

    df = collection.df()
    # upfront count: metadata-only when unfiltered (EstimatedDocumentCount,
    # backup.go:91), filtered count otherwise (CountDocuments, backup.go:95)
    if options.query:
        count = df.where(compile_filter(options.query, df.schema)).count()
    else:
        count = collection.estimated_document_count()

    report: dict[str, Any] = {
        "namespace": str(ns),
        "count": count,
        "metadata_path": metadata_path,
        "data_path": None,
    }

    manifest = {
        "namespace": str(ns),
        "collection": ns.collection,
        "db": ns.db,
        "schema": json.loads(df.schema.json()),
        "options": {
            "query": dict(options.query or {}),
            "sort": list(options.sort or []),
            "limit": options.limit,
        },
        "count": count,
    }
    with open(metadata_path, "w") as fh:
        json.dump(manifest, fh, indent=2)

    if options.enable_logging:
        logger.info(
            "backup started ns=%s count=%d", ns, count
        )
    if not options.indexes_only:
        out = df
        if options.query:
            out = out.where(compile_filter(options.query, df.schema))
        order = parse_sort_keys(options.sort)
        if order:
            out = out.orderBy(*order)
        if options.limit:
            out = out.limit(options.limit)
        fmt = options.format or "parquet"
        if fmt not in ("parquet", "orc", "json", "csv"):
            raise ValueError(f"unsupported backup format: {fmt!r}")
        data_path = base + "." + fmt
        writer = out.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        getattr(writer, fmt)(data_path)
        report["data_path"] = data_path
        if options.enable_logging and fmt == "parquet":
            _log_progress(ns, data_path, count, start_at)
    if options.enable_logging:
        logger.info(
            "backup finished ns=%s count=%d dur_secs=%.3f",
            ns, count, time.monotonic() - start_at,
        )
    return report


def restore_collection(
    engine: Any,
    source_dir: str,
    namespace: str | None = None,
    db: str | None = None,
    collection: str | None = None,
) -> dict[str, Any]:
    """Restore a ``backup_collection`` export into a (possibly renamed)
    collection — the mongorestore analogue the reference pairs with its
    backup sink.

    ``namespace`` picks which backup inside ``source_dir`` to restore
    ("db.coll", required only when the directory holds several);
    ``db``/``collection`` override the restore target (defaults: the
    backed-up namespace). The data format is auto-detected from the
    export's file extension; json/csv restores re-apply the manifest's
    schema so types (timestamps, longs-vs-ints, nested structs for
    json) round-trip instead of being re-inferred. The read+write is
    one distributed job into a fresh collection version (atomic pointer
    swap — a failed restore never corrupts an existing collection)."""
    manifests = sorted(
        f for f in os.listdir(source_dir) if f.endswith(".metadata.json")
    )
    if namespace is not None:
        manifests = [f for f in manifests if f == f"{namespace}.metadata.json"]
    if not manifests:
        raise FileNotFoundError(
            f"no backup metadata found in {source_dir!r}"
            + (f" for namespace {namespace!r}" if namespace else "")
        )
    if len(manifests) > 1:
        raise ValueError(
            f"multiple backups in {source_dir!r}: "
            f"{[m[: -len('.metadata.json')] for m in manifests]} — "
            "pass namespace= to pick one"
        )
    metadata_path = os.path.join(source_dir, manifests[0])
    with open(metadata_path) as fh:
        manifest = json.load(fh)
    base = metadata_path[: -len(".metadata.json")]
    fmt = next(
        (f for f in ("parquet", "orc", "json", "csv") if os.path.exists(base + "." + f)),
        None,
    )
    if fmt is None:
        raise FileNotFoundError(
            f"backup {manifest['namespace']} has no data export "
            "(indexes_only backup?) — nothing to restore"
        )
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(manifest["schema"])
    spark = engine.spark
    if fmt == "parquet":
        df = spark.read.parquet(base + ".parquet")
    elif fmt == "orc":
        df = spark.read.orc(base + ".orc")
    elif fmt == "json":
        df = spark.read.schema(schema).json(base + ".json")
    else:
        df = spark.read.schema(schema).option("header", "true").csv(base + ".csv")
    target = engine.db(db or manifest["db"]).collection(
        collection or manifest["collection"]
    )
    target._rewrite(df)
    return {
        "namespace": str(target.namespace),
        "source_namespace": manifest["namespace"],
        "count": target.count(),
        "format": fmt,
        "data_path": base + "." + fmt,
    }


def _log_progress(ns: Any, data_path: str, count: int, start_at: float) -> None:
    """Every-1000-docs progress lines from written parquet footers
    (file-commit granularity; metadata-only, no data re-read)."""
    import pyarrow.parquet as pq

    files = []
    for root, _dirs, names in os.walk(data_path):
        files.extend(
            os.path.join(root, f)
            for f in names
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    seen = 0
    last_mark = 0
    for f in sorted(files):
        try:
            seen += pq.ParquetFile(f).metadata.num_rows
        except Exception:  # noqa: BLE001 — progress is best-effort
            continue
        if seen // 1000 > last_mark:
            last_mark = seen // 1000
            logger.info(
                "backup progress ns=%s seen=%d count=%d dur_secs=%.3f",
                ns, seen, count, time.monotonic() - start_at,
            )
