"""Streaming ingestion into versioned engine collections.

Structured Streaming's ``foreachBatch`` is the Spark-native bridge
between a stream and a batch sink with its own transactional story:
each micro-batch appends to the collection through the engine's
append-only copy-on-write (existing files hard-link, only the batch's
rows write), and version visibility is the engine's atomic pointer
swap — readers always see a complete version, never a half-written
batch.

At scale this is the standard "streaming ingest into a lakehouse
table" shape: bounded work per batch, no global state, and the
collection stays queryable by every batch/fluent/pipeline operator
while the stream runs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = ["stream_into_collection"]


def stream_into_collection(
    stream: DataFrame,
    collection: Any,
    checkpoint_dir: str,
    query_name: str | None = None,
    available_now: bool = False,
):
    """Start a streaming query appending every micro-batch to
    ``collection``. Returns the StreamingQuery (caller awaits /
    stops it).

    ``available_now=True`` processes everything currently available
    and stops — the batch-backfill trigger. Exactly-once note: the
    checkpoint tracks which source offsets each batch covered; a batch
    retried AFTER its collection append but before checkpoint commit
    would append twice — the same at-least-once contract as any
    non-idempotent foreachBatch sink. Pair with
    ``streaming_first_seen`` (keyed dedup) or an idempotent key +
    downstream exact_dedup for exactly-once effect.
    """

    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        collection.insert_df(batch_df)

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
