"""Streaming ingestion into versioned engine collections.

Structured Streaming's ``foreachBatch`` is the Spark-native bridge
between a stream and a batch sink with its own transactional story:
each micro-batch appends to the collection through the engine's
append-only copy-on-write (existing files hard-link, only the batch's
rows write), and version visibility is the engine's atomic pointer
swap — readers always see a complete version, never a half-written
batch.

Exactly-once: Structured Streaming guarantees a deterministic,
monotonically increasing ``batch_id`` per checkpoint, and re-delivers a
batch (same id, same data) if the previous attempt wasn't known to
commit. The sink records the last committed batch id INSIDE the
collection's version pointer (``Collection.pointer_meta``), which is
swapped with one atomic rename — so the marker and the batch's rows
become visible together, and a replayed batch is recognized and
skipped. That upgrades foreachBatch's native at-least-once contract to
exactly-once for this sink (the standard "idempotent foreachBatch via
batchId" pattern from the Structured Streaming programming guide).

At scale this is the standard "streaming ingest into a lakehouse
table" shape: bounded work per batch, no global state, and the
collection stays queryable by every batch/fluent/pipeline operator
while the stream runs.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

from pyspark.sql import DataFrame

__all__ = ["stream_into_collection"]


def _sink_id(checkpoint_dir: str) -> str:
    """Stable identity for one (stream, checkpoint) lineage: batch ids
    are only comparable within a checkpoint, so the committed-batch
    marker is keyed by it. Hashing the ABSOLUTE path keeps the key
    stable across restarts from the same checkpoint while distinct
    checkpoints (new lineage, ids restart) get distinct markers."""
    norm = os.path.abspath(checkpoint_dir)
    return "ingest_" + hashlib.md5(norm.encode()).hexdigest()[:12]


def stream_into_collection(
    stream: DataFrame,
    collection: Any,
    checkpoint_dir: str,
    query_name: str | None = None,
    available_now: bool = False,
    dedup_index: str | None = None,
    dedup_threshold: float = 0.7,
):
    """Start a streaming query appending every micro-batch to
    ``collection``. Returns the StreamingQuery (caller awaits /
    stops it).

    ``available_now=True`` processes everything currently available
    and stops — the batch-backfill trigger. Appends are EXACTLY-ONCE:
    the last committed batch id rides in the collection's atomic
    version pointer, so a batch retried after its append committed
    (but before the stream checkpoint advanced) is detected and
    skipped instead of appending twice — no keyed dedup needed
    downstream. ``streaming_first_seen`` remains the tool for
    SOURCE-side duplicates (same logical record delivered as two
    different batches), which no sink-side marker can detect.

    ``dedup_index`` names a ``kind="minhash"`` search index on the
    collection: each batch is near-dup-filtered against the CORPUS
    before appending, and the surviving documents' signatures extend
    the index — the full incremental-ingest dedup loop (corpus
    signatured once, each batch pays only its own cost; batch N+1
    dedups against batch N without any rebuild). Index maintenance
    caveat: the signature append runs after the data commit, so a
    crash exactly between them leaves one batch's signatures missing
    until the index is rebuilt — later duplicates OF THAT BATCH would
    pass (bounded incompleteness). The orders are deliberate: the
    reverse order could drop a replayed batch's rows against its own
    signatures — data loss beats a stale index. Batch-INTERNAL
    duplicates are out of scope (streaming_first_seen upstream)."""
    marker = _sink_id(checkpoint_dir)

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        committed = collection.pointer_meta().get(marker)
        if committed is not None and int(committed) >= batch_id:
            return  # replay of a batch whose append already committed
        if batch_df.isEmpty():
            return
        if dedup_index is None:
            collection.insert_df(batch_df, pointer_meta={marker: str(batch_id)})
            return
        from pyspark.storagelevel import StorageLevel

        kept = collection.dedup_batch_against_index(
            batch_df, dedup_index, dedup_threshold
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if not kept.isEmpty():
                collection.insert_df(kept, pointer_meta={marker: str(batch_id)})
                collection.append_to_minhash_index(dedup_index, kept)
        finally:
            kept.unpersist()

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
