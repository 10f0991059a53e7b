"""Sequence packing for LLM training pipelines: map variable-length
documents onto fixed-capacity token blocks.

The scheme is concat-then-chunk — the packing actually used for
pretraining corpora: documents are laid end-to-end in a deterministic
order and the stream is cut into ``capacity``-token blocks, so a doc
may straddle a block boundary (its span is reported as
``block_start..block_end``). This is fully expressible with window
cumulative sums, which makes it (a) exactly reproducible by any SQL
engine — the correctness gate runs it against DuckDB — and (b) free of
sequential state, unlike first-fit bin packing whose close-the-bin
recurrence cannot parallelize.

Scale design: a global ``ORDER BY id`` window would funnel 100 TB
through one task, so packing is sharded — each shard (an explicit
column, or ``id % num_shards``) packs independently with its own block
numbering, and the window partitions on the shard. Blocks are then
addressed by (shard, block). Shards are embarrassingly parallel and
the per-shard sort is a shuffle-range sort, not a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    capacity: int = 2048,
    num_shards: int = 32,
    shard_col: Column | None = None,
) -> DataFrame:
    """Assign every document a deterministic position in the packed
    token stream of its shard.

    Adds columns:
      - ``shard``: ``shard_col`` if given, else ``pmod(id, num_shards)``
      - ``pack_offset``: tokens preceding this doc in its shard stream
      - ``block_start`` / ``block_end``: first and last
        ``capacity``-token block the doc occupies (empty docs occupy
        their starting block only)

    Deterministic given (ids, token counts, capacity, sharding) —
    re-running on the same corpus reproduces the same layout, which is
    what makes packed-corpus builds resumable and auditable.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    shard = shard_col if shard_col is not None else F.pmod(F.col(id_col), F.lit(num_shards))
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = out.withColumn(
        "pack_offset", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    )
    tokens = F.col(token_col).cast("long")
    out = out.withColumn(
        "block_start", F.floor(F.col("pack_offset") / capacity)
    ).withColumn(
        "block_end",
        F.floor(
            (F.col("pack_offset") + F.greatest(tokens, F.lit(1)) - 1) / capacity
        ),
    )
    return out
