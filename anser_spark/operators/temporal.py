"""Temporal joins: as-of join and range (interval) join.

Spark has no native ASOF JOIN; the naive formulations don't scale — a
per-key ``merge_asof`` in ``applyInPandas`` serializes every row through
Arrow, and a ``t BETWEEN``-style theta join degenerates to
broadcast-nested-loop. Both operators here compile to ONE shuffle +
sort over built-in operators, fully JVM-side:

- ``asof_join``: union-and-carry — tag both sides, union, and for each
  key a single ordered window carries the most recent right-side row
  forward onto left rows (``last(ignorenulls)`` over an unbounded-
  preceding frame). One shuffle on the key, one sort — the same cost
  as a co-partitioned merge join; skewed keys split by AQE.
- ``interval_join``: equi-join on (key, time-bucket) after exploding
  each interval into the buckets it overlaps, then an exact range
  filter. Bucketing turns the range predicate into a hash-join key, so
  Spark never falls back to nested-loop; bucket width trades shuffle
  fan-out against per-bucket candidates.

These back the event-stream shapes a training-data pipeline needs
(attach the most recent profile/model version to each event; join
events to validity windows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str | None = None,
    right_on: str | None = None,
    suffix: str = "_r",
    tolerance: Column | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] <= left[on]`` (ties: the right row wins — the
    match is inclusive; ``strict=True`` for ``<``), optionally within
    matching ``by`` keys and within ``tolerance`` (a Column interval or
    literal, e.g. ``F.expr("INTERVAL 1 HOUR")``).

    Right columns (except keys) appear suffixed. Left rows with no
    match keep nulls (left-join semantics — DuckDB ``ASOF LEFT JOIN``).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    right_on = right_on or on
    payload = [c for c in right.columns if c not in set(by) | {right_on}]
    out_names = [f"{c}{suffix}" if c in left.columns or c == on else c for c in payload]

    # Pack the whole right payload (plus the right timestamp) into ONE
    # struct and carry that struct with a single last(ignorenulls).
    # Carrying each column independently would mix fields across
    # different right rows whenever the latest right row holds a null
    # field (ignorenulls resurrects the older row's value).
    rt = right.select(
        *[F.col(b) for b in by],
        F.col(right_on).alias("__asof_t"),
        F.struct(
            F.col(right_on).alias("__asof_rt"),
            *[F.col(c).alias(n) for c, n in zip(payload, out_names)],
        ).alias("__asof_pkt"),
    )
    pkt_type = rt.schema["__asof_pkt"].dataType

    lt = (
        left.withColumn("__asof_t", F.col(on))
        .withColumn("__asof_pkt", F.lit(None).cast(pkt_type))
        .withColumn("__is_left", F.lit(1))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.withColumn("__is_left", F.lit(0))

    both = lt.unionByName(rt.select(*lt.columns))
    # inclusive: right rows (__is_left=0) sort BEFORE left rows at the
    # same timestamp so the window at a left row already contains the
    # equal-time right row; strict (<) puts them after instead
    tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        Window.partitionBy(*[F.col(b) for b in by])
        .orderBy(F.col("__asof_t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn(
        "__pkt", F.last("__asof_pkt", ignorenulls=True).over(w)
    ).where(F.col("__is_left") == 1)
    pkt = F.col("__pkt")
    if tolerance is not None:
        stale = F.col("__asof_t") - pkt.getField("__asof_rt") > tolerance
        pkt = F.when(stale, F.lit(None).cast(pkt_type)).otherwise(pkt)
    return carried.select(
        *[F.col(c) for c in left.columns],
        *[pkt.getField(n).alias(n) for n in out_names],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start_on: str,
    end_on: str,
    by: Sequence[str] | str | None = None,
    bucket: Column | str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (and equal ``by`` keys).

    Intervals explode into the time buckets they overlap; points map to
    their single bucket; the join is then a plain (key, bucket)
    equi-join plus the exact range filter — hash-joinable at any scale.
    ``bucket`` is an interval-literal string sized so a typical
    interval spans few buckets.
    """
    if how not in ("inner",):
        raise ValueError("interval_join supports inner joins")
    by = [by] if isinstance(by, str) else list(by or [])
    bucket_expr = F.expr(f"INTERVAL {bucket}") if isinstance(bucket, str) else bucket
    # integer bucket index: epoch seconds div bucket seconds.  The
    # width is computed by instant arithmetic from the epoch instant
    # (timestamp_seconds(0)); parsing an epoch *string* would apply the
    # session timezone and shift the width by the UTC offset (zero or
    # negative widths in non-UTC sessions).
    bsecs = F.unix_timestamp(F.timestamp_seconds(F.lit(0)) + bucket_expr)

    p = points.withColumn(
        "__bkt", (F.unix_timestamp(F.col(point_on)) / bsecs).cast("long")
    )
    iv = intervals.withColumn(
        "__bkts",
        F.sequence(
            (F.unix_timestamp(F.col(start_on)) / bsecs).cast("long"),
            (F.unix_timestamp(F.col(end_on)) / bsecs).cast("long"),
        ),
    ).withColumn("__bkt", F.explode("__bkts")).drop("__bkts")

    cond = [p["__bkt"] == iv["__bkt"]] + [p[b] == iv[b] for b in by]
    joined = p.join(iv, on=cond, how="inner").where(
        (p[point_on] >= iv[start_on]) & (p[point_on] < iv[end_on])
    )
    keep = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in set(by)
    ]
    return joined.select(*keep)
