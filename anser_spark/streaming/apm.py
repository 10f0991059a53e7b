"""APM-style event-window aggregation + query-shape normalization
(SURVEY.md §2.8; reference apm/monitor.go:14-171, apm/event.go:12-27,
apm/otel_monitor.go:320-524).

The reference keys driver command events by (db, collection, command),
accumulates {failed, succeeded, duration-sum, tag counts} per key, and
Rotate()s tumbling windows. Spark-first:

- batch shape: groupBy(window(ts), db, coll, cmd).agg(...) — one shuffle,
  partial aggregation map-side;
- streaming shape: identical plan over readStream with a watermark —
  Structured Streaming's tumbling window IS Rotate(); late data handling
  is a Spark-native bonus the reference lacks (processing-time only).
- query-shape normalization: recursive literal→<type> stripping with
  same-typed array-element compaction, matching the reference's
  stripped-statement golden outputs (apm/otel_monitor_test.go:140-257).
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MonitorConfig",
    "window_event_stats",
    "event_stats_stream",
    "strip_statement",
    "normalize_statements",
]


@dataclass
class MonitorConfig:
    """Track-lists mirror apm.MonitorConfig (apm/config.go:56-84):
    empty list = track everything."""

    commands: list[str] = field(default_factory=list)
    databases: list[str] = field(default_factory=list)
    collections: list[str] = field(default_factory=list)
    namespaces: list[tuple[str, str]] = field(default_factory=list)
    all_tags: bool = False
    window: str = "1 minute"


def _apply_tracklists(df: DataFrame, config: MonitorConfig, db: str, coll: str, cmd: str) -> DataFrame:
    if config.commands:
        df = df.where(F.col(cmd).isin(config.commands))
    if config.databases:
        df = df.where(F.col(db).isin(config.databases))
    if config.collections:
        df = df.where(F.col(coll).isin(config.collections))
    if config.namespaces:
        pairs = [F.struct(F.lit(d), F.lit(c)) for d, c in config.namespaces]
        df = df.where(F.struct(F.col(db), F.col(coll)).isin(*pairs) if pairs else F.lit(True))
    return df


def window_event_stats(
    events: DataFrame,
    config: MonitorConfig | None = None,
    ts_col: str = "ts",
    db_col: str = "db",
    coll_col: str = "collection",
    cmd_col: str = "command",
    event_col: str = "event",
    duration_col: str = "duration_ns",
    tags_col: str | None = "tags",
) -> DataFrame:
    """Tumbling-window per-(db, coll, cmd) stats over an event log:
    {succeeded, failed, total_duration_ns, n_tags?} — the batch analogue
    of monitor.Rotate() windows (apm/monitor.go:100-171)."""
    config = config or MonitorConfig()
    df = _apply_tracklists(events, config, db_col, coll_col, cmd_col)
    aggs = [
        F.count(F.when(F.col(event_col) == "succeeded", 1)).alias("succeeded"),
        F.count(F.when(F.col(event_col) == "failed", 1)).alias("failed"),
        F.sum(
            F.when(F.col(event_col) != "started", F.col(duration_col)).otherwise(F.lit(0))
        ).alias("total_duration_ns"),
    ]
    if tags_col and tags_col in df.columns:
        aggs.append(
            F.sum(F.size(F.coalesce(F.col(tags_col), F.array()))).alias("n_tag_events")
        )
    out = (
        df.groupBy(
            F.window(F.col(ts_col), config.window).alias("w"),
            F.col(db_col).alias("db"),
            F.col(coll_col).alias("collection"),
            F.col(cmd_col).alias("command"),
        )
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "db",
            "collection",
            "command",
            *[F.col(a) for a in ("succeeded", "failed", "total_duration_ns")],
            *([F.col("n_tag_events")] if tags_col and tags_col in df.columns else []),
        )
    )
    return out


def event_stats_stream(
    events_stream: DataFrame,
    config: MonitorConfig | None = None,
    watermark: str = "2 minutes",
    **cols: str,
) -> DataFrame:
    """Streaming twin of window_event_stats: same aggregation over a
    readStream source with a watermark bounding state. The caller owns
    the writeStream trigger (= the reference's logging-monitor ticker,
    apm/wrappers.go:19-40)."""
    ts_col = cols.get("ts_col", "ts")
    return window_event_stats(
        events_stream.withWatermark(ts_col, watermark), config, **cols
    )


def session_stats(
    events: DataFrame,
    gap: str = "5 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Session-window aggregation: events from one key separated by less
    than ``gap`` merge into one session (F.session_window — native
    state-merging windows; works identically over readStream with a
    watermark). Beyond the reference's processing-time tumbling windows
    — the shape a user-behavior / sessionization pipeline needs.

    Returns (key, session_start, session_end, n_events[, total_value])."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col and value_col in events.columns:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(*aggs)
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *[F.col(a) for a in ("n_events",)],
            *([F.col("total_value")] if value_col and value_col in events.columns else []),
        )
    )


def match_command_lifecycle(
    events: DataFrame,
    request_id_col: str = "request_id",
    event_col: str = "event",
    ts_col: str = "ts",
    duration_col: str = "duration_ns",
) -> DataFrame:
    """Join Started events to their Succeeded/Failed partner by RequestID
    — the reference's in-progress map (apm/monitor.go:110-138) as a
    self-equi-join (broadcast/shuffle chosen by Catalyst; in streaming
    form this becomes a watermarked stream-stream join).

    Returns one row per command: (request_id, db, collection, command,
    started_ts, finished_ts, ok, duration_ns)."""
    started = events.where(F.col(event_col) == "started").select(
        F.col(request_id_col).alias("request_id"),
        *[F.col(c) for c in events.columns if c not in (request_id_col, event_col, ts_col, duration_col)],
        F.col(ts_col).alias("started_ts"),
    )
    finished = events.where(F.col(event_col) != "started").select(
        F.col(request_id_col).alias("request_id"),
        F.col(ts_col).alias("finished_ts"),
        (F.col(event_col) == "succeeded").alias("ok"),
        F.col(duration_col).alias("duration_ns"),
    )
    return started.join(finished, "request_id", "left")


# ---------------------------------------------------------------------------
# Query-shape normalization (apm/otel_monitor.go:457-524)
# ---------------------------------------------------------------------------


def strip_statement(value: Any) -> Any:
    """Replace literals with '<type>' placeholders, recursing through
    documents and arrays; consecutive same-typed array elements are
    deduped (compactArray, apm/otel_monitor.go:502-524). Keys survive —
    the output is the query's *shape*."""
    if isinstance(value, Mapping):
        return {k: strip_statement(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        stripped = [strip_statement(v) for v in value]
        compact: list[Any] = []
        for item in stripped:
            if compact and _same_shape(compact[-1], item):
                continue
            compact.append(item)
        return compact
    if isinstance(value, bool):
        return "<bool>"
    if isinstance(value, int):
        return "<int>"
    if isinstance(value, float):
        return "<double>"
    if isinstance(value, str):
        return "<string>"
    if value is None:
        return "<null>"
    return f"<{type(value).__name__}>"


def _same_shape(a: Any, b: Any) -> bool:
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return json.dumps(a, sort_keys=True, default=str) == json.dumps(b, sort_keys=True, default=str)


def normalize_statements(
    df: DataFrame, statement_col: str = "statement", out: str = "query_shape"
) -> DataFrame:
    """Add a query-shape column from a JSON statement column — powers the
    'group queries by shape' report. Python-side (recursive dict walk) but
    Arrow-batched via a vectorized UDF; shape-grouping then happens
    JVM-side on the output string."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def shape(col: pd.Series) -> pd.Series:
        def one(s: str | None) -> str | None:
            if s is None:
                return None
            try:
                return json.dumps(strip_statement(json.loads(s)), sort_keys=True)
            except (json.JSONDecodeError, TypeError):
                return None

        return col.map(one)

    return df.withColumn(out, shape(F.col(statement_col)))
