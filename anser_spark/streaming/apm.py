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
    "operation_section",
    "format_statement",
    "normalize_statements",
]


@dataclass
class MonitorConfig:
    """Track-lists mirror apm.MonitorConfig (apm/config.go:24-84):
    empty list = track everything. ``tags`` lists the context tags whose
    per-window counts are kept (config.go:27-32); ``all_tags`` keeps
    every tag seen."""

    commands: list[str] = field(default_factory=list)
    databases: list[str] = field(default_factory=list)
    collections: list[str] = field(default_factory=list)
    namespaces: list[tuple[str, str]] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)
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
    {succeeded, failed, total_duration_ns, n_tag_events?, tags?} — the
    batch analogue of monitor.Rotate() windows (apm/monitor.go:100-171).

    When ``config.all_tags`` or ``config.tags`` is set, a ``tags``
    ``map<tag, count>`` column mirrors the reference's per-record Tags
    map (apm/event.go:21-27, monitor.go:140-150): an explode(tags)
    side-aggregate on the same grouping keys (two-level, map-side
    partial — never a per-group collect of raw events), left-joined
    back; groups with no tracked tags get an empty map, matching the
    reference's pre-initialized map."""
    config = config or MonitorConfig()
    df = _apply_tracklists(events, config, db_col, coll_col, cmd_col)
    has_tags = bool(tags_col) and tags_col in df.columns
    keyed = df.select(
        F.window(F.col(ts_col), config.window).alias("__w"),
        F.col(db_col).alias("db"),
        F.col(coll_col).alias("collection"),
        F.col(cmd_col).alias("command"),
        F.col(event_col).alias("__event"),
        F.col(duration_col).alias("__dur"),
        *([F.col(tags_col).alias("__tags")] if has_tags else []),
    )
    aggs = [
        F.count(F.when(F.col("__event") == "succeeded", 1)).alias("succeeded"),
        F.count(F.when(F.col("__event") == "failed", 1)).alias("failed"),
        F.sum(
            F.when(F.col("__event") != "started", F.col("__dur")).otherwise(F.lit(0))
        ).alias("total_duration_ns"),
    ]
    if has_tags:
        aggs.append(
            F.sum(F.size(F.coalesce(F.col("__tags"), F.array()))).alias("n_tag_events")
        )
    keys = ["__w", "db", "collection", "command"]
    main = keyed.groupBy(*keys).agg(*aggs)
    want_tag_map = has_tags and (config.all_tags or config.tags)
    if want_tag_map:
        t = keyed.select(*keys, F.explode("__tags").alias("__tag"))
        if not config.all_tags:
            t = t.where(F.col("__tag").isin(list(config.tags)))
        tag_maps = (
            t.groupBy(*keys, "__tag")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .groupBy(*keys)
            .agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct(F.col("__tag"), F.col("__cnt"))))
                ).alias("tags")
            )
        )
        main = main.join(tag_maps, keys, "left").withColumn(
            "tags",
            F.coalesce(F.col("tags"), F.expr("cast(map() as map<string,bigint>)")),
        )
    return main.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        "db",
        "collection",
        "command",
        *[F.col(a) for a in ("succeeded", "failed", "total_duration_ns")],
        *([F.col("n_tag_events")] if has_tags else []),
        *([F.col("tags")] if want_tag_map else []),
    )


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
    """Replace literals with '<bson type>' placeholders, recursing
    through documents and arrays (stripDocument/stripValue,
    apm/otel_monitor.go:457-500). Array compaction matches compactArray
    (otel_monitor.go:502-524) exactly: only when EVERY stripped element
    is a string does the array dedupe (by value, first occurrence
    wins); arrays holding documents pass through uncompacted. Keys
    survive — the output is the query's *shape*."""
    if isinstance(value, Mapping):
        return {k: strip_statement(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        stripped = [strip_statement(v) for v in value]
        if any(not isinstance(item, str) for item in stripped):
            return stripped
        seen: set[str] = set()
        compact: list[Any] = []
        for item in stripped:
            if item not in seen:
                compact.append(item)
            seen.add(item)
        return compact
    if isinstance(value, bool):  # before int — bool subclasses int
        return "<boolean>"
    if isinstance(value, int):
        # ext-JSON ints land as int32 when they fit, like Go's decoder
        return "<32-bit integer>" if -(2**31) <= value < 2**31 else "<64-bit integer>"
    if isinstance(value, float):
        return "<double>"
    if isinstance(value, str):
        return "<string>"
    if value is None:
        return "<null>"
    return f"<{type(value).__name__}>"


_FIND_FIELDS = ("filter", "sort", "limit", "hint")
_FIND_AND_MODIFY_FIELDS = ("query", "update", "upsert")
_INSERT_FIELDS = ("ordered", "documents")


def operation_section(command_name: str | None, statement: Any) -> Any:
    """The semantically relevant sub-document for a command type
    (operationSection + extract*, apm/otel_monitor.go:319-455) —
    applied BEFORE shape-stripping so shape-grouping compares query
    bodies, not command envelopes:

    - aggregate → {pipeline}; find → {filter, sort, limit, hint};
      findAndModify → {query, update, upsert}; insert → {ordered,
      documents};
    - update/delete → the first ``updates[]`` / ``deletes[]`` entry
      (its q/u document), or None when absent — mirroring the
      reference's nil return;
    - any other command passes through unchanged."""
    if not isinstance(statement, Mapping):
        return statement
    if command_name == "aggregate":
        return {"pipeline": statement["pipeline"]} if "pipeline" in statement else {}
    if command_name == "find":
        return {k: v for k, v in statement.items() if k in _FIND_FIELDS}
    if command_name == "findAndModify":
        return {k: v for k, v in statement.items() if k in _FIND_AND_MODIFY_FIELDS}
    if command_name == "insert":
        return {k: v for k, v in statement.items() if k in _INSERT_FIELDS}
    if command_name in ("update", "delete"):
        arr = statement.get(command_name + "s")
        if isinstance(arr, Sequence) and not isinstance(arr, str) and len(arr):
            return arr[0]
        return None
    return statement


def format_statement(
    statement: Any, command_name: str | None = None, stripped: bool = False
) -> str:
    """Reference formatStatement (apm/otel_monitor.go:300-317): extract
    the command's operation section, optionally strip literals to type
    placeholders, and render 2-space-indented JSON in original key
    order."""
    if command_name is not None:
        statement = operation_section(command_name, statement)
    if stripped and statement is not None:
        statement = strip_statement(statement)
    return json.dumps(statement, indent=2)


def normalize_statements(
    df: DataFrame,
    statement_col: str = "statement",
    out: str = "query_shape",
    command_col: str | None = None,
) -> DataFrame:
    """Add a query-shape column from a JSON statement column — powers the
    'group queries by shape' report. With ``command_col``, the
    per-command operation section is extracted first (find's filter,
    aggregate's pipeline, update's q/u, …) so shapes group by query
    body rather than command envelope. Python-side (recursive dict
    walk) but Arrow-batched via a vectorized UDF; shape-grouping then
    happens JVM-side on the output string."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def shape(col: pd.Series, cmd: pd.Series) -> pd.Series:
        def one(s: str | None, c: str | None) -> str | None:
            if s is None:
                return None
            try:
                doc = json.loads(s)
                if c is not None:
                    doc = operation_section(c, doc)
                return json.dumps(strip_statement(doc), sort_keys=True)
            except (json.JSONDecodeError, TypeError):
                return None

        return pd.Series([one(s, c) for s, c in zip(col, cmd)])

    cmd = F.col(command_col) if command_col else F.lit(None).cast("string")
    return df.withColumn(out, shape(F.col(statement_col), cmd))
