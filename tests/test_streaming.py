"""Structured Streaming twin of the APM aggregation: same plan over a
file stream with watermark, collected via memory sink (availableNow)."""

import datetime

import pytest

from anser_spark.streaming.apm import (
    MonitorConfig,
    event_stats_stream,
    match_command_lifecycle,
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    base = datetime.datetime(2026, 1, 1, 10, 0, 0)
    rows = []
    rid = 0
    for i in range(40):
        ts = base + datetime.timedelta(seconds=i * 15)
        rows.append((rid, "started", "db1", "coll", "find", 0, ts, []))
        rows.append(
            (
                rid,
                "succeeded" if i % 5 else "failed",
                "db1",
                "coll",
                "find",
                5000,
                ts + datetime.timedelta(seconds=1),
                [],
            )
        )
        rid += 1
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("request_id", T.LongType()),
            T.StructField("event", T.StringType()),
            T.StructField("db", T.StringType()),
            T.StructField("collection", T.StringType()),
            T.StructField("command", T.StringType()),
            T.StructField("duration_ns", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return path


def test_event_stats_stream(spark, event_dir):
    static = spark.read.parquet(event_dir)
    stream = spark.readStream.schema(static.schema).parquet(event_dir)
    out = event_stats_stream(stream, MonitorConfig(window="5 minutes"), watermark="2 minutes")
    assert out.isStreaming
    query = (
        out.writeStream.format("memory")
        .queryName("apm_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.sql("SELECT * FROM apm_stats").collect()
    assert len(rows) == 2  # 10 minutes of events, 5-minute windows
    assert sum(r["succeeded"] for r in rows) == 32
    assert sum(r["failed"] for r in rows) == 8


def test_streaming_first_seen_dedup(spark, event_dir):
    from anser_spark.streaming.stateful import streaming_first_seen

    static = spark.read.parquet(event_dir)
    stream = spark.readStream.schema(static.schema).parquet(event_dir)
    deduped = streaming_first_seen(stream, "request_id")
    query = (
        deduped.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.sql("SELECT request_id, count(*) c FROM first_seen GROUP BY 1").collect()
    # source has 2 events per request_id (started + finished); exactly one survives
    assert len(rows) == 40
    assert all(r["c"] == 1 for r in rows)


def test_session_stats_batch(spark):
    from anser_spark.streaming.apm import session_stats

    base = datetime.datetime(2026, 1, 1, 9, 0, 0)
    rows = []
    # user 1: two sessions (burst at t0..t2min, burst at t+30min)
    for m in (0, 1, 2, 30, 31):
        rows.append((1, base + datetime.timedelta(minutes=m), 1.0))
    # user 2: one long session with <5min gaps
    for m in (0, 4, 8, 12):
        rows.append((2, base + datetime.timedelta(minutes=m), 2.0))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = session_stats(df, gap="5 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [2, 3]  # two sessions
    assert per_user[2] == [4]  # one merged session
    u2 = next(r for r in out if r["user_id"] == 2)
    assert u2["total_value"] == 8.0
    assert u2["session_end"] > u2["session_start"]


def test_session_stats_streaming(spark, event_dir):
    from anser_spark.streaming.apm import session_stats

    static = spark.read.parquet(event_dir)
    stream = spark.readStream.schema(static.schema).parquet(event_dir)
    out = session_stats(
        stream.withWatermark("ts", "10 minutes"),
        gap="2 minutes",
        key_col="db",
        value_col=None,
    )
    assert out.isStreaming
    query = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    # events every 15s with 1s finish offsets → one continuous session
    assert len(rows) == 1 and rows[0]["n_events"] == 80


def test_match_command_lifecycle(spark, event_dir):
    events = spark.read.parquet(event_dir)
    matched = match_command_lifecycle(events)
    rows = matched.collect()
    assert len(rows) == 40  # one row per command
    ok = [r for r in rows if r["ok"]]
    assert len(ok) == 32
    for r in rows:
        assert r["finished_ts"] > r["started_ts"]
        assert r["duration_ns"] == 5000
