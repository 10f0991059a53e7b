"""Backup sink + APM analogue (SURVEY.md §2.1 backup row, §2.8)."""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from anser_spark.sources.backup import BackupOptions, backup_collection
from anser_spark.streaming.apm import (
    MonitorConfig,
    normalize_statements,
    strip_statement,
    window_event_stats,
)


def test_backup_full(engine, doc_collection, tmp_path):
    report = backup_collection(doc_collection, BackupOptions(target_dir=str(tmp_path / "bk")))
    assert report["count"] == 6
    assert os.path.exists(report["data_path"])
    assert os.path.exists(report["metadata_path"])
    with open(report["metadata_path"]) as fh:
        manifest = json.load(fh)
    assert manifest["namespace"] == "appdb.docs"
    assert any(f["name"] == "_id" for f in manifest["schema"]["fields"])
    restored = engine.spark.read.parquet(report["data_path"])
    assert restored.count() == 6


def test_backup_filtered_sorted_limited(engine, doc_collection, tmp_path):
    report = backup_collection(
        doc_collection,
        BackupOptions(
            target_dir=str(tmp_path / "bk2"),
            query={"activated": True},
            sort=["-priority"],
            limit=2,
        ),
    )
    assert report["count"] == 4  # filtered count (CountDocuments analogue)
    restored = engine.spark.read.parquet(report["data_path"]).collect()
    assert len(restored) == 2
    assert sorted(r["_id"] for r in restored) == ["a1", "a6"]  # top-2 by priority


def test_backup_indexes_only(doc_collection, tmp_path):
    report = backup_collection(
        doc_collection, BackupOptions(target_dir=str(tmp_path / "bk3"), indexes_only=True)
    )
    assert report["data_path"] is None
    assert os.path.exists(report["metadata_path"])


@pytest.fixture(scope="module")
def apm_events(spark):
    base = datetime.datetime(2026, 1, 1, 10, 0, 0)
    rows = []
    for i in range(20):
        ts = base + datetime.timedelta(seconds=i * 30)  # spans 10 minutes
        ev = "succeeded" if i % 4 else "failed"
        rows.append((i, ev, "db1", "coll_a" if i % 2 else "coll_b", "find", 1000 + i, ts, ["t1"] if i % 3 == 0 else []))
    return spark.createDataFrame(
        rows,
        ["request_id", "event", "db", "collection", "command", "duration_ns", "ts", "tags"],
    )


def test_window_event_stats(apm_events):
    out = window_event_stats(apm_events, MonitorConfig(window="5 minutes")).collect()
    # 10 minutes of data, 5-minute tumbling windows, 2 collections → 4 rows
    assert len(out) == 4
    total_succ = sum(r["succeeded"] for r in out)
    total_fail = sum(r["failed"] for r in out)
    assert total_succ == 15 and total_fail == 5
    for r in out:
        assert r["total_duration_ns"] > 0


def test_tracklist_filtering(apm_events):
    config = MonitorConfig(window="10 minutes", collections=["coll_a"])
    out = window_event_stats(apm_events, config).collect()
    assert all(r["collection"] == "coll_a" for r in out)


def test_strip_statement_golden():
    # shaped after the reference's stripped-statement goldens
    # (apm/otel_monitor_test.go:140-257)
    stmt = {
        "find": "tasks",
        "filter": {
            "status": "undispatched",
            "activated": True,
            "priority": {"$gt": 0},
            "$or": [{"distro": "d1"}, {"distro": "d2"}],
        },
        "limit": 5,
    }
    assert strip_statement(stmt) == {
        "find": "<string>",
        "filter": {
            "status": "<string>",
            "activated": "<bool>",
            "priority": {"$gt": "<int>"},
            "$or": [{"distro": "<string>"}],  # same-shape array elements compacted
        },
        "limit": "<int>",
    }


def test_strip_statement_array_compaction():
    assert strip_statement({"$in": [1, 2, 3]}) == {"$in": ["<int>"]}
    assert strip_statement({"$in": [1, "a", 2]}) == {"$in": ["<int>", "<string>", "<int>"]}
    assert strip_statement([1.5, None]) == ["<double>", "<null>"]


def test_normalize_statements_groups_shapes(spark):
    rows = [
        (1, json.dumps({"find": "t", "filter": {"x": 1}})),
        (2, json.dumps({"find": "t", "filter": {"x": 99}})),
        (3, json.dumps({"find": "t", "filter": {"y": "abc"}})),
        (4, "not json"),
    ]
    df = spark.createDataFrame(rows, ["id", "statement"])
    out = normalize_statements(df)
    shapes = out.where(F.col("query_shape").isNotNull()).groupBy("query_shape").count().collect()
    counts = sorted(r["count"] for r in shapes)
    assert counts == [1, 2]  # rows 1+2 share a shape; row 3 distinct; row 4 null
