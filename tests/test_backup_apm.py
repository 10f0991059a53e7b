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
    # (apm/otel_monitor_test.go:140-257): bson type-name placeholders;
    # arrays of documents pass through UNcompacted (compactArray only
    # dedupes all-string arrays)
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
            "activated": "<boolean>",
            "priority": {"$gt": "<32-bit integer>"},
            "$or": [{"distro": "<string>"}, {"distro": "<string>"}],
        },
        "limit": "<32-bit integer>",
    }


def test_strip_statement_array_compaction():
    # all-string arrays dedupe by value, first occurrence wins
    # (apm/otel_monitor.go:502-524); int32/int64 split follows the
    # ext-JSON decoder
    assert strip_statement({"$in": [1, 2, 3]}) == {"$in": ["<32-bit integer>"]}
    assert strip_statement({"$in": [1, "a", 2]}) == {"$in": ["<32-bit integer>", "<string>"]}
    assert strip_statement([1.5, None]) == ["<double>", "<null>"]
    assert strip_statement([2**40]) == ["<64-bit integer>"]
    # arrays with any document element are left uncompacted
    assert strip_statement([{"a": 1}, {"a": 2}]) == [
        {"a": "<32-bit integer>"}, {"a": "<32-bit integer>"}]


def test_operation_section_goldens():
    # per-command section extraction mirroring the reference's
    # TestFormatStatement corpus (apm/otel_monitor_test.go:130-257)
    from anser_spark.streaming.apm import format_statement, operation_section

    agg = json.loads(
        '{"aggregate":"evg.service.group","pipeline":[{"$match":{"group":'
        '"service.host.termination"}},{"$group":{"_id":1,"n":{"$sum":1}}}],'
        '"cursor":{},"readConcern":{"level":"majority"},"maxTimeMS":299999,'
        '"$db":"amboy"}'
    )
    assert operation_section("aggregate", agg) == {"pipeline": agg["pipeline"]}
    assert json.loads(format_statement(agg, "aggregate", stripped=True)) == {
        "pipeline": [
            {"$match": {"group": "<string>"}},
            {"$group": {"_id": "<32-bit integer>", "n": {"$sum": "<32-bit integer>"}}},
        ]
    }

    find = {
        "find": "admin",
        "filter": {"_id": {"$in": ["service_flags", "tracer", "pod_lifecycle"]}},
        "readConcern": {"level": "majority"},
        "$db": "mci",
    }
    assert operation_section("find", find) == {"filter": find["filter"]}
    assert json.loads(format_statement(find, "find", stripped=True)) == {
        "filter": {"_id": {"$in": ["<string>"]}}
    }

    update = {
        "update": "tasks",
        "ordered": True,
        "$db": "mci",
        "updates": [
            {
                "q": {"activated": True, "priority": {"$gt": -1}},
                "u": {"$set": {"priority": -1, "activated": False}},
                "multi": True,
            }
        ],
    }
    # update → the first updates[] entry itself (its q/u document)
    assert operation_section("update", update) == update["updates"][0]
    assert json.loads(format_statement(update, "update", stripped=True)) == {
        "q": {"activated": "<boolean>", "priority": {"$gt": "<32-bit integer>"}},
        "u": {"$set": {"priority": "<32-bit integer>", "activated": "<boolean>"}},
        "multi": "<boolean>",
    }

    delete = {"delete": "t", "deletes": [{"q": {"x": 1}, "limit": 1}]}
    assert operation_section("delete", delete) == {"q": {"x": 1}, "limit": 1}
    assert operation_section("delete", {"delete": "t", "deletes": []}) is None
    assert operation_section("update", {"update": "t"}) is None

    fam = {"findAndModify": "t", "query": {"x": 1}, "update": {"$set": {"y": 2}},
           "upsert": True, "lsid": {"id": "s"}}
    assert operation_section("findAndModify", fam) == {
        "query": {"x": 1}, "update": {"$set": {"y": 2}}, "upsert": True}

    ins = {"insert": "t", "ordered": True, "documents": [{"a": 1}], "$db": "d"}
    assert operation_section("insert", ins) == {
        "ordered": True, "documents": [{"a": 1}]}

    # unknown commands pass through whole
    other = {"ping": 1}
    assert operation_section("ping", other) == other


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


def test_normalize_statements_with_command_sections(spark):
    # with command_col, the find envelope ("find":"t1" vs "find":"t2")
    # no longer splits shapes — only the filter body matters; and an
    # update statement groups by its q/u document
    rows = [
        (1, "find", json.dumps({"find": "t1", "filter": {"x": 1}, "$db": "a"})),
        (2, "find", json.dumps({"find": "t2", "filter": {"x": 7}, "$db": "b"})),
        (3, "update", json.dumps({"update": "t", "updates": [
            {"q": {"x": 1}, "u": {"$set": {"y": 2}}}]})),
        (4, "update", json.dumps({"update": "t", "updates": [
            {"q": {"x": 9}, "u": {"$set": {"y": 0}}}]})),
    ]
    df = spark.createDataFrame(rows, ["id", "command", "statement"])
    out = normalize_statements(df, command_col="command")
    shapes = {r["id"]: r["query_shape"] for r in out.collect()}
    assert shapes[1] == shapes[2]
    assert shapes[3] == shapes[4]
    assert shapes[1] != shapes[3]
    assert json.loads(shapes[1]) == {"filter": {"x": "<32-bit integer>"}}


def test_window_event_stats_per_tag_counts(apm_events):
    # reference accumulates a per-window Tags count map
    # (apm/event.go:21-27, monitor.go:140-150); AllTags keeps every tag
    out = window_event_stats(
        apm_events, MonitorConfig(window="10 minutes", all_tags=True)).collect()
    by_coll = {r["collection"]: dict(r["tags"]) for r in out}
    # fixture: every 3rd event (i % 3 == 0) carries ["t1"]
    # i in 0..19, tags on i ∈ {0,3,6,9,12,15,18}; coll_b for even i
    assert by_coll["coll_b"] == {"t1": 4}   # i = 0, 6, 12, 18
    assert by_coll["coll_a"] == {"t1": 3}   # i = 3, 9, 15
    # tag tracklist: only listed tags are counted; untracked → empty map
    out2 = window_event_stats(
        apm_events, MonitorConfig(window="10 minutes", tags=["nope"])).collect()
    assert all(dict(r["tags"]) == {} for r in out2)
    # n_tag_events total preserved alongside
    assert sum(r["n_tag_events"] for r in out) == 7
